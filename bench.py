#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...per-query sec + crawl throughput...}, "sf": ...}

Two parts:
1. headline engine queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS];
2. the BASELINE metric: URLs scheduled+deduped/sec over a synthetic
   frontier (canonicalize -> bucket hash -> in-batch dedup window ->
   seen anti-join -> per-site cap -> per-ip-bucket politeness head),
   run at N and 4N local cores on identical input, reporting both
   throughputs + scaling efficiency and a determinism digest, per
   BASELINE.md's scaling-evidence protocol. Results also land in
   BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FRONTIER_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000000"))
FRONTIER_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "50000"))

HEADLINE = [
    "crawl_dim_join_agg", "crawl_sequencer_cap", "crawl_seen_antijoin",
    "crawl_explode_links", "dedup_exact", "dedup_minhash_lsh",
    "text_quality", "ann_cosine_topk",
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cores}]")
            .appName(f"larbin-bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())


def gen_frontier_parquet(path: str) -> None:
    import pyarrow.parquet as pq
    from larbin_spark.fixtures.webgen import gen_frontier
    tbl = gen_frontier(FRONTIER_URLS, FRONTIER_HOSTS, seed=42)
    import pyarrow as pa
    tbl = tbl.append_column(
        "qseq", pa.array(range(len(tbl)), pa.int64()))
    pq.write_table(tbl, path)


def sched_round(spark, frontier_path: str):
    """One frontier scheduling+dedup round (O-3 + O-6 + O-7 + O-9):
    returns (n_input, n_scheduled, digest, seconds)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from larbin_spark.functions.udfs import (
        canonicalize_udf, site_hash_udf, url_bucket_udf)

    df = spark.read.parquet(frontier_path)
    t0 = time.time()
    # O-3: canonicalize (vectorized fast path inside the pandas UDF)
    c = df.withColumn("c", canonicalize_udf(
        "url", F.lit(None), F.lit(None), F.lit(None)))
    c = (c.filter(F.col("c.valid"))
         .select(F.col("c.host").alias("host"), F.col("c.port").alias("port"),
                 F.col("c.path").alias("path"), "qseq", "depth"))
    # O-6: seen-set bucket + first-occurrence-wins dedup
    c = c.withColumn("bucket", url_bucket_udf(
        "host", "port", "path", F.lit(64_000_000)))
    wd = Window.partitionBy("bucket").orderBy("qseq")
    c = c.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    # O-7: per-site fifo cap (64) in qseq order
    c = c.withColumn("slot_id", site_hash_udf("host"))
    ws = Window.partitionBy("slot_id").orderBy("qseq")
    c = c.withColumn("srn", F.row_number().over(ws)).filter(F.col("srn") <= 64)
    # O-9: politeness head per ip-bucket (site hash proxies the ip
    # bucket on the flat frontier: no DNS dim at bench scale)
    wp = Window.partitionBy(F.col("slot_id") % 10000).orderBy("qseq")
    sched = c.withColumn("prn", F.row_number().over(wp))
    agg = sched.agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("prn") <= 64, 1).otherwise(0)).alias("n_sched"),
        F.sum(F.col("bucket") * F.col("prn")).alias("digest")).collect()[0]
    dt = time.time() - t0
    n_input = df.count()
    return n_input, int(agg["n_sched"]), int(agg["digest"]), dt


def run_headline(spark) -> dict:
    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    times = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    frontier_path = os.path.join(tempfile.gettempdir(),
                                 f"bench_frontier_{FRONTIER_URLS}.parquet")
    if not os.path.exists(frontier_path):
        gen_frontier_parquet(frontier_path)

    n_small = max(2, CPUS // 4)
    results = {}

    # N cores
    spark_a = make_spark(n_small)
    spark_a.sparkContext.setLogLevel("ERROR")
    n_in, n_sched_a, digest_a, dt_a = sched_round(spark_a, frontier_path)
    spark_a.stop()
    thr_a = n_in / dt_a

    # 4N cores + headline queries
    spark_b = make_spark(CPUS)
    spark_b.sparkContext.setLogLevel("ERROR")
    n_in, n_sched_b, digest_b, dt_b = sched_round(spark_b, frontier_path)
    thr_b = n_in / dt_b
    qtimes = run_headline(spark_b)
    spark_b.stop()

    eff = (thr_b / thr_a) / (CPUS / n_small)
    deterministic = (digest_a == digest_b) and (n_sched_a == n_sched_b)

    queries = dict(qtimes)
    queries["crawl_sched_urls_per_sec_n"] = round(thr_a, 1)
    queries["crawl_sched_urls_per_sec_4n"] = round(thr_b, 1)
    queries["scaling_efficiency"] = round(eff, 3)
    queries["parallelism_determinism"] = 1.0 if deterministic else 0.0

    total = round(sum(qtimes.values()) + dt_a + dt_b, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline queries + frontier schedule+dedup "
                  f"({FRONTIER_URLS} urls) at local[{n_small}] vs local[{CPUS}]",
        "value": total, "unit": "sec", "queries": queries, "sf": sf}))

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH", "BASELINE.md")
    with open(md, "w") as fp:
        fp.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N protocol)

Input: synthetic frontier, {FRONTIER_URLS} URLs over {FRONTIER_HOSTS}
Zipf-skewed hosts (seed 42), identical for both runs. Job: one
scheduling+dedup round — canonicalize (O-3), 64M-bucket seen hash +
first-wins dedup (O-6), per-site 64-cap (O-7), per-ip-bucket
politeness head (O-9).

| run | cores | wall sec | URLs/sec |
|---|---|---|---|
| A | local[{n_small}] | {dt_a:.2f} | {thr_a:,.0f} |
| B | local[{CPUS}] | {dt_b:.2f} | {thr_b:,.0f} |

- scaling efficiency = (thr_B/thr_A) / ({CPUS}/{n_small}) = **{eff:.3f}**
  (acceptance >= 0.8, BASELINE.json north_rule)
- determinism across parallelism: digests {'MATCH' if deterministic else 'DIFFER'}
  (scheduled-set digest A={digest_a}, B={digest_b};
  n_sched A={n_sched_a}, B={n_sched_b})

Headline query times at sf{sf} on local[{CPUS}]:

""")
        for k, v in qtimes.items():
            fp.write(f"- {k}: {v}s\n")


if __name__ == "__main__":
    main()
