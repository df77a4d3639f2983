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
FRONTIER_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "8000000"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
FRONTIER_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "50000"))

HEADLINE = [
    "crawl_dim_join_agg", "crawl_sequencer_cap", "crawl_seen_antijoin",
    "crawl_explode_links", "dedup_exact", "dedup_minhash_lsh",
    "text_quality", "ann_cosine_topk", "curation_decontaminate",
    "curation_budget_pack", "curation_pipeline", "curation_pii_scrub",
    "curation_training_shuffle", "ann_quantize", "graph_pagerank",
    "dedup_semantic", "text_bpe_merges", "dedup_substring",
    "text_unigram_surprisal", "text_tfidf_keywords", "ann_pq_codes",
    "curation_dsir_weights", "text_bigram_surprisal",
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cores}]")
            .appName(f"larbin-bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.files.maxPartitionBytes", "1m")
            .config("spark.sql.files.openCostInBytes", "262144")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
            .getOrCreate())


def gen_frontier_parquet(path: str) -> None:
    import pyarrow.parquet as pq
    from larbin_spark.fixtures.webgen import gen_frontier
    tbl = gen_frontier(FRONTIER_URLS, FRONTIER_HOSTS, seed=42)
    import pyarrow as pa
    tbl = tbl.append_column(
        "qseq", pa.array(range(len(tbl)), pa.int64()))
    # small row groups so local[N] splits the single file into ~N
    # scan tasks (at real scale the frontier is many files and the
    # default 128m split size applies)
    pq.write_table(tbl, path, row_group_size=max(10_000, len(tbl) // 64))


def sched_round(spark, frontier_path: str):
    """One frontier scheduling+dedup round (O-3 + O-6 + O-7 + O-9):
    returns (n_input, n_scheduled, digest, seconds)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from larbin_spark.functions.udfs import canon_keys_stage

    df = spark.read.parquet(frontier_path)

    def build():
        # O-3 + O-6/O-7 hash keys: ONE fused mapInPandas stage (one
        # Python crossing; invalid rows dropped in-batch). Schedule-
        # on-keys: only (bucket, slot_id, qseq) ints leave Python —
        # the fetch stage joins payload back by qseq against the
        # frontier table, so the three shuffles below move 20 B/row
        # instead of full URL strings. At a 10^10-row frontier this
        # is the difference between a ~200 GB and a ~1 TB shuffle.
        c = canon_keys_stage(df.select("url", "qseq"))
        # O-6: first-occurrence-wins dedup. Hash aggregation (min_by),
        # NOT a row_number window: partial agg combines map-side and
        # there is no per-key sort — the window variant sorts every
        # row per shuffle partition and dominates the round at every
        # parallelism level.
        c = c.groupBy("bucket").agg(
            F.min_by("slot_id", "qseq").alias("slot_id"),
            F.min("qseq").alias("qseq"))
        # O-7: per-site fifo cap (64) in qseq order
        ws = Window.partitionBy("slot_id").orderBy("qseq")
        c = c.withColumn("srn", F.row_number().over(ws)) \
             .filter(F.col("srn") <= 64)
        # O-9: politeness head per ip-bucket (site hash proxies the ip
        # bucket on the flat frontier: no DNS dim at bench scale)
        wp = Window.partitionBy(F.col("slot_id") % 10000).orderBy("qseq")
        return c.withColumn("prn", F.row_number().over(wp)) \
                .filter(F.col("prn") <= 64)

    def measure():
        t0 = time.time()
        agg = build().agg(
            F.count("*").alias("n_sched"),
            F.sum(F.col("bucket") * F.col("prn")).alias("digest")
        ).collect()[0]
        return agg, time.time() - t0

    # two warm-up passes (python workers fork + import pandas, JIT
    # compiles the codegen'd stages), then best-of-two timed passes —
    # steady-state rounds of a long crawl are what the metric
    # describes, and single-pass timings on this box carry multi-
    # second JIT/GC noise
    measure()
    agg, dt1 = measure()
    _, dt2 = measure()
    n_input = df.count()
    return n_input, int(agg["n_sched"]), int(agg["digest"]), min(dt1, dt2)


# Map-only headline queries (pure projection, no agg/join before the
# action): .count() would let the optimizer prune the entire
# projection and time a bare row-count scan. These are forced to
# evaluate every output column through one JVM hash-agg instead
# (max(xxhash64(*cols)) — negligible overhead, nothing prunable).
FULL_EVAL = {"text_quality", "curation_pii_scrub", "ann_quantize"}


def run_headline(spark) -> dict:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    queries = entrymod.queries()
    times = {}
    for name in HEADLINE:
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        if name in FULL_EVAL:
            df.select(F.max(F.xxhash64(*[F.col(c) for c in df.columns])
                            ).alias("_h")).collect()
        else:
            df.count()
        times[name] = round(time.time() - t0, 3)
    # the non-parity MinHash hash flag: identical plan shape, one JVM
    # xxhash64 per shingle instead of 16 portable md5s — the scale
    # path when no cross-engine oracle must agree. Timed as its own
    # key; dedup_minhash_lsh above stays the md5 contract query.
    from larbin_spark.pipeline.dedup import minhash_lsh_candidates
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    minhash_lsh_candidates(docs, 16, 4, 3, hash_fn="xxhash64").count()
    times["dedup_minhash_lsh_xx64"] = round(time.time() - t0, 3)
    return times


def run_crawl_rounds(spark, n_rounds: int = 3) -> dict:
    """The real product pipeline: full parity crawl rounds (sequencer,
    DNS/robots joins, politeness, simulated fetch, link extraction,
    seen anti-join, snapshot commit) over a 200-host synthetic web.
    Per-round wall is dominated by the fixed ~10-job driver cadence —
    the number that matters at 10^10 is that it stays fixed while the
    per-job data scales out (docs/SCALE.md §6)."""
    import tempfile
    from larbin_spark.config import CrawlConfig
    from larbin_spark.fixtures.webgen import gen_web, write_parquet
    from larbin_spark.plans.crawl import run_crawl
    web = gen_web(n_hosts=200, base_pages=20)
    d = tempfile.mkdtemp(prefix="bench_web_")
    write_parquet(web, d)
    dims = {n: spark.read.parquet(f"{d}/{n}.parquet")
            for n in ("documents", "hosts", "robots")}
    seeds = [s["url"] for s in sorted(web["seeds"],
                                      key=lambda s: s["order"])]
    # one UNTIMED warm-up round on a fresh state, mirroring the sched
    # bench's warm-up passes: the first crawl round ever run in a JVM
    # pays ~2.5x steady state in JIT + Python-worker + Arrow spin-up,
    # which is session overhead, not per-round cost. (Protocol change
    # in round 3 — r1/r2 figures amortized the cold round into the
    # mean.)
    from larbin_spark.sources.catalog import SnapshotStore
    with tempfile.TemporaryDirectory(prefix="bench_snap_") as snapdir:
        run_crawl(spark, CrawlConfig(), dims, seeds, max_rounds=1,
                  store=SnapshotStore(os.path.join(snapdir, "warm")))
        t0 = time.time()
        st = run_crawl(spark, CrawlConfig(), dims, seeds,
                       max_rounds=n_rounds,
                       store=SnapshotStore(os.path.join(snapdir, "run")))
        dt = time.time() - t0
    return {"crawl_round_sec": round(dt / n_rounds, 3),
            "crawl_pages_ok": st.counters["pages_ok"]}


def sched_child(cores: int, frontier_path: str) -> None:
    """Subprocess entry: one scheduling round at the given parallelism.
    Each level runs in a fresh interpreter (a second SparkContext in
    one Python process leaves a dead Python-accumulator endpoint that
    serializes the DAGScheduler event loop)."""
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    n_in, n_sched, digest, dt = sched_round(spark, frontier_path)
    spark.stop()
    print(json.dumps({"n_in": n_in, "n_sched": n_sched,
                      "digest": digest, "dt": dt}))


def _run_sched(cores: int, frontier_path: str) -> dict:
    import subprocess
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--sched",
         str(cores), frontier_path],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(out.stdout.strip().splitlines()[-1])


def cpu_capacity_control(levels) -> dict:
    """Hardware control: pure-Python CPU burn at each parallelism
    level, no Spark. Measures how many *effective* cores the sandbox
    actually provides (clock scaling / steal) so code-attributable
    scaling efficiency can be separated from hardware throttling."""
    import multiprocessing as mp

    def _t1():
        t0 = time.time()
        _burn(8_000_000)
        return time.time() - t0

    t1 = _t1()
    out = {}
    for procs in levels:
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [8_000_000] * procs)
        out[procs] = round(procs * t1 / (time.time() - t0), 1)
    return out


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def _crawl_scaling_md(cs: dict) -> str:
    if not cs:
        return ("(none found — run `python tools/crawl_scale_bench.py` "
                "to produce it)")
    w = cs["workload"]
    return (
        f"- workload: {w['hosts']:,}-host synthetic web, {w['rounds']} "
        f"rounds, {w['pages_ok']:,} pages fetched / "
        f"{w['urls_assigned']:,} URLs assigned\n"
        f"- {cs['executors_n']} executors -> {cs['executors_4n']} "
        f"executors ({cs['cores_per_executor']} cores each): "
        f"{cs['pages_per_sec_n']:,.0f} pages/s -> "
        f"{cs['pages_per_sec_4n']:,.0f} pages/s -> **full-pipeline "
        f"executor-scaling efficiency "
        f"{cs['scaling_efficiency_executors']:.3f}**\n"
        f"- ordering/seen/docs digests "
        f"{'IDENTICAL' if cs['determinism_across_levels'] == 1.0 else 'DIFFERING'} "
        f"across every level run\n"
        f"- raw samples (sec): {cs['samples_sec']!r}"
        + _ladder_md(cs)
        + ("" if not cs.get("amdahl") else
           f"\n- span decomposition (2-vs-32-thread sweep): wall "
           f"{cs['amdahl']['wall_2_threads']}s at 2 threads vs "
           f"{cs['amdahl']['wall_32_threads']}s at 32 — est. span "
           f"{cs['amdahl']['span_sec_est']}s "
           f"({cs['amdahl']['span_share_of_round']:.0%} of the "
           f"2-thread wall). {cs['amdahl']['note']}"))


def _ladder_md(cs: dict) -> str:
    if "ladder" not in cs:
        return ""
    lines = ["\n- volume ladder (wall = S + W/k fit per rung):"]
    for e in cs["ladder"]:
        f = e["fit"]
        lines.append(
            f"  - {e['rung']}: {e['pages_ok']:,} pages / "
            f"{e['urls_assigned']:,} URLs assigned — wall "
            f"{e['wall_sec_n']}s @ {cs['executors_n']} exec vs "
            f"{e['wall_sec_4n']}s @ {cs['executors_4n']} exec "
            f"(eff {e['scaling_efficiency_executors']:.3f}); fitted "
            f"S={f['span_sec_fit']}s, W={f['parallel_core_sec_fit']} "
            f"core-s (W/S={f['w_over_s']})")
        ts = e.get("thread_scaling")
        if ts:
            lvls = ", ".join(f"{t}={ts['levels'][t]}s"
                             for t in ts["levels"])
            cores = [int(t.lstrip("t")) for t in ts["levels"]]
            lines.append(
                f"    - same job, thread mode ({lvls}): "
                f"{cores[0]}→{cores[-1]}-core efficiency "
                f"{ts['efficiency']:.3f} "
                f"(the north rule's two-parallelism-level protocol "
                f"on one JVM)")
    p = cs.get("saturation_analysis")
    if p:
        lines.append(
            f"  - saturation analysis ({p['model']}): fitted W per "
            f"page (ms) = {p['per_rung_w_ms_per_page']!r}. "
            f"{p['finding']}. Why this does not cap a real cluster: "
            f"{p['why_this_does_not_cap_a_real_cluster']}")
    else:
        p = cs.get("crossover_projection")
        if p:
            lines.append(
                f"  - 0.8-efficiency crossover ({p['rule']}): needs "
                f"W >= {p['w_needed_core_sec']} core-s — about "
                f"{p['pages_at_crossover_est']:,} pages/run at the "
                f"measured per-page cost. "
                f"{p['north_rule_operating_point']}")
    return "\n".join(lines)


def _cluster_md(cluster: dict) -> str:
    if not cluster:
        return ("(none found — run `python tools/cluster_bench.py` "
                "to produce it)")
    if cluster.get("stale"):
        return ("STALE artifact (digest or input size does not match "
                "this run's thread-mode round) — re-run "
                "`python tools/cluster_bench.py`. Raw: "
                f"{json.dumps(cluster)}")
    return (
        f"- {cluster['executors_n']} executors -> "
        f"{cluster['executors_4n']} executors "
        f"({cluster['cores_per_executor']} cores each), "
        f"{cluster['urls']:,} URLs\n"
        f"- throughput: {cluster['urls_per_sec_n']:,.0f} /s at N, "
        f"{cluster['urls_per_sec_4n']:,.0f} /s at 4N -> "
        f"**executor-scaling efficiency "
        f"{cluster['scaling_efficiency_executors']:.3f}**\n"
        f"- scheduled-set digest identical across executor counts "
        f"AND identical to the thread-mode digest above "
        f"({cluster['digest']}) — the schedule is topology-invariant\n"
        f"- raw samples (sec): {cluster['samples_sec']!r}"
        + ("" if "crawl_topology_equality" not in cluster else
           f"\n- END-TO-END: the full 4-round product crawl "
           f"(run_crawl.py --digest) on local[8] threads vs 2 vs 8 "
           f"executor JVMs emits "
           f"{'IDENTICAL' if cluster['crawl_topology_equality'] == 1.0 else 'DIFFERING'} "
           f"ordering/seen/docs digests: "
           f"{json.dumps(cluster['crawl_digests']['local[8]'])}"))


def main() -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    frontier_path = os.path.join(tempfile.gettempdir(),
                                 f"bench_frontier_{FRONTIER_URLS}.parquet")
    if not os.path.exists(frontier_path):
        gen_frontier_parquet(frontier_path)

    n_a, n_b = SCALE_N, SCALE_N * 4          # the N / 4N pair

    # three interleaved repetitions per level, fastest kept,
    # UNCONDITIONALLY — the repetition count is fixed up front and
    # never depends on the measured figure (a retry conditioned on
    # failing the acceptance gate would one-sidedly bias the reported
    # efficiency upward). Interleaving keeps a CPU-steal burst on
    # this shared-host VM from biasing one level of the N-vs-4N pair.
    runs = {}
    all_samples = {}

    def _take(cores):
        r = _run_sched(cores, frontier_path)
        all_samples.setdefault(cores, []).append(round(r["dt"], 2))
        if cores not in runs or r["dt"] < runs[cores]["dt"]:
            runs[cores] = r
        time.sleep(3)  # let the child JVM fully exit before the next

    for cores in (n_a, n_b, CPUS) * 3:
        _take(cores)

    n_in = runs[n_a]["n_in"]
    thr = {c: n_in / r["dt"] for c, r in runs.items()}
    eff = (thr[n_b] / thr[n_a]) / (n_b / n_a)
    digests = {c: r["digest"] for c, r in runs.items()}
    scheds = {c: r["n_sched"] for c, r in runs.items()}
    deterministic = len(set(digests.values())) == 1 and \
        len(set(scheds.values())) == 1

    capacity = cpu_capacity_control(sorted(set([n_a, n_b, CPUS])))

    spark_b = make_spark(CPUS)
    spark_b.sparkContext.setLogLevel("ERROR")
    qtimes = run_headline(spark_b)
    qtimes.update(run_crawl_rounds(spark_b))
    spark_b.stop()

    queries = dict(qtimes)
    queries["crawl_sched_urls_per_sec_n"] = round(thr[n_a], 1)
    queries["crawl_sched_urls_per_sec_4n"] = round(thr[n_b], 1)
    queries[f"crawl_sched_urls_per_sec_{CPUS}c"] = round(thr[CPUS], 1)
    queries["scaling_efficiency"] = round(eff, 3)
    queries["parallelism_determinism"] = 1.0 if deterministic else 0.0

    # executor-mode evidence (tools/cluster_bench.py: the same round
    # through spark-submit --py-files on local-cluster[N,2,*] — W
    # separate executor JVMs with real network shuffle — at N vs 4N
    # executors). Folded in from its artifact when present; digest
    # equality with the thread-mode runs above is asserted so a stale
    # artifact for a different frontier/semantics can't slip in.
    cluster = {}
    cj = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH", "cluster_scaling.json")
    if os.path.exists(cj):
        with open(cj) as fp:
            cluster = json.load(fp)
        if (cluster.get("digest") == list(digests.values())[0]
                and cluster.get("urls") == n_in):
            queries["cluster_exec_urls_per_sec_n"] = \
                cluster["urls_per_sec_n"]
            queries["cluster_exec_urls_per_sec_4n"] = \
                cluster["urls_per_sec_4n"]
            queries["cluster_scaling_efficiency_executors"] = \
                cluster["scaling_efficiency_executors"]
            queries["cluster_determinism_vs_threads"] = 1.0
            if "crawl_topology_equality" in cluster:
                queries["cluster_crawl_topology_equality"] = \
                    cluster["crawl_topology_equality"]
        else:
            cluster = {"stale": True, **cluster}
            queries["cluster_determinism_vs_threads"] = 0.0

    # FULL-pipeline executor scaling (tools/crawl_scale_bench.py:
    # the whole product crawl at N vs 4N executor JVMs). Folded in
    # from its artifact when present; it carries its own digest
    # cross-check across levels.
    crawl_scaling = {}
    csj = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH", "crawl_scaling.json")
    if os.path.exists(csj):
        try:
            with open(csj) as fp:
                crawl_scaling = json.load(fp)
            queries["crawl_full_pages_per_sec_n"] = \
                crawl_scaling["pages_per_sec_n"]
            queries["crawl_full_pages_per_sec_4n"] = \
                crawl_scaling["pages_per_sec_4n"]
            queries["crawl_full_scaling_efficiency_executors"] = \
                crawl_scaling["scaling_efficiency_executors"]
            queries["crawl_full_determinism_across_executors"] = \
                crawl_scaling["determinism_across_levels"]
        except (ValueError, KeyError) as e:
            # a malformed/old-schema artifact must not abort the whole
            # bench or silently publish partial figures
            crawl_scaling = {}
            queries["crawl_full_artifact_error"] = repr(e)

    total = round(sum(qtimes.values()) +
                  sum(r["dt"] for r in runs.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline queries + frontier schedule+dedup "
                  f"({FRONTIER_URLS} urls) at local[{n_a}] vs "
                  f"local[{n_b}] (N vs 4N) + local[{CPUS}] headline",
        "value": total, "unit": "sec", "queries": queries, "sf": sf}))

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH", "BASELINE.md")
    rows = "\n".join(
        f"| local[{c}] | {runs[c]['dt']:.2f} | {thr[c]:,.0f} |"
        for c in sorted(runs))
    cap_rows = "\n".join(
        f"| {p} | {e} | {round(e / p, 2)} |" for p, e in capacity.items())
    with open(md, "w") as fp:
        fp.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N protocol)

Input: synthetic frontier, {FRONTIER_URLS} URLs over {FRONTIER_HOSTS}
Zipf-skewed hosts (seed 42), identical across runs. Job: one
steady-state scheduling+dedup round — fused canonicalize + seen/site
hash mapInPandas stage (O-3/O-6/O-7 keys), 64M-bucket first-wins
dedup via min_by hash aggregation (O-6), per-site 64-cap window
(O-7), per-ip-bucket politeness head (O-9). Two warm-up passes, then
best of two timed passes per level; each level runs in a fresh
interpreter/JVM (spark-submit-equivalent isolation); THREE
interleaved repetitions per level with the fastest kept — the
repetition count is fixed before any measurement and never depends
on the resulting figure (this sandbox is a shared-host VM with
bursty CPU steal; interleaving keeps a steal burst from biasing one
side of the N-vs-4N comparison, and best-of estimates the unstolen
steady state). All raw samples (wall sec per repetition, in run
order) are listed below the table.

| run | wall sec (best) | URLs/sec |
|---|---|---|
{rows}

Raw samples per level (sec): {all_samples!r}

- **N vs 4N** = local[{n_a}] vs local[{n_b}]: scaling efficiency =
  (thr_4N/thr_N) / 4 = **{eff:.3f}** (acceptance >= 0.8,
  BASELINE.json north_rule)
- determinism across parallelism: scheduled-set digests
  {'MATCH' if deterministic else 'DIFFER'} across all levels
  (digest={list(digests.values())[0]}, n_sched={list(scheds.values())[0]})

## Executor-mode scaling (N vs 4N separate executor JVMs)

The north rule asks for spark-submit --py-files at N and 4N
*executors*. `tools/cluster_bench.py` runs the identical round via
`spark-submit --py-files dist/larbin_spark.zip` on
`local-cluster[W,cores,mem]` — W genuinely separate executor JVMs
(forked worker processes, own heaps + python workers, real
serialized network shuffle between them), the closest thing to a
multi-executor cluster this sandbox allows. Same fixed-count
interleaved-reps protocol. Latest artifact (BENCH/cluster_scaling.json):

{_cluster_md(cluster)}

## FULL-pipeline executor scaling (every crawl phase, N vs 4N JVMs)

`tools/crawl_scale_bench.py` times the WHOLE product crawl
(run_crawl.py through spark-submit --py-files: sequencer, DNS+robots,
politeness, simulated fetch join, parse, link extraction, dedup,
frontier merge — all rounds) at N and 4N executor JVMs on a VOLUME
LADDER of synthetic webs (each rung interleaved fixed-count reps,
order-exact digests asserted equal across levels, executor JVMs
pinned to -XX:ActiveProcessorCount=2 — the cgroup/cpuset bound a real
cluster imposes; without it co-located JVMs size thread pools for all
32 host cores and congest the box). Each rung is decomposed as
wall(k) = S + W/k (S = per-run span, W = parallel core-seconds);
N->4N efficiency crosses 0.8 exactly when W >= 11*N*S (22*S at the
default N=2). The headline row is the rung at the measured
efficiency frontier; the saturation rung past it shows the plateau
and its cause (see the saturation analysis below).
Latest artifact (BENCH/crawl_scaling.json):

{_crawl_scaling_md(crawl_scaling)}

## Hardware control (why N={n_a}, 4N={n_b})

Pure-Python CPU burn (no Spark) at each process count measures the
sandbox's *effective* core capacity — this box clock-throttles under
full load, capping any 32-way job regardless of code:

| procs | effective cores | per-core efficiency |
|---|---|---|
{cap_rows}

The N={n_a} → 4N={n_b} pair sits inside the hardware's linear region,
so its efficiency figure measures the *code*; the local[{CPUS}] row is
the absolute-throughput headline on all cores. At real cluster scale
the same plan shuffles on bucket/slot_id keys with map-side partial
aggregation, so per-executor work is independent and the same
efficiency argument applies across machines rather than cores.

Headline query times at sf{sf} on local[{CPUS}]:

Notes: `crawl_round_sec` carries the fixed per-round driver cadence
(~12 eager actions after the fused phase C — head resolve + robots
parse + fifo scan are ONE Arrow pass now — plus the snapshot
round-trip and the two bounded jobs of the two-phase qseq rank,
docs/SCALE.md §5b,§6) ; a one-round untimed warm-up crawl precedes the
measurement (protocol change in r3: the first round in a fresh JVM
pays ~2.5x steady state in JIT/Arrow spin-up — session overhead the
r1/r2 figures amortized into the mean). The scalable share dominates
at real input sizes. `dedup_minhash_lsh` is the engine-portable signature the
DuckDB oracle must reproduce (ONE md5 per shingle + a universal-hash
family over a Mersenne prime — bit-exact on both engines);
`dedup_minhash_lsh_xx64` is the same plan with the JVM xxhash64
family — the scale path when no cross-engine oracle applies.
Protocol note (r4): the map-only queries ({sorted(FULL_EVAL)!r})
are forced to evaluate every output column via max(xxhash64(*cols))
— a bare .count() lets the optimizer prune the whole projection, so
earlier rounds' figures for text_quality timed only a row-count
scan (the new figures are larger because they now measure the op).

""")
        # qtimes holds the headline query timings (seconds) plus one
        # count; the scaling/efficiency figures live in the dedicated
        # sections above, not in this list
        for k, v in qtimes.items():
            unit = "" if k == "crawl_pages_ok" else "s"
            fp.write(f"- {k}: {v}{unit}\n")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--sched":
        sched_child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
