#!/usr/bin/env python
"""spark-submit entry point for the crawl.

Packaging + launch (tools/submit.sh wraps this):

    python tools/package_pyfiles.py               # -> dist/larbin_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/larbin_spark.zip \
        run_crawl.py --fixture-dir /path/to/web \
        --rounds 8 --snapshot-dir /path/to/snapshots [--resume]

The driver config (executors, memory, shuffle partitions) comes from
spark-submit/--conf as usual; this script only declares the job. With
--fixture-dir pointing at a synthetic-web directory (documents/hosts/
robots parquet — see larbin_spark/fixtures/webgen.py) the fetch stage
is the simulated-network join; on a real crawl those dims are the
live-network adapters.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", required=True,
                    help="dir with documents/hosts/robots(/seeds).parquet")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--snapshot-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed-url", action="append", default=[],
                    help="extra seed URL (repeatable); defaults to the "
                         "fixture's seeds table")
    ap.add_argument("--limit-page", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("larbin-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from larbin_spark.config import CrawlConfig
    from larbin_spark.plans.crawl import run_crawl
    from larbin_spark.sources.catalog import SnapshotStore

    dims = {n: spark.read.parquet(f"{args.fixture_dir}/{n}.parquet")
            for n in ("documents", "hosts", "robots")}
    seeds = list(args.seed_url)
    if not seeds:
        seeds = [r["url"] for r in
                 spark.read.parquet(f"{args.fixture_dir}/seeds.parquet")
                 .orderBy("order").collect()]

    cfg = CrawlConfig(limit_page=args.limit_page)
    store = SnapshotStore(args.snapshot_dir) if args.snapshot_dir else None
    st = run_crawl(spark, cfg, dims, seeds, max_rounds=args.rounds,
                   store=store, resume=args.resume)
    print(json.dumps({
        "rounds": st.counters["round"],
        "pages_ok": st.counters["pages_ok"],
        "frontier_left": (st.counters["n_priority"]
                          + st.counters["n_priority_wait"]
                          + st.counters["n_disk"] + st.counters["n_disk_wait"]
                          + st.counters["n_site_fifo"]
                          + st.counters["n_ip_queue"]),
        "urls_assigned": st.counters["qseq_next"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
