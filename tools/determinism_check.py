#!/usr/bin/env python
"""Crawl determinism-under-parallelism probe (SURVEY.md §5.5).

Runs a fixed synthetic-web crawl at the given local parallelism and
prints a JSON line with digests of the fetch ordering, seen set,
fetch log and emitted docs. Identical digests across parallelism
levels prove the explicit total-order design (qseq / take_rank /
transfer_seq / fetch_seq) — nothing depends on partitioning.

Usage: python tools/determinism_check.py <cores> [rounds]
Each level must run in its own interpreter (two SparkContexts in one
process break the Python accumulator channel).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"larbin-determinism-{cores}")
             .config("spark.sql.shuffle.partitions", str(max(cores, 4)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile
    from larbin_spark.config import CrawlConfig
    from larbin_spark.fixtures.webgen import gen_web, write_parquet
    from larbin_spark.plans.crawl import collect_results, run_crawl

    web = gen_web(n_hosts=24, base_pages=14)
    d = tempfile.mkdtemp(prefix=f"det_{cores}_")
    write_parquet(web, d)
    dims = {n: spark.read.parquet(f"{d}/{n}.parquet")
            for n in ("documents", "hosts", "robots")}
    seeds = [s["url"] for s in sorted(web["seeds"],
                                      key=lambda s: s["order"])]
    st = run_crawl(spark, CrawlConfig(), dims, seeds, max_rounds=rounds)
    res = collect_results(st)
    spark.stop()

    def dig(obj) -> str:
        return hashlib.sha256(
            json.dumps(obj, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    print(json.dumps({
        "cores": cores, "rounds": res["rounds"],
        "ordering": dig(res["ordering"]),
        "seen": dig(res["seen"]),
        "fetch_log": dig(res["fetch_log"]),
        "emitted": dig(res["emitted"]),
        "pages_ok": res["pages_ok"],
    }))


if __name__ == "__main__":
    main()
