#!/usr/bin/env python
"""FULL-PIPELINE crawl scaling evidence: N vs 4N executors.

tools/cluster_bench.py evidences the north rule's two-cluster-size
criterion on the dominant dataflow (the scheduling+dedup round) and
separately proves full-crawl DIGEST equality across executor
topologies.  This tool closes the remaining gap: the WHOLE product
crawl (run_crawl.py: sequencer, DNS+robots, politeness, simulated
fetch join, parse, link extraction, dedup, frontier merge — every
phase, every round) timed at N and 4N executor JVMs via spark-submit
--py-files on `local-cluster`, same input, interleaved fixed-count
reps, fastest kept, with order-exact output digests asserted equal
across levels.

The workload is DATA-DOMINATED by design (VERDICT r3 #4: measure the
scaling crossover instead of extrapolating it): a 100k-host synthetic
web (~1.2M documents) seeded at every host root, per-host distinct
IPs (webgen's default arithmetic IPs collapse to 250 distinct values
— a politeness chokepoint that would measure the valve, not the
engine), fetch budget 4/IP/round, the sequencer intake and RAM budget
widened (seq 1M, ram_urls 2M) and the site/ip slot spaces
config-widened to 200k (SCALE.md: the reference's compiled 20k/10k,
types.h:35-36, are RAM constants, not semantics). Durable snapshots
every 4 rounds (the reference's saveInterval analogue) keep the
per-round span at its floor; 4 rounds crawl several hundred thousand
pages, so per-round dataflow volume dwarfs the ~10 s round span and
full-pipeline efficiency measures the engine, not the driver cadence.
The t2/t32 thread sweep is kept so the span share is still published.

Usage:
    python tools/crawl_scale_bench.py      # writes BENCH/crawl_scaling.json

Output JSON fields mirror BENCH/cluster_scaling.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_EXECUTORS = int(os.environ.get("SPARK_GRAFT_CLUSTER_N", "2"))
CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_CLUSTER_CORES", "1"))
WORKER_MEM_MB = int(os.environ.get("SPARK_GRAFT_CLUSTER_MEM_MB", "10240"))
REPS = int(os.environ.get("SPARK_GRAFT_CRAWL_REPS", "2"))
N_HOSTS = int(os.environ.get("SPARK_GRAFT_CRAWL_HOSTS", "100000"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_CRAWL_ROUNDS", "4"))
BASE_PAGES = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "20"))

CRAWL_ARGS = [
    "--rounds", str(ROUNDS), "--digest",
    "--seq-per-round", "1000000",
    "--ram-urls", "2000000",
    "--fetch-per-ip-per-round", "8",
    "--named-site-list-size", "200000",
    "--ip-site-list-size", "200000",
    "--snapshot-every", "4",
]


GEN_PARAMS = {"seed": 777, "n_hosts": N_HOSTS, "base_pages": BASE_PAGES,
              "hot_hosts": 40, "hot_factor": 6, "ip_rewrite": "v1"}


def make_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from larbin_spark.fixtures.webgen import gen_web, write_parquet
    import tempfile
    outdir = os.path.join(tempfile.gettempdir(),
                          f"crawl_scale_web_{N_HOSTS}")
    # the params fingerprint is written LAST, so its presence+match
    # means a complete fixture built with exactly these parameters —
    # a bare seeds.parquet existence check would silently reuse a
    # stale or truncated cache after a parameter change or a killed
    # run
    stamp = os.path.join(outdir, "params.json")
    try:
        with open(stamp) as fp:
            if json.load(fp) == GEN_PARAMS:
                return outdir
    except (OSError, ValueError):
        pass
    web = gen_web(seed=GEN_PARAMS["seed"], n_hosts=N_HOSTS,
                  base_pages=GEN_PARAMS["base_pages"],
                  hot_hosts=GEN_PARAMS["hot_hosts"],
                  hot_factor=GEN_PARAMS["hot_factor"])
    for i, h in enumerate(web["hosts"]):
        if not h["ip"].startswith("10.0.0."):  # keep shared-IP pairs
            h["ip"] = f"10.{1 + i // 65536}.{(i // 256) % 256}.{i % 256}"
    write_parquet(web, outdir)
    roots = sorted({h["host"] for h in web["hosts"]})
    pq.write_table(
        pa.table({"url": pa.array([f"http://{h}/" for h in roots],
                                  pa.string()),
                  "order": pa.array(range(len(roots)), pa.int32())}),
        os.path.join(outdir, "seeds.parquet"))
    with open(stamp, "w") as fp:
        json.dump(GEN_PARAMS, fp)
    return outdir


def _spark_submit_bin() -> str:
    import pyspark
    return os.path.join(os.path.dirname(pyspark.__file__),
                        "bin", "spark-submit")


def run_crawl_at(master: str, fixture_dir: str, log_path: str,
                 shuffle_parts: int = 8) -> dict:
    cmd = [
        _spark_submit_bin(), "--master", master,
        "--conf", f"spark.executor.memory={WORKER_MEM_MB - 1024}m",
        "--conf", "spark.driver.memory=8g",
        "--conf", f"spark.sql.shuffle.partitions={shuffle_parts}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", os.path.join(ROOT, "dist", "larbin_spark.zip"),
        os.path.join(ROOT, "run_crawl.py"),
        "--fixture-dir", fixture_dir,
    ] + CRAWL_ARGS
    with open(log_path, "ab") as log:
        out = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=log,
                             cwd=ROOT, check=True, text=True)
    # run_crawl.py prints its result LAST — scan from the end so a
    # stray {-prefixed log line can't be mistaken for the result
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from crawl at {master}; see {log_path}")


def main() -> None:
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "package_pyfiles.py")],
                   check=True, stdout=subprocess.DEVNULL)
    fixture_dir = make_fixture()
    import tempfile
    log_path = os.path.join(tempfile.gettempdir(), "crawl_scale_bench.log")

    n_a, n_b = N_EXECUTORS, N_EXECUTORS * 4
    levels = {
        n_a: f"local-cluster[{n_a},{CORES_PER_EXEC},{WORKER_MEM_MB}]",
        n_b: f"local-cluster[{n_b},{CORES_PER_EXEC},{WORKER_MEM_MB}]",
        # thread sweep for the span (Amdahl-floor) decomposition: the
        # full crawl at sandbox inputs is round-cadence-dominated, so
        # wall time should be ~flat across thread counts — publishing
        # it makes that claim measurable instead of asserted
        "t2": "local[2]", "t32": "local[32]",
    }
    # each level gets the shuffle-partition count it would be sized
    # to in production (pinning all levels to 8 would cap local[32]'s
    # shuffle stages at 8-way and overstate the span estimate)
    parts = {n_a: max(8, n_a * CORES_PER_EXEC),
             n_b: max(8, n_b * CORES_PER_EXEC), "t2": 8, "t32": 32}
    best: dict = {}
    samples: dict = {}
    # fixed-count interleaved reps, fastest kept (same anti-bias
    # protocol as bench.py / cluster_bench.py: never retry on a bad
    # figure, publish every raw sample)
    for lvl in (n_a, n_b, "t2", "t32") * REPS:
        r = run_crawl_at(levels[lvl], fixture_dir, log_path,
                         shuffle_parts=parts[lvl])
        samples.setdefault(str(lvl), []).append(r["wall_sec"])
        if lvl not in best or r["wall_sec"] < best[lvl]["wall_sec"]:
            best[lvl] = r
        time.sleep(3)

    digkeys = ("ordering_digest", "seen_digest", "docs_digest")
    digests_equal = all(
        len({json.dumps(best[lvl][k]) for lvl in best}) == 1
        for k in digkeys)
    pages = best[n_a]["pages_ok"]
    urls = best[n_a]["urls_assigned"]
    thr = {n: pages / best[n]["wall_sec"] for n in (n_a, n_b)}
    eff = (thr[n_b] / thr[n_a]) / (n_b / n_a)
    # span decomposition: wall(n) ~ span + work/n; the 2-vs-32-thread
    # pair bounds the parallelizable share at this input size
    w2, w32 = best["t2"]["wall_sec"], best["t32"]["wall_sec"]
    work_est = max(0.0, (w2 - w32) * 2 * 32 / 30)   # core-seconds
    span_est = max(0.0, w2 - work_est / 2)
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        commit = "unknown"
    result = {
        "mode": "FULL crawl pipeline, local-cluster executor JVMs, "
                "spark-submit --py-files",
        "generated_at_commit": commit,
        "workload": {"hosts": N_HOSTS, "rounds": ROUNDS,
                     "pages_ok": pages, "urls_assigned": urls,
                     "fixture": os.path.basename(fixture_dir)},
        "executors_n": n_a, "executors_4n": n_b,
        "cores_per_executor": CORES_PER_EXEC,
        "pages_per_sec_n": round(thr[n_a], 1),
        "pages_per_sec_4n": round(thr[n_b], 1),
        "urls_per_sec_4n": round(urls / best[n_b]["wall_sec"], 1),
        "scaling_efficiency_executors": round(eff, 3),
        "determinism_across_levels": 1.0 if digests_equal else 0.0,
        "digests": {k: best[n_a][k] for k in digkeys},
        "samples_sec": samples,
        "amdahl": {
            "wall_2_threads": w2, "wall_32_threads": w32,
            "span_sec_est": round(span_est, 1),
            "parallel_core_sec_est": round(work_est, 1),
            "span_share_of_round": round(
                span_est / max(w2, 1e-9), 3),
            "note": "the iterative round loop has a fixed span of "
                    "~12 eager actions (~60 AQE jobs) per round that "
                    "no cluster size removes; at sandbox inputs the "
                    "span dominates, so executor-scaling efficiency "
                    "of the FULL crawl is span-bound here — the "
                    "dataflow stages that carry the per-URL work "
                    "scale at 0.93 (BENCH/cluster_scaling.json) and "
                    "dominate at real frontier sizes "
                    "(docs/SCALE.md §2, §6)",
        },
    }
    print(json.dumps(result))
    out_json = os.path.join(ROOT, "BENCH", "crawl_scaling.json")
    with open(out_json, "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
