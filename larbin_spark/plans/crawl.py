"""Multi-round crawl driver: stop conditions, snapshots, resume (O-16/O-17)."""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..sources.catalog import SnapshotStore
from .round import RoundRunner
from .state import CrawlState


def run_crawl(spark: SparkSession, cfg: CrawlConfig,
              dims: Dict[str, DataFrame], seeds: List[str],
              max_rounds: int = 10 ** 9,
              store: Optional[SnapshotStore] = None,
              keep_snapshots: int = 3,
              resume: bool = False,
              clock=None,
              submissions: Optional[Dict[int, list]] = None) -> CrawlState:
    """Run rounds until the frontier drains or a limit hits
    (main.cxx:184-185: frontier-empty termination; limit_page is the
    limitPage analogue (limit_page.cxx:28-43); limit_time_sec is the
    limitTime analogue (limit_time.cxx:30-48) checked against `clock`
    before each round — inject a fake clock to test it, the default
    is the monotonic wall clock. A wall-clock stop is inherently
    non-deterministic across parallelism levels, exactly like the
    reference's timer thread; determinism guarantees apply to the
    rounds that did run.

    Durable snapshots commit every cfg.snapshot_every round
    boundaries (default 1 = every round; the state tables round-trip
    through parquet, which also resets Catalyst size statistics, see
    plans/round.py phase F) plus a trailing commit at exit, so the
    returned state is always resumable. Resume picks up the latest
    committed snapshot exactly. Between commits the hot state tables
    are localCheckpoint-truncated in memory.
    """
    import tempfile
    import time
    if cfg.snapshot_every < 1:
        raise ValueError("snapshot_every must be >= 1")
    if cfg.snapshot_every > 16:
        # between commits the state plans live on localCheckpoint;
        # Catalyst size statistics compound across those layers (see
        # plans/round.py phase F), so an unbounded cadence degrades
        # planning long before it saves meaningful I/O — the commits
        # are already O(delta)
        raise ValueError("snapshot_every > 16 defeats the statistics "
                         "reset the parquet round-trip provides; use "
                         "a small cadence")
    if clock is None:
        clock = time.monotonic
    t_start = clock()
    runner = RoundRunner(spark, cfg, dims)
    if store is None:
        store = SnapshotStore(tempfile.mkdtemp(prefix="larbin_snap_"))

    rnd = 0
    if resume and store.latest() is not None:
        last = store.latest()
        st = CrawlState.load(spark, store, last)
        rnd = st.counters["round"]
    else:
        st = CrawlState.empty(spark)
        st = runner.seed(st, seeds)
        st.save(store, 0)  # bootstrap snapshot (before round 0)
        st = CrawlState.load(spark, store, 0)

    committed = rnd
    while rnd < max_rounds:
        if cfg.max_rounds and rnd >= cfg.max_rounds:
            break
        # entry point B: input-port submission batches land at the
        # start of their round, before any stop check fires (the
        # simulator delivers in the same slot)
        if submissions and rnd in submissions:
            st = runner.submit(st, submissions[rnd])
        if cfg.limit_page and st.counters["pages_ok"] >= cfg.limit_page:
            break
        if cfg.limit_time_sec and clock() - t_start >= cfg.limit_time_sec:
            break
        c = st.counters
        frontier_size = (c["n_priority"] + c["n_priority_wait"] + c["n_disk"]
                         + c["n_disk_wait"] + c["n_site_fifo"]
                         + c["n_ip_queue"])
        if frontier_size == 0:
            break
        st = runner.run_round(st, rnd)
        rnd += 1
        if rnd % max(1, cfg.snapshot_every) == 0:
            st = _commit(spark, st, store, rnd, keep_snapshots)
            committed = rnd
        else:
            # in-memory boundary between durable commits: truncate the
            # HOT state tables (probed/joined again next round) so the
            # union/anti-join chains of skipped rounds aren't
            # recomputed per action; append-only log tables stay lazy
            # unions of already-checkpointed deltas — nothing reads
            # them inside the loop, so they cost nothing until the
            # next durable commit writes them
            from .round import _lc
            for name in ("queues", "seen", "dup_seen", "ip_queue",
                         "buckets"):
                st.tables[name] = _lc(st.tables[name])
    # trailing rounds since the last boundary become durable at exit,
    # so the returned state is always resumable-from-here
    if committed != rnd:
        st = _commit(spark, st, store, rnd, keep_snapshots)
    return st


def _commit(spark: SparkSession, st: CrawlState, store: SnapshotStore,
            rnd: int, keep_snapshots: int) -> CrawlState:
    """Durable snapshot boundary: write the accumulated deltas, then
    reload so Catalyst's size statistics reset to real file sizes
    (plans/round.py phase F). The bitmap cache is exactly the
    seen/dup_seen content of the snapshot just committed, so it
    survives the reload (a fresh resume starts cold and rebuilds)."""
    st.save(store, rnd)
    bitmaps = st.bitmaps
    st = CrawlState.load(spark, store, rnd)
    st.bitmaps = bitmaps
    store.prune(keep_last=keep_snapshots)
    return st


def collect_results(st: CrawlState) -> dict:
    """Oracle-comparable result dict (tests only: bounded collects)."""
    ordering_rows = st.ordering.orderBy("fetch_seq").collect()
    ordering = [(r["round"], r["fetch_seq"], r["url"])
                for r in ordering_rows]
    cookies = [(r["fetch_seq"], r["cookie"]) for r in ordering_rows]
    tags = [(r["fetch_seq"], r["tag"]) for r in ordering_rows]
    seen = sorted(r["bucket"] for r in st.seen.collect())
    fetch_log = sorted((r["round"], r["url"], r["error"])
                       for r in st.fetch_log.collect())
    errors: Dict[str, int] = {}
    for r in (st.fetch_log.groupBy("error").agg(F.count("*").alias("n"))
              .collect()):
        errors[r["error"]] = errors.get(r["error"], 0) + r["n"]
    # gate errors (tooDeep/outSite/fast*/urlDup) live in metrics only
    for r in (st.metrics.filter(F.col("error").isin(
            "tooDeep", "outSite", "fastNoDns", "fastNoConn", "fastRobots",
            "urlDup")).groupBy("error").agg(F.sum("n").alias("n")).collect()):
        errors[r["error"]] = errors.get(r["error"], 0) + r["n"]
    emitted = [(r["round"], r["fetch_seq"], r["doc_id"])
               for r in st.tables["docs_out"].orderBy("fetch_seq").collect()] \
        if "docs_out" in st.tables else []
    return {
        "rounds": st.counters["round"],
        "ordering": ordering,
        "cookies": cookies,
        "tags": tags,
        "seen": seen,
        "errors": dict(sorted(errors.items())),
        "fetch_log": fetch_log,
        "emitted": emitted,
        "pages_ok": st.counters["pages_ok"],
    }
