"""Multi-round crawl driver: stop conditions, snapshots, resume (O-16/O-17)."""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..sources.catalog import SnapshotStore
from .round import RoundRunner
from .state import COMPACT_EVERY, CrawlState

# max rounds between parquet rebases of the in-memory state: the
# durable snapshot is written asynchronously (see _AsyncCommitter),
# so between reloads the state tables live as lazy compositions /
# localCheckpoints; Catalyst size statistics degrade across those
# layers, and this cap bounds the depth exactly like the
# snapshot_every <= 16 validation does (plans/round.py phase F).
RELOAD_ROUNDS = 16


class _AsyncCommitter:
    """Ordered background committer: overlaps the durable snapshot
    write with the next rounds' compute, the way the reference
    flushes its persistent fifos off the crawl path
    (src/utils/persistent_fifo.cxx write-behind rotation). At most
    one save is in flight; submit() joins the previous one first, so
    delta chains always compose against a completed predecessor and
    any save failure surfaces at the next boundary instead of being
    lost on a daemon thread."""

    def __init__(self) -> None:
        from concurrent.futures import ThreadPoolExecutor
        self._ex = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="snap-commit")
        self._fut = None

    def submit(self, fn) -> None:
        self.join()
        self._fut = self._ex.submit(fn)

    def join(self) -> None:
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()

    def close(self) -> None:
        try:
            self.join()
        finally:
            self._ex.shutdown()


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
    boundaries (default 1 = every round) plus a trailing commit at
    exit, so the returned state is always resumable. Resume picks up
    the latest COMPLETED snapshot exactly. With cfg.async_commit
    (default) the save is write-behind: it overlaps the next rounds'
    compute on an ordered background thread (_AsyncCommitter) and is
    joined at the next boundary — off the round's critical path, like
    the reference's persistent-fifo flush. Synchronous boundaries
    (save + reload, which rebases the state plans on parquet and
    resets Catalyst size statistics, plans/round.py phase F) still
    happen at every compaction and at least every RELOAD_ROUNDS
    rounds. Between them the bounded hot tables are
    localCheckpoint-truncated in memory and the unbounded ones stay
    lazy O(delta) compositions (_truncate_bounded).
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

    committer = _AsyncCommitter() if cfg.async_commit else None
    rnd = 0
    if resume and store.latest() is not None:
        last = store.latest()
        st = CrawlState.load(spark, store, last)
        rnd = st.counters["round"]
    elif committer is None:
        st = CrawlState.empty(spark)
        st = runner.seed(st, seeds)
        st.save(store, 0)  # bootstrap snapshot (before round 0)
        st = CrawlState.load(spark, store, 0)
    else:
        # write-behind bootstrap (r5): the bootstrap snapshot's 13
        # table writes are the session's FIRST jobs — run
        # synchronously they serialize ~10 s of executor-launch +
        # first-job latency in front of round 0 at every topology
        # (pure span, measured by the r5 action attribution). Submit
        # them to the committer instead: they overlap round 0's
        # compute and are joined at the first boundary. The state
        # keeps its in-memory seed plans for round 0 (the parquet
        # rebase + statistics reset happens at the next synchronous
        # boundary as usual); resumability is unchanged — a crash
        # before the save lands just resumes from nothing, exactly
        # like a crash during the old synchronous bootstrap.
        st = CrawlState.empty(spark)
        st = runner.seed(st, seeds)
        _submit_commit(committer, st, store, 0, keep_snapshots)

    committed = rnd
    last_reload = rnd  # the round whose parquet the state plans read
    try:
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
            frontier_size = (c["n_priority"] + c["n_priority_wait"]
                             + c["n_disk"] + c["n_disk_wait"]
                             + c["n_site_fifo"] + c["n_ip_queue"])
            if frontier_size == 0:
                break
            st = runner.run_round(st, rnd)
            rnd += 1
            if rnd % max(1, cfg.snapshot_every) == 0:
                if committer is None:
                    st = _commit(spark, st, store, rnd, keep_snapshots)
                    last_reload = rnd
                else:
                    # join the in-flight save (it had a full commit
                    # window of rounds to finish, so this is ~free):
                    # the chain-length inspection below reads a
                    # quiescent store and the next save composes its
                    # deltas against a completed predecessor
                    from .round import _act
                    _act("F:committer_join", committer.join)
                    if (rnd - last_reload >= RELOAD_ROUNDS
                            or _compaction_due(store)):
                        # synchronous boundary: a compaction rewrites
                        # full tables from plans based on the LAST
                        # reload's files, and the rebase right after
                        # keeps every in-memory plan on files prune
                        # cannot expire; the periodic rebase also
                        # resets Catalyst size statistics (phase F)
                        st = _commit(spark, st, store, rnd,
                                     keep_snapshots)
                        last_reload = rnd
                    else:
                        _submit_commit(committer, st, store, rnd,
                                       keep_snapshots)
                        _truncate_bounded(st)
                committed = rnd
            else:
                _truncate_bounded(st)
    except BaseException:
        if committer is not None:
            try:
                committer.close()  # the in-flight snapshot stays
            except Exception:      # resumable; don't mask the
                pass               # round's own error with a save's
        raise
    if committer is not None:
        committer.close()
    # trailing rounds since the last boundary become durable at exit,
    # so the returned state is always resumable-from-here
    if committed != rnd:
        st = _commit(spark, st, store, rnd, keep_snapshots)
    elif last_reload != rnd:
        # async path: rebase the returned state onto the durable
        # snapshot — its lazy table plans must not outlive prune's
        # data-dir expiry once the caller holds it past more commits
        bitmaps = st.bitmaps
        st = CrawlState.load(spark, store, rnd)
        st.bitmaps = bitmaps
    return st


def _submit_commit(committer: _AsyncCommitter, st: CrawlState,
                   store: SnapshotStore, rnd: int,
                   keep_snapshots: int) -> None:
    """Hand the boundary state to the background committer. The
    frozen copy detaches it from the continuing crawl: DataFrames are
    immutable and run_round rebinds (never mutates) table entries,
    but counters mutate in place and the deltas dict must transfer
    ownership — the in-flight save consumes exactly this window's
    deltas, and the continuing state accumulates the next window's
    from empty (re-writing them at the next boundary would duplicate
    rows in the append chains)."""
    frozen = CrawlState(dict(st.tables), dict(st.counters), st.deltas)
    st.deltas = {}

    def _save() -> None:
        frozen.save(store, rnd)
        store.prune(keep_last=keep_snapshots)

    committer.submit(_save)


def _compaction_due(store: SnapshotStore) -> bool:
    """True when the next save would full-rewrite some table (its
    delta chain reached COMPACT_EVERY). Those boundaries run
    synchronously: the rewrite reads the in-memory plans, whose file
    dependencies date back to the last reload."""
    prev = store.latest()
    if prev is None:
        return True
    try:
        tables = store.manifest(prev).get("tables", {})
    except FileNotFoundError:
        return True
    return any(len(chain) >= COMPACT_EVERY for chain in tables.values())


def _truncate_bounded(st: CrawlState) -> None:
    """In-memory boundary between parquet rebases: materialize +
    lineage-truncate only the BOUNDED hot tables (in-flight budget /
    politeness buckets). The unbounded tables — queues, seen,
    dup_seen — stay lazy compositions over the last reload's parquet
    plus the rounds' already-checkpointed deltas: materializing the
    frontier or the seen set into memory would be O(state) per round,
    defeating the O(delta) commit design, while the lazy form costs
    one pruned base scan plus <= RELOAD_ROUNDS bounded-probe
    anti-joins/unions per read (and each table is read at most once
    or twice per round)."""
    from .round import _lc
    for name in ("ip_queue", "buckets"):
        st.tables[name] = _lc(st.tables[name])


def _commit(spark: SparkSession, st: CrawlState, store: SnapshotStore,
            rnd: int, keep_snapshots: int) -> CrawlState:
    """Durable snapshot boundary: write the accumulated deltas, then
    reload so Catalyst's size statistics reset to real file sizes
    (plans/round.py phase F). The bitmap cache is exactly the
    seen/dup_seen content of the snapshot just committed, so it
    survives the reload (a fresh resume starts cold and rebuilds)."""
    from .round import _act
    _act("F:commit_sync_save", lambda: st.save(store, rnd))
    bitmaps = st.bitmaps
    st = _act("F:commit_reload",
              lambda: CrawlState.load(spark, store, rnd))
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
