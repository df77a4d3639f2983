"""Crawl state: the schemas of every state table and snapshot I/O.

All mutable crawler state lives in DataFrames (SURVEY.md §1.5 "all
state is tables"); the driver keeps only O(1) counters, which ride in
the snapshot manifest. One CrawlState = one committed round.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.catalog import SnapshotStore

QUEUE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("cookie", T.StringType()),
    T.StructField("tag", T.IntegerType()),
    T.StructField("qseq", T.LongType()),
    T.StructField("queue", T.StringType()),
])

SITE_FIFO_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("cookie", T.StringType()),
    T.StructField("tag", T.IntegerType()),
    T.StructField("qseq", T.LongType()),
    T.StructField("slot_id", T.IntegerType()),
    T.StructField("fifo_pos", T.LongType()),
])

IP_QUEUE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("cookie", T.StringType()),
    T.StructField("tag", T.IntegerType()),
    T.StructField("slot_id", T.IntegerType()),
    T.StructField("ip_hash", T.IntegerType()),
    T.StructField("transfer_seq", T.LongType()),
])

SLOTS_SCHEMA = T.StructType([
    T.StructField("slot_id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("dns_state", T.StringType()),
    T.StructField("forbidden", T.ArrayType(T.StringType())),
    T.StructField("nburls", T.IntegerType()),
    T.StructField("dns_queue_pos", T.LongType()),
    T.StructField("dns_expire_round", T.IntegerType()),
    T.StructField("ip_hash", T.IntegerType()),
])

BUCKETS_SCHEMA = T.StructType([
    T.StructField("ip_hash", T.IntegerType()),
    T.StructField("last_fetch_round", T.IntegerType()),
])

SEEN_SCHEMA = T.StructType([T.StructField("bucket", T.LongType())])

FETCH_LOG_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("error", T.StringType()),
])

ORDERING_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("fetch_seq", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("cookie", T.StringType()),
    T.StructField("tag", T.IntegerType()),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("error", T.StringType()),
    T.StructField("n", T.LongType()),
])

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
]))

DOCS_OUT_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("fetch_seq", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
    T.StructField("tag", T.IntegerType()),   # URL_TAGS id (url.h:120-123)
])

TABLES = ("queues", "site_fifo", "ip_queue", "slots", "buckets",
          "seen", "dup_seen", "fetch_log", "ordering", "metrics",
          "docs_out")

# grow-only tables: per-round snapshots append ONLY the round's delta
# files (Iceberg-style), never rewrite history — a full rewrite of
# e.g. docs_out every round would cost O(total) per round, O(R^2)
# cumulative over a crawl. Mutable tables (queues/slots/...) are
# rewritten in full; they are bounded by the in-flight budget.
APPEND_ONLY = ("seen", "dup_seen", "fetch_log", "ordering", "metrics",
               "docs_out")
# compact (full rewrite) when a table's file-composition list reaches
# this length: bounds read fan-in and lets prune drop old round dirs
COMPACT_EVERY = 16

_SCHEMAS = {
    "queues": QUEUE_SCHEMA, "site_fifo": SITE_FIFO_SCHEMA,
    "ip_queue": IP_QUEUE_SCHEMA, "slots": SLOTS_SCHEMA,
    "buckets": BUCKETS_SCHEMA, "seen": SEEN_SCHEMA,
    "dup_seen": SEEN_SCHEMA, "fetch_log": FETCH_LOG_SCHEMA,
    "ordering": ORDERING_SCHEMA, "metrics": METRICS_SCHEMA,
    "docs_out": DOCS_OUT_SCHEMA,
}


@dataclass
class CrawlState:
    tables: Dict[str, DataFrame]
    counters: Dict[str, int] = field(default_factory=dict)
    # this state's not-yet-persisted appended rows per APPEND_ONLY
    # table (relative to the snapshot the state was loaded from);
    # consumed by save(), reset by load()
    deltas: Dict[str, DataFrame] = field(default_factory=dict)
    # in-memory membership bitmap cache for the opt-in
    # seen_bitmap_broadcast path (operators/membership.py): the packed
    # bitmaps of `seen` / `dup_seen` as of this state. Maintained by
    # OR-ing each round's delta (O(delta) scan) instead of re-scanning
    # the full tables every round (VERDICT r2 minor). NOT persisted:
    # load() leaves it empty and the next round rebuilds from the
    # authoritative tables, so a stale cache cannot survive a resume.
    bitmaps: Dict[str, object] = field(default_factory=dict)

    def __getattr__(self, item):
        try:
            return self.tables[item]
        except KeyError:
            raise AttributeError(item)

    @classmethod
    def empty(cls, spark: SparkSession) -> "CrawlState":
        tables = {name: spark.createDataFrame([], schema)
                  for name, schema in _SCHEMAS.items()}
        counters = dict(qseq_next=0, transfer_seq_next=0, fetch_seq_next=0,
                        take_next=0, valve_pw_qseq=0, valve_w_qseq=0,
                        pages_ok=0, round=0,
                        # incremental table sizes: valve + termination
                        # checks use these instead of per-round count()
                        # jobs (parity tests cross-validate them)
                        n_priority=0, n_priority_wait=0, n_disk=0,
                        n_disk_wait=0, n_site_fifo=0, n_ip_queue=0)
        return cls(tables, counters)

    # membership tables are bucket-range sharded + sorted (SCALE.md §3:
    # pruned probes, sorted shard merges); everything else coalesces
    _RANGE_SHARDED = {"seen": "bucket", "dup_seen": "bucket"}

    def save(self, store: SnapshotStore, rnd: int) -> None:
        # concurrent writes: the tables are independent jobs and tiny
        # relative to scheduler overhead, so fan out driver-side
        from concurrent.futures import ThreadPoolExecutor
        tables_meta: Dict[str, list] = {}

        # delta commits compose against the LAST COMMITTED snapshot —
        # with snapshot_every > 1 that is rnd - K, not rnd - 1 (the
        # accumulated deltas span exactly the rounds since it), and
        # looking up rnd - 1 would silently fall back to full rewrites
        # of every append-only table at every periodic commit
        prev_rnd = store.latest()

        def _write(name: str) -> None:
            range_col = self._RANGE_SHARDED.get(name)
            if (name in APPEND_ONLY and name in self.deltas
                    and prev_rnd is not None and prev_rnd < rnd):
                try:
                    prev = store.table_rounds(prev_rnd, name)
                except FileNotFoundError:
                    prev = None
                if prev is not None and len(prev) < COMPACT_EVERY:
                    store.write_delta(rnd, name, self.deltas[name],
                                      range_col=range_col)
                    tables_meta[name] = prev + [rnd]
                    return
            # mutable table, bootstrap, or compaction due: full write
            store.write_table(rnd, name, self.tables[name],
                              range_col=range_col)
            tables_meta[name] = [rnd]

        with ThreadPoolExecutor(max_workers=len(TABLES)) as ex:
            list(ex.map(_write, TABLES))
        store.commit(rnd, {"counters": self.counters, "round": rnd,
                           "tables": tables_meta})
        # the deltas are now persisted in THIS snapshot's chain; a
        # second save of the same state must not write them again
        # (it falls back to full writes, which are always correct)
        self.deltas = {}

    @classmethod
    def load(cls, spark: SparkSession, store: SnapshotStore,
             rnd: int) -> "CrawlState":
        tables = {name: store.read_table(spark, rnd, name, _SCHEMAS[name])
                  for name in TABLES}
        return cls(tables, dict(store.manifest(rnd)["counters"]))
