"""One crawl round as a batch DataFrame job (docs/ROUND_MODEL.md).

Phase map (the oracle simulator is the executable spec):
  A valve        -> driver counter arithmetic (main.cxx:190-199)
  B sequencer    -> ordered global take (TopK) + applyInPandas slot
                    routing over slot_id groups (sequencer.cxx,
                    site.cxx:136-207)
  C dns+robots   -> broadcast joins against hosts/robots dims +
                    applyInPandas fifo scans (site.cxx:212-496)
  D politeness   -> window row_number per ip_hash bucket
                    (site.cxx:572-644)
  E fetch+parse  -> broadcast join against documents + mapInPandas
                    span link extraction + columnar gates + seen
                    anti-join (file.cxx, checker.cxx)
  F commit       -> localCheckpoint per state table; durable snapshot
                    at the crawl driver's checkpoint cadence

Determinism: every sequence number is a rank over an explicit total
order (qseq / take_rank / fifo_pos / transfer_seq /
(fetch_seq, link_idx)); nothing depends on partitioning. The global
row_number windows run ONLY on budget-limited sets (<= sequencer
budget / <= #ip buckets), so those single-partition windows are
bounded, not a scalability hole. The one unbounded sequence — qseq
for per-round new links — uses the two-phase distributed rank
(operators/sequence.py) under the same (fetch_seq, link_idx) order.
The heavy stages (slot routing, link extraction, seen anti-join,
fetch join) shuffle on slot_id / bucket / range and scale out; the
documents dim and the growing dup_seen set are never broadcast
(only the bounded scheduled batch and the fixed-size bitmaps are).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions.udfs import (
    filter1_udf, robots_allowed_udf, site_hash_udf, url_bucket_udf,
)
from ..kernels.links import clean_redirect_text, extract_links
from ..kernels.urlnorm import ParsedUrl, give_base, parse_url, punycode_host
from ..operators import slot_logic
from .state import (
    CrawlState, IP_QUEUE_SCHEMA, QUEUE_SCHEMA, SITE_FIFO_SCHEMA,
    SLOTS_SCHEMA,
)

ROUTED_SCHEMA = T.StructType(
    [f for f in QUEUE_SCHEMA if f.name != "queue"] + [
        T.StructField("slot_id", T.IntegerType()),
        T.StructField("take_rank", T.LongType()),
        T.StructField("cls", T.StringType()),
        T.StructField("s_ip_hash", T.IntegerType()),
        T.StructField("action", T.StringType()),
        T.StructField("err", T.StringType()),
    ])

RESOLVED_SCHEMA = T.StructType(
    list(SITE_FIFO_SCHEMA) + [
        T.StructField("dns_queue_pos", T.LongType()),
        T.StructField("new_ip_hash", T.IntegerType()),
        T.StructField("action", T.StringType()),
        T.StructField("err", T.StringType()),
        # slot-constant head metadata, emitted on every row so the
        # slot update (upd) is ONE aggregation over `resolved` instead
        # of a separate checkpointed `heads` dataframe (the fused
        # phase C: head resolve + robots parse + fifo scan in a single
        # Arrow pass — see _phase_c)
        T.StructField("proc_rank", T.LongType()),
        T.StructField("head_puny", T.StringType()),
        T.StructField("head_port", T.IntegerType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("eff_forbidden", T.ArrayType(T.StringType())),
    ])

# SCALE note (r5): no l_url column — the canonical URL string is a
# pure function of (l_host, l_port, l_path) (ParsedUrl.url,
# urlnorm.py; reference giveUrl url.cxx:409-426), so carrying it
# through the extract Arrow transfer, the links checkpoint, the
# survivors window shuffle and the enqueue range shuffle would
# roughly double the string mass of every phase-E barrier for zero
# information. It is re-derived JVM-side (one concat) only where the
# QUEUE_SCHEMA needs it, after the rank.
LINKS_SCHEMA = T.StructType([
    T.StructField("fetch_seq", T.LongType()),
    T.StructField("link_idx", T.IntegerType()),
    T.StructField("l_host", T.StringType()),
    T.StructField("l_port", T.IntegerType()),
    T.StructField("l_path", T.StringType()),
    T.StructField("l_depth", T.IntegerType()),
    T.StructField("is_redir", T.BooleanType()),
    T.StructField("parent_host", T.StringType()),
    T.StructField("l_cookie", T.StringType()),
    T.StructField("l_tag", T.IntegerType()),
])


def _puny_col(cfg: CrawlConfig, host_col):
    if not cfg.punycode:
        return host_col

    @F.pandas_udf(T.StringType())
    def puny_udf(h: pd.Series) -> pd.Series:
        return pd.Series([punycode_host(x) for x in h])

    return puny_udf(host_col)


_STATE_PARTITIONS = 8


def _apply_per_slot(df: DataFrame, bucket_fn, schema) -> DataFrame:
    """groupBy(slot_id)-equivalent applyInPandas with the per-group
    Arrow overhead amortized.

    A native `groupBy("slot_id").applyInPandas` pays ~3-5 ms of Arrow
    serialization + pandas construction PER GROUP; with the reference's
    20k open-addressed site slots (types.h:35) live, that is ~100 s per
    round regardless of row volume — the per-group constant, not the
    data, dominates at web scale. Instead shuffle on a coarse bucket of
    slot_id (hash co-location still guarantees every row of a slot
    lands in the same pandas call) and run `bucket_fn` once per bucket;
    it iterates the slots internally via `_slot_spans` over a single
    (slot_id, order)-sorted frame, so both the Arrow constant AND the
    pandas constant are paid per bucket (~128), never per slot. Bucket
    count only shapes parallelism, never results.
    """
    n_buckets = max(
        64, df.sparkSession.sparkContext.defaultParallelism * 4)
    bucketed = df.withColumn(
        "_slot_bucket",
        F.pmod(F.col("slot_id"), F.lit(n_buckets)).cast("int"))

    def outer(pdf: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(pdf.drop(columns=["_slot_bucket"]))

    return bucketed.groupBy("_slot_bucket").applyInPandas(outer, schema)


def _slot_spans(ids):
    """Contiguous [i, j) index spans per slot over a slot_id-sorted
    array — the zero-copy replacement for per-slot pandas groups."""
    import numpy as np
    arr = np.asarray(ids)
    if arr.size == 0:
        return []
    starts = np.flatnonzero(np.r_[True, arr[1:] != arr[:-1]])
    ends = np.r_[starts[1:], arr.size]
    return list(zip(starts.tolist(), ends.tolist()))


# per-eager-action wall-clock attribution (SPARK_GRAFT_PROFILE):
# label -> [seconds per call]. The per-round driver span S is the sum
# of serial eager actions; this map shows WHICH action carries it and
# how each scales with volume (VERDICT r4 #2 — the curated_huge span
# growth has to be attributable, not guessed). run_crawl.py publishes
# the aggregate in its result JSON when profiling is on.
ACTION_PROF: Dict[str, list] = {}


def _act(label: str, thunk):
    """Run one eager driver action, timing it under SPARK_GRAFT_PROFILE
    (zero overhead otherwise)."""
    import os as _o
    if not _o.environ.get("SPARK_GRAFT_PROFILE"):
        return thunk()
    import time as _t
    t0 = _t.time()
    r = thunk()
    ACTION_PROF.setdefault(label, []).append(round(_t.time() - t0, 3))
    return r


def _lc(df: DataFrame, parts: int = _STATE_PARTITIONS) -> DataFrame:
    """Materialize + truncate lineage (in-memory commit; durable
    commits happen at the snapshot cadence).

    The coalesce is load-bearing: per-round unionByName would
    otherwise grow the partition count without bound (every round
    appends the delta's partitions), drowning later rounds in empty
    tasks. State tables stay at a fixed partition count; at cluster
    scale this constant is sized to the executor count."""
    return df.coalesce(parts).localCheckpoint(eager=True)


def scale_safe_fetch_join(docs: DataFrame, fetched: DataFrame,
                          materialize=None) -> DataFrame:
    """Left-outer `fetched |><| documents` without ever broadcasting
    documents: at crawl scale documents is the LARGEST table and the
    scheduled batch is bounded (fetch_cap_per_round), so broadcast the
    batch and stream documents map-side (one scan, runtime-filter/DPP
    prunable), then recover the outer rows (scheduled URL with no
    document = connection-failure analogue) from the materialized hit
    set — both sides of that anti-join are <= |fetched|. The
    only BroadcastExchange inputs are fetched-side columns
    (tests/test_fetch_join_plan.py asserts this on the physical plan).

    materialize pins the hit set so the anti-join doesn't re-scan
    documents (defaults to the round's localCheckpoint).

    NOTE: the production round (_phase_e) inlines the deferred-miss
    variant of this shape — it checkpoints the hit side once (with
    all per-page computation riding the same pass, at the docs
    scan's partitioning, no repartition) and recovers the misses
    from the checkpoint's bounded url list afterwards. This helper
    keeps the join-direction contract testable in isolation
    (tests/test_fetch_join_plan.py) and serves non-round callers."""
    if materialize is None:
        materialize = _lc
    hits = materialize(docs.join(F.broadcast(fetched),
                                 fetched.url == docs.doc_id, "inner"))
    null_doc_cols = [F.lit(None).cast(f.dataType).alias(f.name)
                     for f in docs.schema.fields]
    miss = (fetched.join(F.broadcast(hits.select("url")),
                         "url", "left_anti")
            .select("*", *null_doc_cols))
    page_cols = [*fetched.columns, *[f.name for f in docs.schema.fields]]
    return hits.select(*page_cols).unionByName(miss.select(*page_cols))


def _defaults_for_new_slots(df: DataFrame) -> DataFrame:
    return df.select(
        "slot_id", F.lit("").alias("name"), F.lit(0).alias("port"),
        F.lit(slot_logic.WAIT_DNS).alias("dns_state"),
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("forbidden"),
        F.lit(0).alias("nburls"),
        F.lit(None).cast(T.LongType()).alias("dns_queue_pos"),
        F.lit(-1).alias("dns_expire_round"), F.lit(0).alias("ip_hash"))


class RoundRunner:
    """Executes crawl rounds against dimension tables.

    dims: documents(doc_id, spans, status, redirect_to, content_type,
    length), hosts(host, dns_ok, ip), robots(host, status, body,
    reachable) — the synthetic-web / simulated-network inputs.
    """

    def __init__(self, spark: SparkSession, cfg: CrawlConfig,
                 dims: Dict[str, DataFrame]):
        self.spark = spark
        self.cfg = cfg
        self.dims = dims
        self.expire_rounds = max(1, (2 * 24 * 3600) // max(1, cfg.wait_duration))
        # width for per-round COMPUTE frames (the fetched-pages chain:
        # content hashing + link extraction are the crawl's per-page
        # CPU). State tables coalesce to _STATE_PARTITIONS for bounded
        # file counts, but materializing the pages frame at state
        # width would cap every downstream mapInPandas at 8-way — on a
        # 32-core box that alone made phase E ~7x slower than the same
        # plan at full width (measured: the heavy-fixture extract pass
        # at 6 vs 32 partitions is 25.3 s vs 3.6 s).
        self.width = max(_STATE_PARTITIONS,
                         spark.sparkContext.defaultParallelism)
        # when set to a dict, run_round stashes its key LAZY frames
        # (pre-localCheckpoint, full lineage) under phase-stage names
        # so tools/explain_audit.py can assert the integration plan's
        # scale properties (no frontier-wide Window, no doc-side or
        # growing-table broadcast) — per-query audits can't see plans
        # that only exist inside the round
        self.plan_probe: Dict[str, DataFrame] | None = None

    def _cap(self, name: str, df: DataFrame) -> DataFrame:
        if self.plan_probe is not None:
            self.plan_probe[name] = df
        return df

    # ---------------- seeding ----------------

    def seed(self, st: CrawlState, seed_urls) -> CrawlState:
        """O-1: parse seeds in order, dedup, enqueue (global.cxx:284-297)."""
        cfg = self.cfg
        rows = []
        seen_new = []
        seen_set = set()  # seeds are few; existing seen is empty at bootstrap
        from ..kernels.hashes import url_hash
        from ..kernels.urlfilter import match_priv_ext
        n_dup_seeds = 0
        for raw in seed_urls:
            u = parse_url(raw, cfg.depth_in_site, None)
            if u is None:
                continue
            b = url_hash(u.host, u.port, u.path, cfg.hash_size)
            if b in seen_set:
                n_dup_seeds += 1  # check() counts urlDup (checker.cxx:61)
                continue
            seen_set.add(b)
            seen_new.append((b,))
            queue = ("priority" if cfg.specific_search and cfg.privileged_exts
                     and match_priv_ext(u.path, cfg.privileged_exts) else "disk")
            st.counters[f"n_{queue}"] += 1
            rows.append((u.url, u.host, u.port, u.path, u.depth, None, 0,
                         st.counters["qseq_next"] + len(rows), queue))
        st.counters["qseq_next"] += len(rows)
        spark = self.spark
        from .state import SEEN_SCHEMA
        qdf = spark.createDataFrame(rows, QUEUE_SCHEMA)
        st.tables["queues"] = st.queues.unionByName(qdf)
        st.deltas["queues_add"] = (
            st.deltas["queues_add"].unionByName(qdf)
            if "queues_add" in st.deltas else qdf)
        st.tables["seen"] = st.seen.unionByName(
            spark.createDataFrame(seen_new, SEEN_SCHEMA))
        if n_dup_seeds:
            from .state import METRICS_SCHEMA
            st.tables["metrics"] = st.metrics.unionByName(
                spark.createDataFrame(
                    [(0, 0, "urlDup", n_dup_seeds)], METRICS_SCHEMA))
        return st

    def submit(self, st: CrawlState, subs) -> CrawlState:
        """Entry point B: a batch of input-port submissions
        (input.cxx:125-160) unioned into the frontier before a round.
        subs: [(raw_url, priority, test, tag), ...] in arrival order.

        test=1 dedups against the seen set — already-seen URLs drop
        SILENTLY (input.cxx:142-144 deletes without counting, unlike
        checker.cxx's urlDup); test=0 force-sets the seen bit and
        enqueues regardless. priority>0 -> the priority queue. tag is
        the URL_TAGS id parsed off the submission line
        (url.cxx:223-228).

        Submission batches are bounded like seeds (the reference
        parses them serially on the main thread), so routing runs
        driver-side; the only cluster work is one bounded membership
        probe against the seen table (filter on <=|subs| buckets)."""
        cfg, spark = self.cfg, self.spark
        from ..kernels.hashes import url_hash
        parsed = []
        for raw, priority, test, tag in subs:
            u = parse_url(raw, cfg.depth_in_site, None)
            if u is None:
                continue
            b = url_hash(u.host, u.port, u.path, cfg.hash_size)
            parsed.append((u, int(priority), int(test), int(tag), b))
        if not parsed:
            return st
        # probe EVERY submitted bucket (not just test=1): a test=0
        # force-set on an already-seen URL must be a no-op on the
        # seen TABLE (the reference's seen->set is an idempotent bit
        # set) — probing only test=1 buckets would append a duplicate
        # bucket row and diverge from the oracle's set.
        # The probe is a broadcast semi-join (|subs| rows broadcast,
        # seen streamed map-side with parquet min/max pruning on the
        # range-sharded bucket files) — an isin() literal list would
        # inflate the Catalyst plan linearly with the batch size.
        probe = {p[4] for p in parsed}
        from .state import SEEN_SCHEMA
        probe_df = spark.createDataFrame(
            [(b,) for b in sorted(probe)], SEEN_SCHEMA)
        hits = {r["bucket"] for r in
                st.seen.join(F.broadcast(probe_df), "bucket", "left_semi")
                .collect()}
        rows, new_buckets = [], []
        seen_now = set(hits)
        for u, priority, test, tag, b in parsed:
            if test and b in seen_now:
                continue  # silent drop
            if b not in seen_now:
                seen_now.add(b)
                if b not in hits:
                    new_buckets.append((b,))
            queue = "priority" if priority else "disk"
            st.counters[f"n_{queue}"] += 1
            rows.append((u.url, u.host, u.port, u.path, u.depth, None,
                         tag, st.counters["qseq_next"] + len(rows), queue))
        st.counters["qseq_next"] += len(rows)
        new_tables = dict(st.tables)
        deltas = dict(st.deltas)
        qdf = spark.createDataFrame(rows, QUEUE_SCHEMA)
        new_tables["queues"] = st.queues.unionByName(qdf)
        deltas["queues_add"] = (deltas["queues_add"].unionByName(qdf)
                                if "queues_add" in deltas else qdf)
        bitmaps = dict(st.bitmaps)
        if new_buckets:
            bdf = spark.createDataFrame(new_buckets, SEEN_SCHEMA)
            new_tables["seen"] = st.seen.unionByName(bdf)
            deltas["seen"] = (deltas["seen"].unionByName(bdf)
                              if "seen" in deltas else bdf)
            if "seen" in bitmaps:
                # keep the carried membership bitmap consistent with
                # the table (driver-side OR; |subs| is bounded)
                import numpy as np
                bm = bitmaps["seen"].copy()
                b = np.array([x[0] for x in new_buckets], np.int64)
                np.bitwise_or.at(bm, b >> 3,
                                 (np.uint8(1) << (b & 7).astype(np.uint8)))
                bitmaps["seen"] = bm
        return CrawlState(new_tables, st.counters, deltas, bitmaps)

    # ---------------- the round ----------------

    def run_round(self, st: CrawlState, rnd: int) -> CrawlState:
        import os as _os, time as _time
        _prof = _os.environ.get("SPARK_GRAFT_PROFILE")
        _tracker = self.spark.sparkContext.statusTracker() if _prof else None
        def _nj():
            return len(_tracker.getJobIdsForGroup(None) or []) if _prof else 0
        _t = [_time.time(), _nj()]
        def _mark(label):
            if _prof:
                now, jobs = _time.time(), _nj()
                print(f"    [{label}] {now - _t[0]:.1f}s "
                      f"{jobs - _t[1]}j", flush=True)
                _t[0], _t[1] = now, jobs
        spark, cfg = self.spark, self.cfg
        C = st.counters
        cfg_b = {"max_urls_by_site": cfg.max_urls_by_site,
                 "ignore_robots": cfg.ignore_robots}

        # ---------- phase A: wait valve ----------
        # The valve ("read the first n wait rows as of valve open",
        # main.cxx:190-199) is an O(1) qseq WATERMARK, not a count:
        # every wait row present at valve open has qseq < qseq_next,
        # and every later arrival (bounces re-enqueue with fresh qseq)
        # has qseq >= it — so `qseq < watermark` is exactly the
        # first-n-in-qseq-order set at all times, with no decrement
        # bookkeeping and, crucially, no rank over the frontier. The
        # count form (row_number over partitionBy(queue), <=4 tasks)
        # would sort the ENTIRE 10^10-row frontier per round
        # (VERDICT r2 #2).
        if rnd % cfg.valve_period == 0:
            C["valve_pw_qseq"] = C["qseq_next"]
            C["valve_w_qseq"] = C["qseq_next"]
        if rnd % cfg.valve_period == cfg.valve_open:
            C["valve_pw_qseq"] = 0
            C["valve_w_qseq"] = 0

        # ---------- phase B: sequencer ----------
        # in-flight budget from the incrementally-maintained counters:
        # sum(slots.nburls) == n_site_fifo + n_ip_queue by construction
        # (nburls +1 on A_FIFO/A_TRANSFER in B, -1 on A_FORGET in C and
        # per fetch in D — exactly the moves the two counters mirror;
        # tests/test_crawl_parity.py cross-validates the invariant
        # against the table), which replaces a per-round aggregation
        # job over the slot table with driver arithmetic
        ram_used = C["n_site_fifo"] + C["n_ip_queue"]
        still = min(cfg.seq_per_round, max(0, cfg.ram_urls - int(ram_used)))

        # pure filter (map-side, prunable) — no Window over st.queues;
        # tools/explain_audit.py asserts this on the physical plan
        eligible = st.queues.filter(
            (F.col("queue") == "priority")
            | (F.col("queue") == "disk")
            | ((F.col("queue") == "priority_wait")
               & (F.col("qseq") < F.lit(C.get("valve_pw_qseq", 0))))
            | ((F.col("queue") == "disk_wait")
               & (F.col("qseq") < F.lit(C.get("valve_w_qseq", 0)))))
        cls_order = (F.when(F.col("queue") == "priority_wait", 0)
                      .when(F.col("queue") == "priority", 1)
                      .when(F.col("queue") == "disk_wait", 2).otherwise(3))
        take = (eligible.withColumn("cls_order", cls_order)
                .orderBy("cls_order", "qseq").limit(still))
        take = take.withColumn(
            "take_rank",
            F.row_number().over(Window.orderBy("cls_order", "qseq")) - 1
            + F.lit(C["take_next"]))
        take = (take.withColumnRenamed("queue", "cls")
                .withColumn("slot_id", site_hash_udf(
                    "host", F.lit(cfg.named_site_list_size)))
                .withColumn("puny", _puny_col(cfg, F.col("host"))))
        # capture the pre-checkpoint take for the plan audit (the
        # frontier-scan shape — TakeOrdered + the single take_rank
        # window — lives here), then materialize: the take feeds BOTH
        # the slot-reduction semi-join and the routing join below, and
        # without the checkpoint the TakeOrdered would scan the
        # frontier twice per round
        take = _act("B:take_ck", lambda: _lc(self._cap("B_take", take)))

        slots_pref = st.slots.select(
            "slot_id", F.col("name").alias("s_name"),
            F.col("port").alias("s_port"),
            F.col("dns_state").alias("s_dns_state"),
            F.col("forbidden").alias("s_forbidden"),
            F.col("nburls").alias("s_nburls"),
            F.col("dns_expire_round").alias("s_dns_expire_round"),
            F.col("ip_hash").alias("s_ip_hash"))
        # SCALE: the slot space is config-widened to ~10^8 rows
        # (~10 GB) at the north-rule frontier (SCALE.md §1), so the
        # FULL slot table must never be broadcast. The take is bounded
        # by the sequencer budget: semi-join slots down to the take's
        # distinct slot_ids first (broadcasting the take side, which
        # IS small), then broadcast only the reduced slot rows.
        take_ids = take.select("slot_id").distinct()
        slots_pref = slots_pref.join(F.broadcast(take_ids), "slot_id",
                                     "left_semi")
        take = take.join(F.broadcast(slots_pref), "slot_id", "left")

        def phase_b(pdf: pd.DataFrame) -> pd.DataFrame:
            # one vectorized pass per BUCKET of slots (see
            # _apply_per_slot): sort once, extract row dicts once,
            # then walk per-slot spans with pure-Python slot state —
            # no per-slot pandas objects anywhere
            pdf = (pdf.sort_values(["slot_id", "take_rank"])
                   .reset_index(drop=True))
            rows = pdf[["host", "port", "path", "puny", "cls"]] \
                .to_dict("records")
            sname = pdf["s_name"].tolist()
            sport = pdf["s_port"].tolist()
            sdns = pdf["s_dns_state"].tolist()
            sforb = pdf["s_forbidden"].tolist()
            snb = pdf["s_nburls"].tolist()
            sexp = pdf["s_dns_expire_round"].tolist()

            def _scalar(v, default):
                return default if v is None or v != v else v

            n = len(rows)
            actions = [None] * n
            errs = [None] * n
            for i, j in _slot_spans(pdf["slot_id"].to_numpy()):
                slot = {
                    "name": _scalar(sname[i], ""),
                    "port": _scalar(sport[i], 0),
                    "dns_state": _scalar(sdns[i], None),
                    "forbidden": (None if sforb[i] is None
                                  else list(sforb[i])),
                    "nburls": _scalar(snb[i], 0),
                    "dns_expire_round": _scalar(sexp[i], None),
                }
                acts = slot_logic.route_take(slot, rows[i:j], cfg_b, rnd)
                actions[i:j] = [a for a, _ in acts]
                errs[i:j] = [e for _, e in acts]
            pdf["action"] = actions
            pdf["err"] = errs
            pdf["s_ip_hash"] = pdf["s_ip_hash"].fillna(0).astype("int32")
            return pdf[[f.name for f in ROUTED_SCHEMA]]

        routed = _act("B:routed_ck", lambda: _lc(self._cap(
            "B_routed",
            _apply_per_slot(take, phase_b, ROUTED_SCHEMA))))
        _mark("B:routed")

        # The action-count collect reads only the checkpointed
        # `routed`, and nothing on the way to phase C's expensive
        # `resolved` materialization needs its results (every phase-B
        # derivation below is lazy, and `transfers_b`'s qseq offset
        # reads the PRE-increment counter) — so run it on a driver
        # thread overlapped with phase C and fold the counter updates
        # in when phase C first needs the post-B transfer offset
        # (span cut: the round span is the sum of serial actions).
        from concurrent.futures import ThreadPoolExecutor
        _bex = ThreadPoolExecutor(max_workers=1)
        _f_bstats = _bex.submit(
            lambda: {(r["cls"], r["action"]): r["n"] for r in
                     routed.groupBy("cls", "action")
                     .agg(F.count("*").alias("n")).collect()})
        _bhold: dict = {}

        def _join_bstats() -> int:
            """Join the overlapped collect and apply the phase-B
            counter updates; returns the phase-C transfer offset.
            Idempotent via _bhold (called once)."""
            if "n_bounce" in _bhold:
                return C["transfer_seq_next"]
            bstats = _f_bstats.result()
            _bex.shutdown()
            n_taken = sum(bstats.values())
            n_bounce = sum(n for (_c, a), n in bstats.items()
                           if a == slot_logic.A_BOUNCE)
            n_transfer_b = sum(n for (_c, a), n in bstats.items()
                               if a == slot_logic.A_TRANSFER)
            n_fifo_b = sum(n for (_c, a), n in bstats.items()
                           if a == slot_logic.A_FIFO)
            # no read_pw/read_w decrement: taken rows leave the queue
            # table (anti-join below), so `qseq < watermark` keeps
            # selecting exactly the not-yet-taken valve-open set
            C["take_next"] += n_taken
            for cls in ("priority", "priority_wait", "disk", "disk_wait"):
                C[f"n_{cls}"] -= sum(n for (c, _a), n in bstats.items()
                                     if c == cls)
            for (c, a), n in bstats.items():
                if a == slot_logic.A_BOUNCE:
                    C["n_priority_wait" if c.startswith("priority")
                      else "n_disk_wait"] += n
            C["n_site_fifo"] += n_fifo_b
            C["n_ip_queue"] += n_transfer_b
            C["transfer_seq_next"] += n_transfer_b
            _bhold["n_bounce"] = n_bounce
            return C["transfer_seq_next"]

        queues = st.queues.join(routed.select("qseq"), "qseq", "left_anti")

        wb = Window.orderBy("take_rank")
        bounced = (routed.filter(F.col("action") == slot_logic.A_BOUNCE)
                   .withColumn("queue",
                               F.when(F.col("cls").startswith("priority"),
                                      "priority_wait").otherwise("disk_wait"))
                   .withColumn("qseq", F.row_number().over(wb) - 1
                               + F.lit(C["qseq_next"]))
                   .select(*QUEUE_SCHEMA.names))
        queues = queues.unionByName(bounced)

        fifo_new = (routed.filter(F.col("action") == slot_logic.A_FIFO)
                    .withColumn("fifo_pos", F.col("take_rank"))
                    .select(*SITE_FIFO_SCHEMA.names))
        site_fifo = st.site_fifo.unionByName(fifo_new)

        wt = Window.orderBy("take_rank")
        transfers_b = (routed.filter(F.col("action") == slot_logic.A_TRANSFER)
                       .withColumn("ip_hash", F.col("s_ip_hash"))
                       .withColumn("transfer_seq",
                                   F.row_number().over(wt) - 1
                                   + F.lit(C["transfer_seq_next"]))
                       .select(*IP_QUEUE_SCHEMA.names))
        _mark("B:derive")

        log_b = (routed.filter(F.col("action") == slot_logic.A_FORGET)
                 .select(F.lit(rnd).alias("round"), "url",
                         F.col("err").alias("error")))

        bdelta = routed.groupBy("slot_id").agg(
            F.sum(F.when(F.col("action").isin(
                slot_logic.A_FIFO, slot_logic.A_TRANSFER), 1)
                .otherwise(0)).cast("int").alias("nb_delta"),
            F.min(F.when(F.col("action") == slot_logic.A_FIFO,
                         F.col("take_rank"))).alias("first_fifo_rank"))
        new_ids = bdelta.join(st.slots.select("slot_id"), "slot_id", "left_anti")
        slots = st.slots.unionByName(_defaults_for_new_slots(new_ids))
        dns_entry = (F.lit(rnd * 2).cast("long") * F.lit(1 << 32)
                     + F.col("first_fifo_rank"))
        slots = (slots.join(F.broadcast(bdelta), "slot_id", "left")
                 .withColumn("nburls",
                             F.col("nburls") + F.coalesce("nb_delta", F.lit(0)))
                 .withColumn("dns_queue_pos",
                             F.when(F.col("dns_queue_pos").isNull()
                                    & F.col("first_fifo_rank").isNotNull(),
                                    dns_entry)
                             .otherwise(F.col("dns_queue_pos")))
                 .select(*SLOTS_SCHEMA.names))

        # ---------- phase C: DNS + robots ----------
        # transfer_base_fn: phase C joins the overlapped bstats
        # collect only AFTER its own `resolved` materialization — the
        # first point the post-B transfer offset is actually needed
        (slots, site_fifo, transfers_c, log_c,
         resolved_c) = self._phase_c(
            slots, site_fifo, rnd, _join_bstats)
        n_bounce = _bhold["n_bounce"]
        # the two phase-C outputs AND the action-count collect are
        # independent plans over the already-checkpointed `resolved`:
        # run all three concurrently instead of serially on the
        # driver (each is an eager action; the round span is the sum
        # of serial actions, VERDICT r3 next-round #5)

        def _cstats():
            return {r["action"]: r["n"] for r in
                    resolved_c.groupBy("action")
                    .agg(F.count("*").alias("n")).collect()}

        def _join_c3():
            with ThreadPoolExecutor(max_workers=3) as _ex:
                _f_cstats = _ex.submit(_cstats)
                _f_slots = _ex.submit(_lc, slots)
                _f_fifo = _ex.submit(_lc, site_fifo)
                return (_f_cstats.result(), _f_slots.result(),
                        _f_fifo.result())
        cstats, slots, site_fifo = _act("C:slots_fifo_stats", _join_c3)
        n_transfer_c = cstats.get(slot_logic.A_TRANSFER, 0)
        n_forget_c = cstats.get(slot_logic.A_FORGET, 0)
        C["transfer_seq_next"] += n_transfer_c
        C["n_site_fifo"] -= (n_transfer_c + n_forget_c)
        C["n_ip_queue"] += n_transfer_c
        # link-time fast-fail (initOK) consults slot state as of end of
        # phase C (docs/ROUND_MODEL.md)
        self.set_fastfail_slots(slots)
        _mark("C:done")
        ip_queue = (st.ip_queue.unionByName(transfers_b)
                    .unionByName(transfers_c))

        # ---------- phase D: politeness schedule ----------
        k = max(1, cfg.fetch_per_ip_per_round)
        wip = Window.partitionBy("ip_hash").orderBy("transfer_seq")
        cand = (ip_queue.join(F.broadcast(st.buckets), "ip_hash", "left")
                .filter(F.col("last_fetch_round").isNull()
                        | (F.col("last_fetch_round") < rnd)))
        cand = (cand.withColumn("rn", F.row_number().over(wip))
                .withColumn("bucket_head", F.min("transfer_seq").over(
                    Window.partitionBy("ip_hash"))))
        fetched = self._cap("D_sched", cand.filter(F.col("rn") <= k))
        # (bucket_head, rn) is a unique total order over the fetch set
        # (bucket_head = min transfer_seq of the ip bucket, unique per
        # bucket; rn unique within). With a per-round cap the set is
        # bounded, so TakeOrdered + one bounded window is fine; with
        # cap == 0 the set is #ip-buckets × k and the bucket count is
        # config-widened at scale (SCALE.md §1), so rank it with the
        # two-phase distributed scheme instead of a single-partition
        # window (VERDICT r2 minor).
        _dcnt: dict = {}
        if cfg.fetch_cap_per_round:
            fetched = (fetched.orderBy("bucket_head", "rn")
                       .limit(cfg.fetch_cap_per_round))
            fetched = fetched.withColumn(
                "fetch_seq",
                F.row_number().over(Window.orderBy("bucket_head", "rn")) - 1
                + F.lit(C["fetch_seq_next"]))
        else:
            from ..operators.sequence import assign_global_seq
            # counts_out rides the rank's internal counts job, so the
            # n_fetched action below is only paid on the capped path
            fetched = assign_global_seq(
                fetched, ["bucket_head", "rn"], "fetch_seq",
                C["fetch_seq_next"], counts_out=_dcnt)
        fetched = _act("D:fetched_ck", lambda: _lc(self._cap(
            "D_fetched", fetched.select(
                "url", "host", "port", "path", "depth", "cookie", "tag",
                "slot_id", "ip_hash", "transfer_seq", "fetch_seq"))))
        n_fetched = _dcnt.get("total")
        if n_fetched is None:
            n_fetched = _act("D:count", fetched.count)
        C["fetch_seq_next"] += n_fetched
        C["n_ip_queue"] -= n_fetched
        _mark("D:fetched")

        ip_queue = ip_queue.join(fetched.select("transfer_seq"),
                                 "transfer_seq", "left_anti")
        fetched_buckets = (fetched.select("ip_hash").distinct()
                           .withColumn("last_fetch_round", F.lit(rnd)))
        buckets = (st.buckets.join(fetched_buckets.select("ip_hash"),
                                   "ip_hash", "left_anti")
                   .unionByName(fetched_buckets))
        ddelta = fetched.groupBy("slot_id").agg(
            (-F.count("*")).cast("int").alias("nb_delta"))
        slots = (slots.join(F.broadcast(ddelta), "slot_id", "left")
                 .withColumn("nburls", F.col("nburls")
                             + F.coalesce("nb_delta", F.lit(0)))
                 .select(*SLOTS_SCHEMA.names))

        ordering_new = fetched.select(F.lit(rnd).alias("round"),
                                      "fetch_seq", "url", "cookie", "tag")

        # ---------- phase E: fetch + parse + link pipeline ----------
        (queues, seen, seen_delta, dup_seen, dup_delta, log_e,
         metrics_e, docs_out_new, curation_new, n_links_new, n_success,
         new_bitmaps, links_enqueued) = self._phase_e(
            st, fetched, rnd, C["qseq_next"] + n_bounce, queues,
            mark=_mark)
        C["qseq_next"] += n_bounce + n_links_new
        C["pages_ok"] += n_success
        _mark("E:done")

        # ---------- phase F: commit ----------
        # tables stay lazy here; the crawl driver persists the whole
        # state through the SnapshotStore at every round boundary,
        # which (a) makes each round durably resumable and (b) resets
        # Catalyst's size statistics to real file sizes -- checkpointed
        # in-memory plans preserve computed stats, so join-size
        # estimates would compound multiplicatively across rounds
        # (BigInt stats blowup in the planner)
        new_tables = dict(st.tables)
        new_tables["queues"] = queues
        new_tables["site_fifo"] = site_fifo
        new_tables["ip_queue"] = ip_queue
        new_tables["slots"] = slots
        new_tables["buckets"] = buckets
        new_tables["seen"] = seen
        new_tables["dup_seen"] = dup_seen
        log_new = log_b.unionByName(log_c).unionByName(log_e)
        new_tables["fetch_log"] = st.fetch_log.unionByName(log_new)
        new_tables["ordering"] = st.ordering.unionByName(ordering_new)
        new_tables["metrics"] = st.metrics.unionByName(metrics_e)
        new_tables["docs_out"] = st.tables["docs_out"].unionByName(docs_out_new)
        if cfg.curate:
            # inline curation (pipeline/rowsigs): the signatures were
            # computed inside phase E's compute-width checkpoint, so
            # this union (and the snapshot writer's small-delta
            # coalesce) moves only precomputed values — no extra
            # scan, no shuffle, nothing left for the save to narrow;
            # the table is append-only so each commit writes only
            # this round's rows
            new_tables["curation"] = (st.tables["curation"]
                                      .unionByName(curation_new))
        # delta bookkeeping for the append-only snapshot commits:
        # union with any rows already pending (e.g. submissions that
        # landed on this state before the round)
        deltas = dict(st.deltas)

        def _acc(name: str, df: DataFrame) -> None:
            deltas[name] = (deltas[name].unionByName(df)
                            if name in deltas else df)

        _acc("seen", seen_delta)
        _acc("dup_seen", dup_delta)
        # frontier add/remove deltas for the TOMBSTONED O(delta)
        # snapshot commit (plans/state.py): adds = bounced re-enqueues
        # + newly discovered links; removes = every routed take's qseq
        # (qseq is never reused, so the tombstone anti-join is exact)
        _acc("queues_add", bounced.unionByName(links_enqueued))
        _acc("queues_rm", routed.select("qseq"))
        _acc("fetch_log", log_new)
        _acc("ordering", ordering_new)
        _acc("metrics", metrics_e)
        _acc("docs_out", docs_out_new)
        if cfg.curate:
            _acc("curation", curation_new)
        C["round"] = rnd + 1
        _mark("F:commit")
        return CrawlState(new_tables, C, deltas, new_bitmaps)

    # ---------------- phase C ----------------

    def _phase_c(self, slots: DataFrame, site_fifo: DataFrame, rnd: int,
                 transfer_base_fn):
        """transfer_base_fn: () -> int, the phase-C transfer_seq
        offset. Passed as a callable (not a value) so the caller's
        overlapped phase-B stats collect is joined only after the
        `resolved` materialization below — the offset is a plan
        literal, needed strictly later than the expensive action."""
        cfg = self.cfg
        queued = slots.filter(F.col("dns_queue_pos").isNotNull())
        if cfg.dns_per_round:
            queued = queued.orderBy("dns_queue_pos").limit(cfg.dns_per_round)
        queued = queued.withColumn(
            "proc_rank",
            F.row_number().over(Window.orderBy("dns_queue_pos")))

        # FUSED phase C (stage-count matters: the previous form —
        # per-slot head window + dim joins + robots ArrowEvalPython +
        # a checkpointed `heads` frame + a second scan join — was ~20
        # of the round's Spark jobs; an iterative driver pays that
        # span EVERY round at any cluster size). One inner broadcast
        # join attaches the queued-slot metadata (which also does the
        # semi filter), two broadcast joins attach the host/robots
        # dims per ROW, and the single bucketed Arrow pass below
        # resolves the head (min fifo_pos, newId), computes the DNS
        # outcome, parses robots (kernels/robots.py, same kernel the
        # old UDF wrapped) and runs the fifo scan — emitting the
        # slot-constant head metadata on every row so the slot update
        # is one aggregation over `resolved`, no `heads` frame at all.
        qmeta = queued.select(
            "slot_id", "proc_rank",
            F.col("forbidden").alias("old_forbidden"), "dns_queue_pos")
        hosts = self.dims["hosts"].select(
            F.col("host").alias("puny"), "dns_ok", "ip")
        robots = self.dims["robots"].select(
            F.col("host").alias("puny"),
            F.col("status").alias("rob_status"),
            F.col("body").alias("rob_body"),
            F.coalesce(F.col("reachable"), F.lit(True)).alias("rob_reachable"))
        scan_in = (site_fifo.join(F.broadcast(qmeta), "slot_id")
                   .withColumn("puny", _puny_col(cfg, F.col("host")))
                   .join(F.broadcast(hosts), "puny", "left")
                   .join(F.broadcast(robots), "puny", "left"))
        ignore_robots = cfg.ignore_robots
        user_agent = cfg.user_agent
        ip_slot_size = cfg.ip_site_list_size

        def phase_c_scan(pdf: pd.DataFrame) -> pd.DataFrame:
            # bucket-level pass (see _apply_per_slot): sort once, walk
            # per-slot spans; head metadata comes from the first row
            # of each span (min fifo_pos = the reference's newId)
            from ..kernels.hashes import ip_hash
            from ..kernels.robots import parse_robots
            pdf = (pdf.sort_values(["slot_id", "fifo_pos"])
                   .reset_index(drop=True))
            rows = pdf[["puny", "port", "path"]].to_dict("records")
            dns_ok = pdf["dns_ok"].tolist()
            ips = pdf["ip"].tolist()
            rstat = pdf["rob_status"].tolist()
            rbody = pdf["rob_body"].tolist()
            rreach = pdf["rob_reachable"].tolist()
            oldforb = pdf["old_forbidden"].tolist()

            def _null(v):
                return v is None or v != v
            n = len(rows)
            actions = [None] * n
            errs = [None] * n
            head_puny = [None] * n
            head_port = [0] * n
            outc = [None] * n
            effs = [None] * n
            iph = [0] * n
            for i, j in _slot_spans(pdf["slot_id"].to_numpy()):
                hp, hport = rows[i]["puny"], int(rows[i]["port"])
                if _null(dns_ok[i]) or not dns_ok[i]:
                    outcome = slot_logic.ERROR_DNS
                elif not (True if _null(rreach[i]) else rreach[i]):
                    outcome = slot_logic.NOCONN_DNS
                else:
                    outcome = slot_logic.DONE_DNS
                robots_2xx = (not _null(rstat[i])
                              and 200 <= int(rstat[i]) < 300)
                # parsed on 2xx, else the old list survives (the
                # reference only recycles inside parseRobots)
                if robots_2xx:
                    eff = (parse_robots(rbody[i] or "", user_agent)
                           if outcome == slot_logic.DONE_DNS else None)
                else:
                    eff = (None if oldforb[i] is None
                           else list(oldforb[i]))
                new_ip = (ip_hash(ips[i], ip_slot_size)
                          if outcome == slot_logic.DONE_DNS
                          and not _null(ips[i]) else 0)
                acts = slot_logic.resolve_fifo(
                    hp, hport, outcome, eff, ignore_robots, rows[i:j])
                actions[i:j] = [a for a, _ in acts]
                errs[i:j] = [e for _, e in acts]
                head_puny[i:j] = [hp] * (j - i)
                head_port[i:j] = [hport] * (j - i)
                outc[i:j] = [outcome] * (j - i)
                effs[i:j] = [eff] * (j - i)
                iph[i:j] = [new_ip] * (j - i)
            pdf["action"] = actions
            pdf["err"] = errs
            pdf["head_puny"] = head_puny
            pdf["head_port"] = pd.Series(head_port, dtype="int32")
            pdf["outcome"] = outc
            pdf["eff_forbidden"] = effs
            pdf["new_ip_hash"] = pd.Series(iph, dtype="int32")
            return pdf[[f.name for f in RESOLVED_SCHEMA]]

        resolved = _act("C:resolved_ck",
                        lambda: _lc(_apply_per_slot(scan_in, phase_c_scan,
                                                    RESOLVED_SCHEMA)))
        transfer_base = _act("C:bstats_join", transfer_base_fn)

        # transfers (ordered after phase-B transfers)
        wtr = Window.orderBy("dns_queue_pos", "fifo_pos")
        transfers_c = (resolved.filter(F.col("action") == slot_logic.A_TRANSFER)
                       .withColumn("ip_hash", F.col("new_ip_hash"))
                       .withColumn("transfer_seq",
                                   F.row_number().over(wtr) - 1
                                   + F.lit(transfer_base))
                       .select(*IP_QUEUE_SCHEMA.names))

        log_c = (resolved.filter(F.col("action") == slot_logic.A_FORGET)
                 .select(F.lit(rnd).alias("round"), "url",
                         F.col("err").alias("error")))

        # fifo: stays survive, everything else leaves. The slot set of
        # `resolved` is exactly the queued set restricted to slots with
        # fifo rows, so anti-joining against the (already bounded,
        # already broadcast) `queued` slot list removes the same rows
        # without a distinct-shuffle over resolved.
        stays = resolved.filter(F.col("action") == slot_logic.A_STAY)
        site_fifo_new = (site_fifo
                         .join(F.broadcast(queued.select("slot_id")),
                               "slot_id", "left_anti")
                         .unionByName(stays.select(*SITE_FIFO_SCHEMA.names)))

        # slot updates: ONE aggregation over the checkpointed
        # `resolved` (head metadata is slot-constant, min_by fifo_pos
        # reads it off the head row) — replaces the old heads-frame
        # join
        cdelta = resolved.groupBy("slot_id").agg(
            F.sum(F.when(F.col("action") == slot_logic.A_FORGET, -1)
                  .otherwise(0)).cast("int").alias("nb_delta"),
            F.sum(F.when(F.col("action") == slot_logic.A_STAY, 1)
                  .otherwise(0)).alias("n_stay"),
            F.min_by("head_puny", "fifo_pos").alias("head_puny"),
            F.min_by("head_port", "fifo_pos").alias("head_port"),
            F.min_by("outcome", "fifo_pos").alias("outcome"),
            F.min_by("eff_forbidden", "fifo_pos").alias("eff_forbidden"),
            F.min_by("new_ip_hash", "fifo_pos").alias("new_ip_hash"),
            F.min_by("proc_rank", "fifo_pos").alias("proc_rank"))
        upd = (cdelta
               .select(
                   "slot_id",
                   F.col("head_puny").alias("u_name"),
                   F.col("head_port").alias("u_port"),
                   F.col("outcome").alias("u_dns_state"),
                   F.col("eff_forbidden").alias("u_forbidden"),
                   F.coalesce("nb_delta", F.lit(0)).alias("u_nb_delta"),
                   F.when(F.coalesce("n_stay", F.lit(0)) > 0,
                          F.lit(rnd * 2 + 1).cast("long") * F.lit(1 << 32)
                          + F.col("proc_rank"))
                   .otherwise(F.lit(None).cast("long")).alias("u_dns_queue_pos"),
                   F.lit(rnd + self.expire_rounds).alias("u_dns_expire_round"),
                   F.col("new_ip_hash").alias("u_ip_hash"),
                   F.lit(True).alias("u_processed")))
        slots_new = (slots.join(F.broadcast(upd), "slot_id", "left")
                     .select(
                         "slot_id",
                         F.when(F.col("u_processed"), F.col("u_name"))
                         .otherwise(F.col("name")).alias("name"),
                         F.when(F.col("u_processed"), F.col("u_port"))
                         .otherwise(F.col("port")).cast("int").alias("port"),
                         F.when(F.col("u_processed"), F.col("u_dns_state"))
                         .otherwise(F.col("dns_state")).alias("dns_state"),
                         F.when(F.col("u_processed"), F.col("u_forbidden"))
                         .otherwise(F.col("forbidden")).alias("forbidden"),
                         (F.col("nburls") + F.coalesce("u_nb_delta", F.lit(0)))
                         .cast("int").alias("nburls"),
                         F.when(F.col("u_processed"), F.col("u_dns_queue_pos"))
                         .otherwise(F.col("dns_queue_pos")).alias("dns_queue_pos"),
                         F.when(F.col("u_processed"), F.col("u_dns_expire_round"))
                         .otherwise(F.col("dns_expire_round")).cast("int")
                         .alias("dns_expire_round"),
                         F.when(F.col("u_processed"), F.col("u_ip_hash"))
                         .otherwise(F.col("ip_hash")).cast("int").alias("ip_hash")))
        # the action-count collect over `resolved` is the CALLER's job
        # (run_round overlaps it with the slots/site_fifo
        # materializations on driver threads — all three read the
        # already-checkpointed `resolved`)
        return (slots_new, site_fifo_new, transfers_c, log_c, resolved)

    # ---------------- phase E ----------------

    def _phase_e(self, st: CrawlState, fetched: DataFrame, rnd: int,
                 qseq_base: int, queues: DataFrame, mark=lambda _l: None):
        cfg, spark = self.cfg, self.spark
        docs_dim = self.dims["documents"]
        set_cookie_col = (F.col("set_cookie")
                          if "set_cookie" in docs_dim.columns
                          else F.lit(None).cast("string"))
        slow_col = (F.col("slow") if "slow" in docs_dim.columns
                    else F.lit(False))
        docs = docs_dim.select(
            F.col("doc_id"), F.col("spans"),
            F.col("status").alias("d_status"),
            F.col("redirect_to"), F.col("content_type"),
            F.col("length").alias("d_length"),
            set_cookie_col.alias("set_cookie"),
            slow_col.alias("d_slow"))
        # ONE payload pass: the docs scan feeds the broadcast fetch
        # join and every per-page computation below (render, content
        # hash, curation signatures) lands in the phase-E checkpoint
        # at the SCAN's partitioning — the fat spans column is stored
        # once and never shuffled. The old shape repartition-
        # materialized the hit set first and ran the dup window over
        # the full payload: two full-page-mass movements per round
        # that the r4 span profile showed dominating the curated
        # rungs' serial residual (and that would dominate outright at
        # real page masses). Scan parallelism is the INPUT layout's
        # job, as on a real cluster — fixtures write bounded row
        # groups (fixtures/webgen.write_parquet). Misses (scheduled
        # URL with no document = connection-failure analogue,
        # file.cxx fetch errors) are recovered AFTER the checkpoint
        # from its bounded url list and unioned back, preserving the
        # left-outer semantics without a second documents scan.
        page_cols = [*fetched.columns,
                     *[f.name for f in docs.schema.fields]]
        pages = (docs.join(F.broadcast(fetched),
                           fetched.url == docs.doc_id, "inner")
                 .select(*page_cols))

        ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
        type_ok = (ct.startswith("text/html")
                   | F.lit(bool(cfg.any_type))
                   | (F.lit(bool(cfg.get_image)) & ct.startswith("image")))
        page_class = (
            F.when(F.col("doc_id").isNull(), "err40X")
            # timeout (types.h:114) preempts ALL parsing incl. 30X:
            # the read deadline (fetch_pipe.cxx:50-72) fires before
            # the status line of a slow server arrives
            .when(F.coalesce(F.col("d_slow"), F.lit(False)), "timeout")
            .when((F.col("d_status") >= 300) & (F.col("d_status") < 400), "err30X")
            .when(~((F.col("d_status") >= 200) & (F.col("d_status") < 300)), "err40X")
            .when(~type_ok, "badType")
            .when(F.coalesce(F.col("d_length"), F.lit(0)) > cfg.max_page_size,
                  "tooBig")
            .otherwise("ok"))
        pages = pages.withColumn("page_class", page_class)

        # content-dup gate (hashDup, file.cxx:583-588), in fetch order.
        # The page text is RENDERED JVM-side (stable offset-order sort
        # + concat, exactly kernels/links.render_content: media spans
        # contribute media_ref, others text, nulls as ''), so only the
        # one rendered string crosses Arrow into Python, where the
        # vectorized content hash runs — the old per-page
        # span-dict conversion + per-byte Python hash was the hot
        # spot of this phase on realistic page masses.
        if cfg.page_no_duplicate:
            dup_size = cfg.dup_size

            @F.pandas_udf(T.LongType())
            def content_bucket_udf(rendered: pd.Series) -> pd.Series:
                from ..kernels.vectorized import content_hash_np
                return pd.Series(content_hash_np(rendered, dup_size),
                                 dtype="int64")

            # pack (offset, original index, payload) so the sort is
            # STABLE on offset ties, like Python's sorted in
            # render_content; struct comparison never reaches the
            # payload because the index is unique
            rendered = F.concat_ws("", F.expr(
                "transform(array_sort(transform(spans, (s, i) -> "
                "struct(s.offset as o, i as i, case when s.kind = "
                "'media' then s.media_ref else s.text end as v))), "
                "x -> coalesce(x.v, ''))"))
            # only the content BUCKET is computed on the payload
            # pass; the dup decision itself (first-occurrence window
            # + seen-set probe) runs AFTER the checkpoint over a
            # (fetch_seq, c_bucket) projection — the dup window used
            # to partition the full payload by c_bucket, a second
            # full-page-mass exchange per round
            pages = pages.withColumn(
                "c_bucket",
                F.when(F.col("page_class") == "ok",
                       content_bucket_udf(rendered)))

        # checkpoint at COMPUTE width, not state width: ex_in below
        # feeds the link-extraction mapInPandas, whose parallelism is
        # exactly this frame's partition count
        pages = pages.withColumn(
            "final_error",
            F.when(F.col("page_class") == "ok", "success")
            .otherwise(F.col("page_class")))
        if self.cfg.curate:
            # inline curation computed INSIDE this compute-width
            # checkpoint. The snapshot writer coalesces small deltas
            # (sources/catalog.py write_table), and coalesce narrows
            # its UPSTREAM — a signature projection left lazy for the
            # save would execute 4-wide no matter how many executors
            # the cluster has (measured: ~180 s serial tail per
            # commit window at 2 executors on fat pages). Paying it
            # here rides the materialization the round already does,
            # at the round's full parallelism. Failures stay NULL-
            # cheap: the render is gated to successful pages and
            # every signature propagates the NULL. (final_error here
            # is PRE-dup — a page later classed duplicate computes
            # signatures that the downstream post-dup success filter
            # then drops; dup pages are a small share and the
            # alternative is a payload pass after the dup join.)
            # simhash is NOT
            # here: its expression form is interpreted-HOF bound
            # (2.9 core-ms/page measured) — it rides the vectorized
            # Arrow pass that finalizes curation_new below instead.
            from ..pipeline.rowsigs import (
                CURATION_SIG_NAMES, curation_cols, spans_text_expr,
            )
            pages = pages.withColumn(
                "_ctext", F.when(F.col("final_error") == "success",
                                 spans_text_expr("spans")))
            # separate select so the rendered text stays ONE shared
            # column across the signatures (CollapseProject keeps
            # multi-referenced non-cheap expressions split)
            pages = pages.select(
                "*", *[c.alias("_cur_" + n) for n, c in
                       zip(CURATION_SIG_NAMES,
                           curation_cols(F.col("_ctext")))
                       if n != "simhash"]) \
                .drop("_ctext")
        pages = _act("E:pages_ck",
                     lambda: _lc(self._cap("E_pages", pages), self.width))
        mark("E:pages")
        pages_ck = pages

        # ---- misses (scheduled URL with no document row) ----
        # recovered from the checkpointed hit set's bounded url list
        # (both anti-join sides <= |fetched|); every derived column
        # the hits carry is NULL on a miss except the error class
        miss_fill = []
        for f0 in pages_ck.schema.fields:
            if f0.name in fetched.columns:
                continue
            if f0.name in ("page_class", "final_error"):
                miss_fill.append(F.lit("err40X").alias(f0.name))
            else:
                miss_fill.append(F.lit(None).cast(f0.dataType)
                                 .alias(f0.name))
        miss = (fetched
                .join(F.broadcast(pages_ck.select("url")), "url",
                      "left_anti")
                .select(*fetched.columns, *miss_fill)
                .select(*pages_ck.columns))
        pages = pages_ck.unionByName(miss)

        # ---- content-dup decision over PROJECTED keys (O-13) ----
        # the first-occurrence window and the dup_seen probe read a
        # (fetch_seq, c_bucket) projection of the checkpoint — never
        # the payload. dup_seen GROWS without bound and must never be
        # broadcast as a table: probe it through the fixed-size
        # (dup_size bits) bitmap when the config allows the 8 MB
        # broadcast, else a plain (AQE-planned) join on the slim keys
        # — same split as the URL-seen probe below. The bounded
        # per-round verdict frame is then broadcast back onto pages.
        new_bitmaps: dict = {}
        if cfg.page_no_duplicate:
            dk = (pages_ck.select("fetch_seq", "c_bucket")
                  .filter(F.col("c_bucket").isNotNull()))
            if cfg.seen_bitmap_broadcast:
                from ..operators.membership import (
                    seen_bitmap, with_bitmap_hit,
                )
                # cached bitmap from the previous round (OR-maintained
                # below) — rebuild from the table only on a cold state
                # (bootstrap / resume), never every round
                dup_bm = st.bitmaps.get("dup_seen")
                if dup_bm is None:
                    dup_bm = seen_bitmap(st.dup_seen, cfg.dup_size)
                dk = with_bitmap_hit(dk, dup_bm, "c_bucket",
                                     "dup_seen_hit")
            else:
                dup_hit = (st.dup_seen
                           .select(F.col("bucket").alias("c_bucket"))
                           .withColumn("dup_seen_hit", F.lit(True)))
                dk = dk.join(dup_hit, "c_bucket", "left")
            wdup = Window.partitionBy("c_bucket").orderBy("fetch_seq")
            dk = dk.withColumn("dup_rn", F.row_number().over(wdup))
            dup_ck = _act("E:dupkeys_ck",
                          lambda: _lc(self._cap("E_dupkeys", dk),
                                      self.width))
            mark("E:dup")
            pages = pages.join(
                F.broadcast(dup_ck.select("fetch_seq", "dup_rn",
                                          "dup_seen_hit")),
                "fetch_seq", "left")
            pages = pages.withColumn(
                "page_class",
                F.when((F.col("page_class") == "ok")
                       & (F.coalesce("dup_seen_hit", F.lit(False))
                          | (F.col("dup_rn") > 1)), "duplicate")
                .otherwise(F.col("page_class")))
            pages = pages.withColumn(
                "final_error",
                F.when(F.col("page_class") == "ok", "success")
                .otherwise(F.col("page_class")))
            # testSet sets the bit for the first occurrence even when
            # the page then fails later gates — dup_ck rows are
            # exactly the pages that reach the dup test, matching
            # endInput order
            dup_new = (dup_ck.filter(
                (F.col("dup_rn") == 1)
                & ~F.coalesce("dup_seen_hit", F.lit(False)))
                .select(F.col("c_bucket").alias("bucket")))
            dup_seen = st.dup_seen.unionByName(dup_new)
            if cfg.seen_bitmap_broadcast:
                from ..operators.membership import seen_bitmap as _sbm
                # O(delta) maintenance: OR only this round's new
                # buckets into the carried bitmap
                new_bitmaps["dup_seen"] = dup_bm | _sbm(dup_new,
                                                        cfg.dup_size)
        else:
            from .state import SEEN_SCHEMA as _SEEN
            dup_new = spark.createDataFrame([], _SEEN)
            dup_seen = st.dup_seen

        log_e_pages = pages.select(F.lit(rnd).alias("round"), "url",
                                   F.col("final_error").alias("error"))
        # the success count reads the checkpointed `pages` frame —
        # run it on a driver thread, overlapped with the link/gate
        # chain's materialization below, and join it after (span cut,
        # VERDICT r3 next-round #5)
        from concurrent.futures import ThreadPoolExecutor
        _nsx = ThreadPoolExecutor(max_workers=1)
        _f_nsuccess = _nsx.submit(
            lambda: pages.filter(F.col("final_error") == "success").count())
        _bg = [(_nsx, _f_nsuccess)]
        try:

            docs_out_new = (pages.filter(F.col("final_error") == "success")
                            .select(F.lit(rnd).alias("round"), "fetch_seq",
                                    "doc_id", "spans", "tag"))
            curation_new = None
            if self.cfg.curate:
                # five signatures are a free column select (computed in
                # the pages checkpoint above); simhash is appended by the
                # vectorized Arrow kernel (kernels/vectorized.py
                # simhash60_batch — factorize + bincount + BLAS, 20x the
                # expression form) over a re-render of the success rows.
                # Materialized EAGERLY at compute width: curation_new
                # feeds the snapshot save, whose small-delta coalesce
                # would otherwise narrow this mapInPandas to 4 workers
                # regardless of cluster size.
                from ..pipeline.rowsigs import (
                    CURATION_SIG_NAMES, curation_finalize_fn,
                    spans_text_expr,
                )
                from .state import CURATION_SCHEMA
                # read the HIT side of the checkpoint directly: misses
                # are never 'success', so the union/anti-join branch is
                # dead weight here; the post-dup verdict is applied via
                # the bounded broadcast dup frame (success rows always
                # carry a non-null dup_rn — c_bucket is non-null for
                # every pre-dup 'ok' page)
                cur_src = pages_ck.filter(F.col("final_error") == "success")
                if cfg.page_no_duplicate:
                    cur_src = (cur_src.join(
                        F.broadcast(dup_ck.select("fetch_seq", "dup_rn",
                                                  "dup_seen_hit")),
                        "fetch_seq", "left")
                        .filter(~(F.coalesce("dup_seen_hit", F.lit(False))
                                  | (F.coalesce("dup_rn", F.lit(1)) > 1))))
                cur_base = (
                    cur_src
                    .select(F.lit(rnd).alias("round"), "fetch_seq",
                            "doc_id",
                            *[F.col("_cur_" + n).alias(n)
                              for n in CURATION_SIG_NAMES
                              if n != "simhash"],
                            spans_text_expr("spans").alias("_ctext")))
                # materialize on a driver thread, OVERLAPPED with the
                # link/gate chain below: curation_new and the links
                # checkpoint both read only already-materialized frames
                # (pages_ck + the broadcast dup verdicts), so their eager
                # actions are independent — running them serially leaves
                # the cluster idle in each one's scheduling gaps (VERDICT
                # r3 #5 span cut, same pattern as the n_success count).
                # The future resolves right after the links checkpoint.
                _cur_ex = ThreadPoolExecutor(max_workers=1)
                _f_curation = _cur_ex.submit(
                    lambda: _lc(self._cap(
                        "E_curation", cur_base.mapInPandas(
                            curation_finalize_fn(), CURATION_SCHEMA)),
                        self.width))
                _bg.append((_cur_ex, _f_curation))

            # ---- link extraction (mapInPandas over spans, O-12) ----
            get_image, get_cgi = cfg.get_image, cfg.get_cgi
            use_cookies = bool(cfg.use_cookies)
            # SCALE: prune the span array JVM-side BEFORE it crosses Arrow
            # into the extract workers. extract_links reads only
            # anchor/frame/base spans (+ media iff getImage) — plain text
            # spans, which carry ~all of a page's mass, contribute nothing
            # (kernels/links.py:111 "kind == text: no link") and base-state
            # ordering among the kept spans is preserved by filter(). The
            # Arrow span transfer is the measured one-box residual of the
            # curated rungs (docs/SCALE.md §6: E:extract 2.1x/4); shipping
            # only the link-bearing spans cuts it to the outlink mass.
            link_kinds = ("'anchor','frame','base','media'" if get_image
                          else "'anchor','frame','base'")
            ex_in = pages.filter(F.col("final_error").isin("success", "err30X")) \
                .select("fetch_seq", "host", "port", "path", "depth",
                        F.expr(f"filter(spans, s -> s.kind in ({link_kinds}))")
                        .alias("spans"),
                        "redirect_to", "cookie", "set_cookie", "tag",
                        (F.col("final_error") == "err30X").alias("redir_row"))

            def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                import os as _os, sys as _sys, time as _time
                _dbg = _os.environ.get("SPARK_GRAFT_DEBUG_E")
                _te0, _np = _time.time(), 0
                from ..kernels.urlnorm import merge_cookie
                cols = [f.name for f in LINKS_SCHEMA]
                for pdf in batches:
                    out = []
                    for row in pdf.itertuples(index=False):
                        page = ParsedUrl(row.host, int(row.port), row.path,
                                         int(row.depth))
                        if row.redir_row:
                            # 30X headers don't capture cookies
                            # (addCookie only runs in parseHeader)
                            pc = row.cookie if use_cookies else None
                            cleaned = clean_redirect_text(
                                row.redirect_to or "", get_cgi)
                            u = (parse_url(cleaned, page.depth, give_base(page))
                                 if cleaned else None)
                            if u is not None:
                                lc = pc if (use_cookies
                                            and u.host == row.host) else None
                                # redirects inherit the page tag
                                # (file.cxx:551-553)
                                out.append((row.fetch_seq, 0, u.host,
                                            u.port, u.path, u.depth, True,
                                            row.host, lc, int(row.tag)))
                        else:
                            pc = (merge_cookie(row.cookie, row.set_cookie)
                                  if use_cookies else None)
                            tup = [(d["kind"], d["text"], d["media_ref"],
                                    d["offset"]) for d in row.spans]
                            for i, u in enumerate(extract_links(
                                    tup, page, get_image, get_cgi)):
                                lc = pc if (use_cookies
                                            and u.host == row.host) else None
                                # extracted links get the ctor default
                                # tag 0 (url.cxx:185-187)
                                out.append((row.fetch_seq, i, u.host,
                                            u.port, u.path, u.depth, False,
                                            row.host, lc, 0))
                    _np += len(pdf)
                    yield pd.DataFrame(out, columns=cols)
                if _dbg:
                    print(f"[extract-part] {_time.time() - _te0:.2f}s "
                          f"{_np} pages", file=_sys.stderr, flush=True)

            links = ex_in.mapInPandas(extract, LINKS_SCHEMA)

            # ---- manageUrl gates (file.cxx:329-357) ----
            domains_csv = "|".join(cfg.domains) if cfg.domains else ""
            exts_csv = "|".join(cfg.forbidden_extensions)
            links = links.filter(filter1_udf(
                "l_host", "l_path", F.lit(domains_csv), F.lit(exts_csv)))
            links = links.filter(
                F.lit(bool(cfg.external_links)) | F.col("is_redir")
                | (F.col("l_host") == F.col("parent_host")))

            # ---- initOK gates (url.cxx:343-391) ----
            cross = F.col("l_host") != F.col("parent_host")
            err_col = F.lit(None).cast("string")
            if cfg.lock_site:
                err_col = F.when(cross, "outSite").otherwise(err_col)
            if cfg.depth_by_site:
                links = links.withColumn(
                    "l_depth", F.when(cross, cfg.depth_in_site)
                    .otherwise(F.col("l_depth")))
            links = links.withColumn("gate_err", err_col)
            links = links.withColumn(
                "gate_err", F.when(F.col("gate_err").isNotNull(), F.col("gate_err"))
                .when(F.col("l_depth") < 0, "tooDeep"))

            links = links.withColumn(
                "l_slot_id",
                site_hash_udf("l_host", F.lit(cfg.named_site_list_size)))
            slots_now = self._slots_for_fastfail
            # SCALE: never FORCE-broadcast the slot table onto the link
            # stream — at the widened ~10^8-slot space that is a ~10 GB
            # exchange per round. Unhinted, the planner broadcasts only
            # when the actual (checkpointed) slot table is small; at a
            # config-widened slot space we hint shuffle-hash so the
            # unbounded link side is hash-joined on l_slot_id, never
            # sorted and never the build for a forced broadcast.
            if cfg.named_site_list_size > (1 << 22):
                slots_now = slots_now.hint("shuffle_hash")
            links = links.join(slots_now, "l_slot_id", "left")
            ff = ((F.col("ff_name") == F.col("l_host"))
                  & (F.col("ff_port") == F.col("l_port")))
            links = links.withColumn(
                "gate_err",
                F.when(F.col("gate_err").isNotNull(), F.col("gate_err"))
                .when(ff & (F.col("ff_state") == slot_logic.ERROR_DNS), "fastNoDns")
                .when(ff & (F.col("ff_state") == slot_logic.NOCONN_DNS), "fastNoConn")
                .when(ff & (F.col("ff_state") == slot_logic.DONE_DNS)
                      & ~robots_allowed_udf("l_path", F.col("ff_forbidden"),
                                            F.lit(bool(cfg.ignore_robots))),
                      "fastRobots"))

            # checkpoint the gated link stream ONCE (all rows, slim
            # columns, gate_err included, ff_* dropped): every downstream
            # consumer — the survivors dedup chain, the gate-error
            # metrics, the enqueue rank — reads this frame, so the
            # extract mapInPandas runs exactly once per round. Before
            # this, the lazy gate-error branch of metrics_e re-executed
            # the whole extract chain at every durable metrics
            # materialization (measured: 2x the extract cost per round
            # on the heavy-page fixture).
            # slim checkpoint (r5): is_redir and parent_host are
            # consumed entirely by the gates above; carrying them into
            # the checkpoint (and through the survivors window + rank
            # shuffles downstream) was dead string mass
            links = _act("E:links_ck", lambda: _lc(self._cap(
                "E_links", links.select(
                    "fetch_seq", "link_idx", "l_host", "l_port",
                    "l_path", "l_depth",
                    "l_cookie", "l_tag", "gate_err")), self.width))
            if curation_new is None and self.cfg.curate:
                curation_new = _act("E:curation_join", _f_curation.result)
                _cur_ex.shutdown()
            mark("E:extract")

            # ---- check(): seen testSet in deterministic order (O-6) ----
            survivors = links.filter(F.col("gate_err").isNull())
            survivors = survivors.withColumn(
                "bucket", url_bucket_udf("l_host", "l_port", "l_path",
                                         F.lit(cfg.hash_size)))
            wdedup = Window.partitionBy("bucket").orderBy("fetch_seq", "link_idx")
            survivors = survivors.withColumn("brn", F.row_number().over(wdedup))
            if cfg.seen_bitmap_broadcast:
                # map-side bit test against the broadcast bitmap — same
                # semantics as the join (membership.py docstring), no
                # shuffle of the candidate set against seen
                from ..operators.membership import seen_bitmap, with_bitmap_hit
                bm = st.bitmaps.get("seen")
                if bm is None:  # cold state (bootstrap / resume) only
                    bm = seen_bitmap(st.seen, cfg.hash_size)
                survivors = with_bitmap_hit(survivors, bm, "bucket", "seen_hit")
            else:
                seen_hit = st.seen.withColumn("seen_hit", F.lit(True))
                survivors = (survivors.join(seen_hit, "bucket", "left")
                             .withColumn("seen_hit",
                                         F.coalesce("seen_hit", F.lit(False))))
            survivors = _act("E:survivors_ck", lambda: _lc(self._cap(
                "E_survivors", survivors.withColumn(
                    "is_dup", (F.col("brn") > 1) | F.col("seen_hit")))))
            mark("E:survivors")
            n_success = _act("E:nsuccess_join", _f_nsuccess.result)
            _nsx.shutdown()
        except BaseException:
            # ADVICE r4: if the curation-setup / links / extract chain
            # raises before the .result() joins, the background Spark
            # jobs must not keep running on non-daemon worker threads
            # (they would delay interpreter shutdown). cancel() covers
            # not-yet-started futures; shutdown(wait=False) detaches
            # the rest without blocking the raise.
            for _ex, _fu in _bg:
                _fu.cancel()
                _ex.shutdown(wait=False)
            raise

        novel = survivors.filter(~F.col("is_dup"))

        if cfg.specific_search and cfg.privileged_exts:
            from ..kernels.urlfilter import match_priv_ext

            @F.pandas_udf(T.BooleanType())
            def priv_udf(p: pd.Series) -> pd.Series:
                return pd.Series([match_priv_ext(x or "", cfg.privileged_exts)
                                  for x in p])
            queue_col = F.when(priv_udf("l_path"), "priority").otherwise("disk")
        else:
            queue_col = F.lit("disk")

        # per-round new links are pages x links/page and UNBOUNDED —
        # the one sequence that must not be a single-partition
        # window; two-phase rank under the same total order instead
        from ..operators.sequence import assign_global_seq
        picked = novel.select(
            "fetch_seq", "link_idx",
            F.col("l_host").alias("host"),
            F.col("l_port").alias("port"), F.col("l_path").alias("path"),
            F.col("l_depth").alias("depth"),
            F.col("l_cookie").alias("cookie"),
            F.col("l_tag").alias("tag"),
            queue_col.alias("queue"))
        # the per-queue stats ride the rank's internal counts job
        # (counts_by) — no separate lstats action over new_rows
        _lcnt: dict = {}

        def _rank_and_ck():
            nr = assign_global_seq(
                picked, ["fetch_seq", "link_idx"], "qseq", qseq_base,
                counts_by=["queue"], counts_out=_lcnt)
            # re-derive the canonical URL string (LINKS_SCHEMA note)
            # AFTER the range shuffle + rank, so the string rides no
            # phase-E barrier twice
            nr = nr.withColumn(
                "url", F.concat(
                    F.lit("http://"), F.col("host"),
                    F.when(F.col("port") == 80, F.lit("")).otherwise(
                        F.concat(F.lit(":"), F.col("port").cast("string"))),
                    F.col("path")))
            return _lc(nr.select(*QUEUE_SCHEMA.names))
        new_rows = _act("E:enqueue_rank", _rank_and_ck)
        mark("E:links")
        lstats = _lcnt["by"]
        n_links_new = _lcnt["total"]
        st.counters["n_priority"] += lstats.get("priority", 0)
        st.counters["n_disk"] += lstats.get("disk", 0)
        queues = queues.unionByName(new_rows)
        seen_delta = novel.select("bucket")
        seen = st.seen.unionByName(seen_delta)
        if cfg.seen_bitmap_broadcast:
            # O(delta) bitmap maintenance (scan of the checkpointed
            # survivors only, never the full seen table)
            new_bitmaps["seen"] = bm | seen_bitmap(seen_delta,
                                                   cfg.hash_size)

        # ---- metrics / lineage (O-19) ----
        gate_errors = links.filter(F.col("gate_err").isNotNull()) \
            .select(F.col("gate_err").alias("error"))
        dup_errors = survivors.filter(F.col("is_dup")) \
            .select(F.lit("urlDup").alias("error"))
        page_errors = pages.select(F.col("final_error").alias("error"))
        all_events = gate_errors.unionByName(dup_errors).unionByName(page_errors)
        metrics_e = (all_events
                     .withColumn("partition_id", F.spark_partition_id())
                     .groupBy("partition_id", "error")
                     .agg(F.count("*").alias("n"))
                     .select(F.lit(rnd).alias("round"), "partition_id",
                             "error", "n"))
        # forgets from phases B/C are appended by the caller into
        # fetch_log; their taxonomy counts live there.

        return (queues, seen, seen_delta, dup_seen, dup_new,
                log_e_pages, metrics_e, docs_out_new, curation_new,
                n_links_new, n_success, new_bitmaps, new_rows)

    @property
    def _slots_for_fastfail(self) -> DataFrame:
        return self._fastfail_slots

    def set_fastfail_slots(self, slots: DataFrame) -> None:
        self._fastfail_slots = slots.select(
            F.col("slot_id").alias("l_slot_id"),
            F.col("name").alias("ff_name"), F.col("port").alias("ff_port"),
            F.col("dns_state").alias("ff_state"),
            F.col("forbidden").alias("ff_forbidden"))
