"""Crawler-pattern relational operators on generic tables.

Each function is the standalone, DuckDB-checkable form of a pattern
the crawl pipeline uses (SURVEY.md §2): window-capped dequeues (O-7),
per-bucket head selection (O-9), anti-join dedup (O-6), ordered
priority take (O-7), union merge-back (O-15), explode/flatMap (O-12),
multi-way broadcast join + aggregation (O-22/O-19), histograms
(O-19). All computed columns are aliased to match the oracle SQL in
__spark_entry__ exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequencer_window(events: DataFrame, per_host_cap: int = 5) -> DataFrame:
    """O-7 analogue: per-host FIFO cap — first N events per user by
    (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= per_host_cap)
            .select("user_id", "event_id",
                    F.col("rn").cast("int").alias("fifo_rank"))
            .orderBy("user_id", "fifo_rank"))


def politeness_heads(events: DataFrame, n_buckets: int = 100) -> DataFrame:
    """O-9 analogue: one head per ip-hash bucket per round."""
    b = (F.col("user_id") % n_buckets).alias("bucket")
    w = Window.partitionBy("bucket").orderBy("ts", "event_id")
    return (events.select("event_id", "ts", "user_id", b)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("bucket", "event_id", "user_id")
            .orderBy("bucket"))


def antijoin_dedup(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """O-6 analogue: candidates not in the seen set (left anti).

    The "seen set" is the urgent-order customer list (a non-trivial
    subset at every SF, unlike all-orders which covers every customer).
    """
    seen = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (customer.join(seen, customer.c_custkey == seen.o_custkey,
                          "left_anti")
            .select("c_custkey", "c_name").orderBy("c_custkey"))


def priority_dequeue(orders: DataFrame, limit: int = 100) -> DataFrame:
    """O-7 strict-priority ordered take with deterministic ties."""
    return (orders.orderBy("o_orderpriority", "o_orderdate", "o_orderkey")
            .limit(limit)
            .select("o_orderkey", "o_orderpriority", "o_orderdate"))


def frontier_merge(orders: DataFrame) -> DataFrame:
    """O-15 analogue: union two frontier slices, first-wins dedup on
    the bucket key (min o_orderkey per custkey-bucket)."""
    a = orders.filter(F.col("o_orderkey") % 3 != 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 0)
    u = a.unionByName(b)
    return (u.groupBy((F.col("o_custkey") % 64).alias("bucket"))
            .agg(F.min("o_orderkey").alias("first_key"),
                 F.count("*").alias("n_candidates"))
            .orderBy("bucket"))


def explode_tokens(documents: DataFrame, min_count: int = 50) -> DataFrame:
    """O-12 analogue: flatMap page -> links via explode."""
    tok = documents.select(
        F.explode(F.split(F.col("text"), " ")).alias("token"))
    return (tok.groupBy("token").agg(F.count("*").alias("n"))
            .filter(F.col("n") >= min_count).orderBy("token"))


def revenue_join(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame, nation: DataFrame,
                 region: DataFrame) -> DataFrame:
    """O-22 analogue: multi-way dim join + aggregation (the hosts/
    robots joins at scale). Dim tables broadcast."""
    # integer cents via floor(x*100+0.5): per-row double arithmetic is
    # identical on every engine, and the integer sum is order-free --
    # no FP summation-order divergence vs the oracle
    rev_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100 + 0.5).cast("long")
    df = (lineitem
          .join(orders, lineitem.l_orderkey == orders.o_orderkey)
          .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
          .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (df.groupBy("r_name", "n_name")
            .agg(F.sum(rev_cents).alias("revenue_cents"),
                 F.count("*").alias("n_items"))
            .orderBy("r_name", "n_name"))


def error_taxonomy(events: DataFrame) -> DataFrame:
    """O-19 analogue: answers[] counters by taxonomy value."""
    v_e6 = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    return (events.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(v_e6).alias("sum_value_e6"))
            .orderBy("event_type"))


def size_histogram(documents: DataFrame, bucket: int = 256) -> DataFrame:
    """O-19 page-size histogram (4KB buckets in the reference)."""
    return (documents
            .groupBy(F.floor(F.col("n_chars") / float(bucket)).cast("long")
                     .alias("size_bucket"))
            .agg(F.count("*").alias("n"))
            .orderBy("size_bucket"))


def ring_histogram(events: DataFrame,
                   resolutions=(1, 60, 3600),
                   capacity: int = 8) -> DataFrame:
    """O-19 multi-resolution ring histograms: the batch analogue of
    the reference's 1 s / 60 s / 3600 s ring buffers
    (src/utils/histogram.cxx:35-80) that fed the per-8-second rate
    lines (src/main.cxx:212-233). A ring of capacity C at resolution
    R holds counts for only the TRAILING C buckets of width R
    seconds; older buckets are overwritten. Batch form: bucket every
    event at each resolution in one scan (explode of #resolutions
    structs — constant fan-out), keep buckets inside the trailing
    window of the max timestamp (single-row broadcast), one partial
    agg. No UDF, no per-resolution rescans."""
    # naive timestamp -> epoch seconds via timestampdiff (whole
    # seconds since the epoch literal: timezone-independent for NTZ
    # and floor-truncating, exactly DuckDB's floor(epoch(ts)) —
    # unix_timestamp() would shift by the session tz)
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).alias("sec")
    secs = events.select(sec)
    mx = secs.agg(F.max("sec").alias("msec"))
    # bucketing divides with Spark `div`, which truncates toward
    # zero — the SAME semantics as DuckDB's integer `//` (verified:
    # -7 // 2 = -3 there, not floor's -4) and as the C integer
    # division the reference's rings use (histogram.cxx), so the two
    # engines agree even for pre-1970 (negative epoch) timestamps
    binned = secs.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("res"),
                 F.expr(f"sec div {r}").alias("bucket"))
        for r in resolutions])).alias("rb")) \
        .select("rb.res", "rb.bucket")
    return (binned.join(F.broadcast(mx))
            .filter(F.col("bucket")
                    > F.expr("msec div res") - F.lit(capacity))
            .groupBy("res", "bucket")
            .agg(F.count("*").alias("n"))
            .select("res", "bucket", "n")
            .orderBy("res", "bucket"))


def windowed_event_rate(events: DataFrame) -> DataFrame:
    """O-19 rates: per-minute tumbling-window counts per event type
    (batch form of the streaming rate counters)."""
    minute = F.date_trunc("minute", F.col("ts")).alias("minute")
    v_e6 = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    return (events.groupBy(minute, "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(v_e6).alias("sum_value_e6"))
            .orderBy("minute", "event_type"))
