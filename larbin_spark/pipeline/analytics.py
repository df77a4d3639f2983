"""Window-frame / set-op / as-of analytics over the driver tables.

The reference has no analytics of this kind (SURVEY.md §2, "no
window-frame analytics, no grouping sets, no set ops beyond union"),
but a training-data pipeline at 100 TB does: running totals and
moving averages for rate monitoring, sessionization of event streams,
rollup reports, snapshot diffs (set ops), and as-of joins between an
event stream and a slowly-changing dimension. Each function here is
the Spark-idiomatic, shuffle-conscious form with an exact DuckDB
oracle in __spark_entry__.

Scale notes per operator are inline; none of them collect to the
driver, all heavy paths shuffle on an explicit key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_total(orders: DataFrame) -> DataFrame:
    """Cumulative revenue per customer in order-date order (window
    frame ROWS UNBOUNDED PRECEDING). Shuffles once on o_custkey;
    per-key frame evaluation is streaming (no buffering of the whole
    frame), so it scales with the number of orders per customer."""
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return (orders.select(
        "o_custkey", "o_orderkey",
        F.sum(cents).over(w).alias("running_cents"))
        .orderBy("o_custkey", "o_orderkey"))


def moving_avg(events: DataFrame, frame: int = 9) -> DataFrame:
    """Trailing moving average of `value` per user over the last
    frame+1 events (ROWS frame). The value is integer-ized BEFORE the
    window and the mean is integer floor-division — a float avg over
    a sliding frame accumulates engine-specific FP order, so the
    oracle hash would diverge."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-frame, Window.currentRow))
    v_e6 = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    mavg = F.floor(F.sum(v_e6).over(w) / F.count("*").over(w)).cast("long")
    return (events.select("user_id", "event_id", mavg.alias("mavg_e6"))
            .orderBy("user_id", "event_id"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`. The
    classic lag+cumsum formulation — two window passes over ONE
    shuffle on user_id (both windows share partitioning+ordering, so
    Catalyst plans a single Exchange+Sort). Emits per-session
    aggregates. This is the batch form of a session window; the
    streaming form (applyInPandasWithState) lives in
    streaming/input_stream.py."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > gap_s),
        1).otherwise(0)
    sess = (events
            .withColumn("is_new", is_new)
            .withColumn("session_idx", F.sum("is_new").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    v_e6 = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.sum(v_e6).alias("sum_value_e6"))
            .orderBy("user_id", "session_idx"))


def rollup_revenue(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame) -> DataFrame:
    """ROLLUP(n_name, o_orderpriority) revenue report. rollup() is a
    single shuffle (Expand + partial agg map-side); dims broadcast."""
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    df = (orders
          .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                orders.o_custkey == F.col("c_custkey"))
          .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                F.col("c_nationkey") == F.col("n_nationkey")))
    return (df.rollup("n_name", "o_orderpriority")
            .agg(F.sum(cents).alias("revenue_cents"),
                 F.count("*").alias("n_orders"))
            .orderBy(F.col("n_name").asc_nulls_first(),
                     F.col("o_orderpriority").asc_nulls_first()))


def snapshot_diff(orders: DataFrame) -> DataFrame:
    """Set ops between two frontier snapshots (EXCEPT / INTERSECT):
    customers present only in the urgent slice, only in the large-
    price slice, or in both. Each set op is a shuffle on the full
    row — here a single int column, the cheapest possible key."""
    a = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_custkey"))
    b = (orders.filter(F.col("o_totalprice") > 150000)
         .select("o_custkey"))
    only_a = a.subtract(b).withColumn("side", F.lit("urgent_only"))
    only_b = b.subtract(a).withColumn("side", F.lit("big_only"))
    both = a.intersect(b).withColumn("side", F.lit("both"))
    return (only_a.unionByName(only_b).unionByName(both)
            .orderBy("side", "o_custkey"))


def asof_join(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: for each event, the latest order of the same
    customer with o_orderdate <= ts. Implemented as union+window —
    NOT an inequality join: a theta-join on (key, time <= time)
    explodes to |events|x|orders-per-key| rows before filtering,
    while the union+window form is one shuffle on the key and a
    linear scan per key (last_value with a running frame). This is
    the scale path for 10^10-row streams against SCD dims.

    Events with no prior order are kept with NULL order key
    (left-as-of semantics, matching DuckDB's ASOF LEFT JOIN). The
    right side is pre-deduped to one row per (key, time) — argmax by
    order key — because ties on the as-of time are otherwise
    engine-unspecified."""
    right_d = orders.groupBy(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t")).agg(
        F.max("o_orderkey").alias("o_orderkey_in"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice_in"))
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey_in"),
        F.lit(None).cast("double").alias("o_totalprice_in"))
    right = right_d.select(
        "k", "t", F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey_in", "o_totalprice_in")
    u = left.unionByName(right)
    # orders sort before events at the same timestamp (is_event asc):
    # an order dated exactly at the event ts IS visible to it
    w = (Window.partitionBy("k")
         .orderBy("t", "is_event",
                  F.coalesce("o_orderkey_in", F.lit(-1)), "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("last_ok", F.last("o_orderkey_in", ignorenulls=True)
                     .over(w))
    u = u.withColumn("last_op", F.last("o_totalprice_in", ignorenulls=True)
                     .over(w))
    price_cents = F.floor(F.col("last_op") * 100 + 0.5).cast("long")
    return (u.filter(F.col("is_event") == 1)
            .select(F.col("event_id"),
                    F.col("k").alias("user_id"),
                    F.col("last_ok").alias("asof_orderkey"),
                    price_cents.alias("asof_price_cents"))
            .orderBy("event_id"))


def exact_quantiles(df: DataFrame, col: str,
                    percentiles=(50, 90, 99)) -> DataFrame:
    """Exact distributed quantiles by counting — the corpus-quality
    dashboard wants true p50/p90/p99 of a bounded-domain metric
    (doc length, token count), and approx_percentile sketches are
    not cross-engine reproducible.

    Shape: compress rows to (value, count) with one hash shuffle
    (map-side partial agg), run the two-phase prefix sum over the
    value order (operators/sequence.py — the naive
    ``sum() OVER (ORDER BY value)`` would funnel the whole counts
    table through one task), then pick, per requested percentile,
    the smallest value whose cumulative count reaches the integer
    threshold ``(p*n + 99) div 100`` — ceil(p*n/100) in pure int64,
    identical in DuckDB. The counts table is O(distinct values),
    not O(rows); the percentile list is a constant broadcast.

    Returns (pctl int, value) ordered by pctl.
    """
    from ..operators.sequence import assign_group_cumsum
    counts = (df.select(F.col(col).alias("v"))
              .where(F.col("v").isNotNull())
              .groupBy("v").agg(F.count("*").alias("cnt"))
              .withColumn("_g", F.lit(0)))
    cum = assign_group_cumsum(counts, ["_g"], ["v"], "cnt", "cum")
    total = cum.agg(F.sum("cnt").alias("n"))
    spark = df.sparkSession
    pctl = spark.createDataFrame([(int(p),) for p in percentiles],
                                 "pctl int")
    return (cum.join(F.broadcast(total)).join(F.broadcast(pctl))
            .where(F.col("cum") >= F.expr("(pctl * n + 99) div 100"))
            .groupBy("pctl").agg(F.min("v").alias("value"))
            .orderBy("pctl"))
