"""Semantics checks for pipeline/analytics (the DuckDB oracle is the
cross-engine gate; these pin the intent on hand-built frames)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from larbin_spark.pipeline import analytics


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 12, m, s)


def test_sessionize_gap_splits(spark):
    events = spark.createDataFrame(
        [(1, _ts(0), 10, "a", 1.0, ""),
         (2, _ts(5), 10, "a", 1.0, ""),
         (3, _ts(50), 10, "a", 1.0, ""),   # 45-min gap -> new session
         (4, _ts(0), 20, "a", 1.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = {(r["user_id"], r["session_idx"]): r
           for r in analytics.sessionize(events, 30).collect()}
    assert out[(10, 1)]["n_events"] == 2
    assert out[(10, 2)]["n_events"] == 1
    assert out[(10, 2)]["first_event"] == 3
    assert out[(20, 1)]["n_events"] == 1


def test_asof_join_picks_latest_prior(spark):
    events = spark.createDataFrame(
        [(1, _ts(10), 7, "a", 0.0, ""), (2, _ts(1), 7, "a", 0.0, ""),
         (3, _ts(10), 8, "a", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    orders = spark.createDataFrame(
        [(100, 7, "O", 10.0, _ts(0), "1-URGENT"),
         (200, 7, "O", 20.0, _ts(5), "1-URGENT"),
         (300, 9, "O", 30.0, _ts(0), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    out = {r["event_id"]: r for r in
           analytics.asof_join(events, orders).collect()}
    assert out[1]["asof_orderkey"] == 200      # latest prior order
    assert out[2]["asof_orderkey"] == 100      # only the older one visible
    assert out[3]["asof_orderkey"] is None     # user 8 has no orders


def test_moving_avg_frame(spark):
    events = spark.createDataFrame(
        [(i, _ts(i), 1, "a", float(i), "") for i in range(1, 5)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = {r["event_id"]: r["mavg_e6"] for r in
           analytics.moving_avg(events, 1).collect()}  # 2-row frame
    assert out[1] == 1_000_000
    assert out[2] == 1_500_000
    assert out[3] == 2_500_000
    assert out[4] == 3_500_000


def test_rollup_has_grand_total(spark, ):
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.0, _ts(0), "1-URGENT"),
         (2, 1, "O", 30.0, _ts(0), "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    customer = spark.createDataFrame([(1, "c1", 5)],
                                     "c_custkey long, c_name string, "
                                     "c_nationkey long")
    nation = spark.createDataFrame([(5, "FRANCE", 1)],
                                   "n_nationkey long, n_name string, "
                                   "n_regionkey long")
    rows = analytics.rollup_revenue(orders, customer, nation).collect()
    grand = [r for r in rows if r["n_name"] is None
             and r["o_orderpriority"] is None]
    assert len(grand) == 1 and grand[0]["revenue_cents"] == 4000
    assert len(rows) == 4  # 2 leaves + nation subtotal + grand total


def test_connected_components_chain_and_island(spark):
    from larbin_spark.pipeline.dedup import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),       # chain -> one component, min 1
         (10, 11),                     # island pair
         (20, 21), (21, 20)],          # duplicate edge both ways
        "id_a long, id_b long")
    out = {r["node"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}
