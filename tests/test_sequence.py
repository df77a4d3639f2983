"""assign_global_seq vs a single-partition row_number oracle: the
two-phase distributed rank must reproduce the exact global sequence
for any input partitioning, including duplicate-free orders with
skewed key distributions and the empty frame."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from larbin_spark.operators.sequence import assign_global_seq


def _oracle(df, order_cols, out_col, base):
    w = Window.orderBy(*order_cols)
    return df.withColumn(
        out_col, F.row_number().over(w).cast("long") - 1 + F.lit(base))


def _check(spark, rows, base, parts):
    df = spark.createDataFrame(
        rows, "fetch_seq long, link_idx int, payload string"
    ).repartition(parts)
    got = (assign_global_seq(df, ["fetch_seq", "link_idx"], "qseq", base)
           .select("fetch_seq", "link_idx", "payload", "qseq"))
    want = (_oracle(df, ["fetch_seq", "link_idx"], "qseq", base)
            .select("fetch_seq", "link_idx", "payload", "qseq"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_matches_row_number_oracle(spark):
    rng = random.Random(7)
    rows = [(rng.randint(0, 50), i, f"p{i}") for i in range(2000)]
    # make (fetch_seq, link_idx) a unique total order
    rows = [(fs, i, p) for i, (fs, _i, p) in enumerate(rows)]
    _check(spark, rows, base=1234, parts=7)


def test_skewed_keys(spark):
    # 90% of rows share one fetch_seq (hot page with many links)
    rows = [(99, i, f"h{i}") for i in range(900)]
    rows += [(i % 7, 1000 + i, f"c{i}") for i in range(100)]
    _check(spark, rows, base=0, parts=5)


def test_empty(spark):
    df = spark.createDataFrame([], "fetch_seq long, link_idx int")
    out = assign_global_seq(df, ["fetch_seq", "link_idx"], "qseq", 10)
    assert out.count() == 0
    assert dict(out.dtypes)["qseq"] == "bigint"


def test_partitioning_invariance(spark):
    """The assigned sequence must be identical no matter how the input
    is partitioned (the determinism-under-parallelism property)."""
    rows = [(i // 3, i % 3, f"x{i}") for i in range(500)]
    outs = []
    for parts in (1, 3, 11):
        df = spark.createDataFrame(
            rows, "fetch_seq long, link_idx int, payload string"
        ).repartition(parts)
        out = assign_global_seq(df, ["fetch_seq", "link_idx"], "qseq", 7)
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] == outs[2]


def test_counts_out_piggyback(spark):
    """counts_out must report exact totals (and per-group counts with
    counts_by) from the SAME internal job, with identical sequence
    assignment — the round driver uses it to drop two eager actions."""
    rows = [(i // 3, i % 3, "disk" if i % 5 else "priority")
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "fetch_seq long, link_idx int, queue string")
    cnt = {}
    out = assign_global_seq(df, ["fetch_seq", "link_idx"], "qseq", 7,
                            counts_by=["queue"], counts_out=cnt)
    assert cnt["total"] == 500
    assert cnt["by"] == {"priority": 100, "disk": 400}
    # the sequence itself is unchanged by the grouped counts
    plain = assign_global_seq(df, ["fetch_seq", "link_idx"], "qseq", 7)
    assert (sorted(map(tuple, out.collect()))
            == sorted(map(tuple, plain.collect())))
    # empty input: total 0, empty by-map
    empty = spark.createDataFrame([], "fetch_seq long, link_idx int, "
                                      "queue string")
    cnt2 = {}
    assign_global_seq(empty, ["fetch_seq", "link_idx"], "qseq", 0,
                      counts_by=["queue"], counts_out=cnt2).count()
    assert cnt2 == {"total": 0, "by": {}}
