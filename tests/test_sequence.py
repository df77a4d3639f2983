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


# ---------------- assign_group_cumsum ----------------

from larbin_spark.operators.sequence import assign_group_cumsum


def _cumsum_oracle(df, group_cols, order_cols, value_col, out_col):
    w = (Window.partitionBy(*group_cols).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, F.sum(value_col).over(w).cast("long"))


def _cumsum_check(spark, rows, parts):
    df = spark.createDataFrame(
        rows, "grp string, ord long, v long").repartition(parts)
    got = assign_group_cumsum(df, ["grp"], ["ord"], "v", "cum")
    want = _cumsum_oracle(df, ["grp"], ["ord"], "v", "cum")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_group_cumsum_matches_window_oracle(spark):
    rng = random.Random(11)
    rows = [(f"s{rng.randint(0, 4)}", i, rng.randint(1, 50))
            for i in range(2000)]
    _cumsum_check(spark, rows, parts=7)


def test_group_cumsum_one_giant_group(spark):
    # the skew case the two-phase scheme exists for: one group spans
    # every range partition, so the carry chain crosses all of them
    rows = [("hot", i, 3) for i in range(1500)]
    rows += [(f"cold{i}", 10**6 + i, 5) for i in range(20)]
    _cumsum_check(spark, rows, parts=9)


def test_group_cumsum_batch_carry(spark):
    """Force many small Arrow batches inside each partition so the
    carry-across-batches path (not just across partitions) runs."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        rows = [("a", i, 2) for i in range(400)]
        rows += [("b", i, 7) for i in range(300)]
        _cumsum_check(spark, rows, parts=3)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_group_cumsum_partitioning_invariance(spark):
    rows = [(f"g{i % 3}", i, (i * 7) % 13 + 1) for i in range(600)]
    outs = []
    for parts in (1, 4, 13):
        df = spark.createDataFrame(
            rows, "grp string, ord long, v long").repartition(parts)
        out = assign_group_cumsum(df, ["grp"], ["ord"], "v", "cum")
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] == outs[2]


def test_group_cumsum_empty(spark):
    df = spark.createDataFrame([], "grp string, ord long, v long")
    out = assign_group_cumsum(df, ["grp"], ["ord"], "v", "cum")
    assert out.count() == 0
    assert dict(out.dtypes)["cum"] == "bigint"
