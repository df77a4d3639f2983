"""operators/membership: the broadcast seen-bitmap equals the table."""

import numpy as np
from pyspark.sql import functions as F

from larbin_spark.operators.membership import seen_bitmap, with_bitmap_hit


def test_bitmap_build_and_probe(spark):
    buckets = [0, 1, 7, 8, 63, 64, 1023, 999_983]
    seen = spark.createDataFrame([(b,) for b in buckets], "bucket long")
    bm = seen_bitmap(seen, 1_000_000)
    assert bm.dtype == np.uint8 and len(bm) == 125_000
    probe = spark.createDataFrame(
        [(b,) for b in range(0, 1030)] + [(999_983,), (999_982,)],
        "bucket long")
    hits = {r["bucket"] for r in
            with_bitmap_hit(probe, bm).filter("seen_hit").collect()}
    assert hits == set(buckets)


def test_empty_seen_bitmap(spark):
    seen = spark.createDataFrame([], "bucket long")
    bm = seen_bitmap(seen, 1024)
    assert bm.sum() == 0
    probe = spark.createDataFrame([(5,)], "bucket long")
    assert with_bitmap_hit(probe, bm).filter("seen_hit").count() == 0
