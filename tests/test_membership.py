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


def test_bitmap_broadcast_guard_scales_with_dup_gate():
    """The 2^33-bucket broadcast ceiling applies to hash_size always,
    but to dup_size only when the content-dup gate is on — the dup
    bitmap is never built otherwise (plans/round.py builds
    bitmaps['dup_seen'] inside the page_no_duplicate branch)."""
    import pytest

    from larbin_spark.config import CrawlConfig

    # dup gate off: a scale-out dup bucket space is fine
    CrawlConfig(seen_bitmap_broadcast=True, page_no_duplicate=False,
                hash_size=64_000_000, dup_size=1 << 40)
    # dup gate on: the same dup_size would ride a broadcast -> reject
    with pytest.raises(ValueError):
        CrawlConfig(seen_bitmap_broadcast=True, page_no_duplicate=True,
                    hash_size=64_000_000, dup_size=1 << 40)
    # hash_size constrains the URL-seen bitmap unconditionally
    with pytest.raises(ValueError):
        CrawlConfig(seen_bitmap_broadcast=True, hash_size=1 << 40)
    # no broadcast -> no ceiling (range-sharded join path)
    CrawlConfig(seen_bitmap_broadcast=False, hash_size=1 << 40,
                dup_size=1 << 40, page_no_duplicate=True)
