"""operators/bloomfilter: the distributed k-hash Bloom pre-filter.

Pins the two properties the pre-filter's correctness argument rests
on (no false negatives; false positives exist so downstream code
cannot treat maybe_seen as exact) and the prefilter composition's
equivalence to a plain exact anti-join.
"""

from pyspark.sql import functions as F

from larbin_spark.operators import bloomfilter as bf

M_BITS, K = 2048, 3


def _urls(spark, n):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 53).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string"))
        .alias("url"),
        (F.col("id") % 3 == 0).alias("is_seen"))


def test_no_false_negatives_and_some_false_positives(spark):
    d = _urls(spark, 600)
    bm = bf.bloom_build(d.filter("is_seen").select("url"),
                        "url", M_BITS, K)
    rows = bf.bloom_probe(d, bm, "url", M_BITS, K).collect()
    # every inserted key MUST probe true (the pre-filter's soundness)
    assert all(r["maybe_seen"] for r in rows if r["is_seen"])
    fps = [r for r in rows if r["maybe_seen"] and not r["is_seen"]]
    # ~200 keys in 2048 bits at k=3 -> a few percent FP rate; zero
    # would make the maybe_seen!=exact distinction vacuous
    assert fps, "expected at least one false positive at m=2048"
    # and far from all unseen rows are FPs (the filter filters)
    assert len(fps) < 100


def test_positions_match_bitmap_probe(spark):
    """The JVM position expr and the numpy bitmap agree: a key probes
    true iff ALL its k positions are in the seen positions relation
    (the same equivalence the DuckDB oracle checks cross-engine)."""
    d = _urls(spark, 300)
    seen = d.filter("is_seen").select("url")
    bm = bf.bloom_build(seen, "url", M_BITS, K)
    probed = bf.bloom_probe(d, bm, "url", M_BITS, K)
    bits = {r["pos"] for r in
            bf.bloom_positions(seen, "url", M_BITS, K).collect()}
    got = probed.select(
        "url", "maybe_seen",
        bf.bloom_position_col(F.col("url"), M_BITS, K).alias("pos")
    ).collect()
    for r in got:
        assert r["maybe_seen"] == all(p in bits for p in r["pos"])


def test_prefilter_equals_plain_antijoin(spark):
    """bloom_prefilter's is_new must equal exact NOT-IN-seen for
    every candidate — FPs take the slow path, never flip the answer."""
    d = _urls(spark, 500)
    seen = d.filter("is_seen").select(F.col("url").alias("u"))
    out = bf.bloom_prefilter(d, seen, "url", "u", M_BITS, K)
    got = {r["url"]: r["is_new"] for r in out.collect()}
    assert len(got) == 500
    for r in d.collect():
        assert got[r["url"]] == (not r["is_seen"])


def test_probe_handles_empty_batch(spark):
    d = _urls(spark, 50)
    bm = bf.bloom_build(d.filter("is_seen").select("url"),
                        "url", M_BITS, K)
    empty = d.filter("url IS NULL")
    assert bf.bloom_probe(empty, bm, "url", M_BITS, K).count() == 0
