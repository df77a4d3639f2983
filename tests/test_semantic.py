"""SemDeDup (pipeline/semantic.py): constructed clusters, dup
pruning semantics, and the lowest-id-representative convention."""

from pyspark.sql import functions as F

from larbin_spark.pipeline.semantic import (
    kmeans_assignments, pq_codes, prototype_prune, semantic_dedup,
)

SCHEMA = "vec_id long, embedding array<float>"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _two_cluster_rows():
    # two obvious cosine clusters around e0 and e1; vec 2/3 are
    # near-dups of the seeds, vec 4 is same-cluster but far
    return [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.02, 0.0]),
        (4, [0.7, 0.0, 0.7, 0.0]),
    ]


def test_kmeans_groups_obvious_clusters(spark):
    out = kmeans_assignments(_df(spark, _two_cluster_rows()),
                             k=2, iters=2).collect()
    cl = {r["vec_id"]: r["cluster"] for r in out}
    assert cl[0] == cl[2] == cl[4]
    assert cl[1] == cl[3]
    assert cl[0] != cl[1]


def test_semantic_dedup_prunes_within_cluster(spark):
    out = {r["vec_id"]: r for r in semantic_dedup(
        _df(spark, _two_cluster_rows()), k=2, iters=2,
        threshold=0.9).collect()}
    assert len(out) == 5
    # seeds are the lowest-id representatives -> kept
    assert out[0]["keep"] and out[1]["keep"]
    # near-dups of a lower-id cluster-mate -> dropped
    assert not out[2]["keep"] and not out[3]["keep"]
    # same cluster but cos(0,4) ~= 0.707 < 0.9 -> kept
    assert out[4]["keep"]


def test_threshold_one_epsilon_keeps_everything(spark):
    # nothing reaches cosine 1.0+eps, so no vector is pruned
    out = semantic_dedup(_df(spark, _two_cluster_rows()), k=2,
                         iters=2, threshold=1.000001)
    assert out.filter(~F.col("keep")).count() == 0


def test_empty_cluster_drops_out(spark):
    # k=3 on 2-cluster data: one centroid loses all points after the
    # first reassignment; the result still covers every vector
    rows = _two_cluster_rows() + [(5, [0.98, 0.02, 0.0, 0.0])]
    out = semantic_dedup(_df(spark, rows), k=3, iters=2,
                         threshold=0.9).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1, 2, 3, 4, 5]
    assert all(r["keep"] in (True, False) for r in out)


def test_prototype_prune_drops_most_prototypical(spark):
    # cluster around e0 with one far member: vec 0/2 are closest to
    # the centroid, vec 4 is the diverse tail; prune_frac=0.4 on a
    # 3-member cluster drops floor(3*0.4)=1 -> exactly the single
    # most prototypical member goes
    out = {r["vec_id"]: r for r in prototype_prune(
        _df(spark, _two_cluster_rows()), k=2, iters=2,
        prune_frac=0.4).collect()}
    assert len(out) == 5
    a = [v for v in out.values() if v["cluster"] == out[0]["cluster"]]
    dropped = [v["vec_id"] for v in a if not v["keep"]]
    assert len(dropped) == 1
    # the diverse far member is never the one dropped
    assert dropped != [4]
    # scores are ordered: cos_c(dropped) is the cluster max
    assert max(v["cos_c"] for v in a) == out[dropped[0]]["cos_c"]


def test_prototype_prune_frac_zero_keeps_all(spark):
    out = prototype_prune(_df(spark, _two_cluster_rows()), k=2,
                          iters=1, prune_frac=0.0)
    assert out.filter(~F.col("keep")).count() == 0


def test_partitioning_invariance(spark):
    # centroid sums are exact integers and the assignment is a
    # per-row fold, so results must be bit-identical under any input
    # partitioning (partial-agg fold order changes, values don't)
    import random
    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)])
            for i in range(120)]
    a = semantic_dedup(_df(spark, rows).repartition(1), k=4, iters=2)
    b = semantic_dedup(_df(spark, rows).repartition(13), k=4, iters=2)
    assert [r.asDict() for r in a.collect()] == \
           [r.asDict() for r in b.collect()]


def test_plan_broadcasts_centroids_not_points(spark):
    # the O(N*k) assignment must broadcast the k-row centroid side;
    # the assignment join sits behind the lazy checkpoint, so inspect
    # the registered pre-checkpoint probe (the audited surface)
    from larbin_spark.operators.sequence import PLAN_PROBE
    semantic_dedup(_df(spark, _two_cluster_rows()), k=2, iters=1)
    probe = PLAN_PROBE["kmeans:assigned"]
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # and the lineage is truncated: the probe's plan reads the
    # checkpointed k-row centroids, not a nested Lloyd chain
    assert "ExistingRDD" in plan


def test_pq_codes_shape_and_subspace_independence(spark):
    # 4-dim vectors, m=2 subspaces of 2 dims: rows engineered so the
    # two subspaces cluster DIFFERENTLY — PQ must quantize each
    # independently (codes differ across subspaces for vec 2)
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.0, 1.0, 1.0, 0.0]),
        (2, [0.99, 0.01, 0.98, 0.02]),  # sub0 ~ vec0, sub1 ~ vec1
        (3, [0.0, 0.97, 0.01, 0.99]),   # sub0 ~ vec1, sub1 ~ vec0
    ]
    out = pq_codes(_df(spark, rows), m=2, k=2, iters=1)
    got = {(r.vec_id, r.subspace): r.code for r in out.collect()}
    assert len(got) == 8  # one code per (vector, subspace)
    assert all(0 <= c <= 1 for c in got.values())
    assert got[(2, 0)] == got[(0, 0)] and got[(2, 1)] == got[(1, 1)]
    assert got[(3, 0)] == got[(1, 0)] and got[(3, 1)] == got[(0, 1)]


def test_pq_codes_rejects_indivisible_dim(spark):
    import pytest
    with pytest.raises(ValueError):
        pq_codes(_df(spark, [(0, [1.0, 0.0, 0.0])]), m=2)


def test_pq_blocked_neardup_blocks_and_verifies(spark):
    # two near-identical vectors (same cell, cosine ~1) must pair;
    # an orthogonal one must not, even if it shares a cell with
    # nothing; pairs are lower-id-first and cosine-verified
    import math
    from larbin_spark.pipeline.semantic import pq_blocked_neardup
    dim = 8
    base = [1.0, 0.2, -0.3, 0.5, 0.1, -0.2, 0.4, 0.9]
    near = [v * 1.01 for v in base]
    orth = [-base[1], base[0], -base[3], base[2],
            -base[5], base[4], -base[7], base[6]]
    # (zero vectors are outside the embedding domain — the shared
    # cosine, like every ann/semantic op, assumes nonzero norms)
    rows = [(0, base), (1, near), (2, orth), (3, [0.1] * dim)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    out = pq_blocked_neardup(emb, m=2, k=2, iters=1,
                             threshold=0.9).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in out}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)
    for r in out:
        assert r["cos"] >= 0.9
        assert ":" in r["cell"]  # m=2 -> two codes in the key
    assert not any(2 in p for p in pairs)
