"""BPE merge induction (pipeline/bpe.py): hand-computed rounds,
greedy-fold semantics, and determinism of the tie-break."""

import pytest
from pyspark.sql import functions as F

from larbin_spark.pipeline.bpe import (
    bpe_merge_rounds, merge_pair_expr, top_pair, tokens_expr,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _tok(spark, toks_list):
    return spark.createDataFrame([(i, t) for i, t in enumerate(toks_list)],
                                 "doc_id long, toks array<string>")


def test_merge_fold_semantics(spark):
    rows = (_tok(spark, [["a", "b", "a", "b"],   # both pairs merge
                         ["a", "a", "b"],        # greedy: one merge
                         ["a", "b", "b"],        # no re-merge of 'ab'
                         ["x"], []])
            .select("doc_id",
                    merge_pair_expr(F.col("toks"), "a", "b").alias("m"))
            .collect())
    out = {r["doc_id"]: r["m"] for r in rows}
    assert out[0] == ["ab", "ab"]
    assert out[1] == ["a", "ab"]
    assert out[2] == ["ab", "b"]
    assert out[3] == ["x"] and out[4] == []


def _py_merge(toks, a, b):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_positional_rewrite_matches_reference_greedy(spark):
    # the O(n) positional form (a != b) must equal the reference
    # left-to-right greedy merge on every {a,b,c} sequence up to
    # length 6 (exhaustive) plus longer random mixes
    import itertools
    import random

    rows = []
    for n in range(7):
        rows.extend(list(c) for c in itertools.product("abc", repeat=n))
    rnd = random.Random(7)
    rows.extend([rnd.choice("abc") for _ in range(rnd.randint(7, 20))]
                for _ in range(100))
    df = _tok(spark, rows).select(
        "doc_id", merge_pair_expr(F.col("toks"), "a", "b").alias("m"))
    got = {r["doc_id"]: r["m"] for r in df.collect()}
    for i, t in enumerate(rows):
        assert got[i] == _py_merge(t, "a", "b"), (t, got[i])


def test_self_pair_uses_run_parity(spark):
    # a == b goes through the fold: greedy run parity
    rows = (_tok(spark, [["a", "a", "a"], ["a", "a", "a", "a"],
                         ["b", "a", "a", "b"]])
            .select("doc_id",
                    merge_pair_expr(F.col("toks"), "a", "a").alias("m"))
            .collect())
    out = {r["doc_id"]: r["m"] for r in rows}
    assert out[0] == ["aa", "a"]
    assert out[1] == ["aa", "aa"]
    assert out[2] == ["b", "aa", "b"]


def test_top_pair_count_and_tiebreak(spark):
    # (a,b) appears 3x; everything else once
    d = _docs(spark, ["a b a b c", "a a b"]).select(
        "doc_id", tokens_expr(F.col("text")).alias("toks"))
    assert top_pair(d) == ("a", "b", 3)
    # all counts tie at 1 -> lexicographically smallest pair wins
    d2 = _docs(spark, ["z y", "b a", "c d"]).select(
        "doc_id", tokens_expr(F.col("text")).alias("toks"))
    assert top_pair(d2) == ("b", "a", 1)


def test_three_rounds_hand_computed(spark):
    out = {r["doc_id"]: r for r in bpe_merge_rounds(
        _docs(spark, ["a b a b c", "a a b"]), k_rounds=3).collect()}
    r0, r1 = out[0], out[1]
    # round 1 merges (a,b) x3 -> [ab,ab,c] / [a,ab]
    assert (r0["m1"], r0["cnt1"]) == ("ab", 3)
    # round 2 ties at 1 -> (a,ab) wins lexicographically -> doc1 [aab]
    assert (r0["m2"], r0["cnt2"]) == ("aab", 1)
    # round 3: (ab,ab) beats (ab,c) lexicographically -> [abab, c]
    assert (r0["m3"], r0["cnt3"]) == ("abab", 1)
    assert (r0["n_tok0"], r0["n_tok3"]) == (5, 2)
    assert (r1["n_tok0"], r1["n_tok3"]) == (3, 1)


def test_tokenizer_drops_nonalnum_and_empty(spark):
    d = _docs(spark, ["Hello, WORLD!  42 --- "]).select(
        tokens_expr(F.col("text")).alias("toks"))
    assert d.collect()[0]["toks"] == ["hello", "world", "42"]


def test_partitioning_invariance(spark):
    # pair counts are integer hash-aggs and the rewrite is per-row,
    # so learned merges and final token counts must not depend on
    # the input partitioning
    import random
    rnd = random.Random(13)
    texts = [" ".join(rnd.choice(["a", "b", "c", "d"])
                      for _ in range(rnd.randint(0, 15)))
             for _ in range(150)]
    d1 = _docs(spark, texts).repartition(1)
    d2 = _docs(spark, texts).repartition(11)
    r1 = [r.asDict() for r in bpe_merge_rounds(d1, k_rounds=3).collect()]
    r2 = [r.asDict() for r in bpe_merge_rounds(d2, k_rounds=3).collect()]
    assert r1 == r2


def test_top_pair_raises_without_pairs(spark):
    d = _docs(spark, ["one", ""]).select(
        "doc_id", tokens_expr(F.col("text")).alias("toks"))
    with pytest.raises(ValueError):
        top_pair(d)
