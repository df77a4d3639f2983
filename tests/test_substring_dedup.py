"""Semantics checks for pipeline/dedup.substring_dedup (duplicated-
k-gram removal, Lee et al. 2022 arXiv:2107.06499 at k-gram
granularity). The DuckDB oracle (`dedup_substring`) is the
cross-engine gate; these pin the intent on hand-built corpora."""

from larbin_spark.pipeline.dedup import substring_dedup


def _run(spark, docs, k=3):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {r["doc_id"]: r for r in substring_dedup(df, k).collect()}


def test_cross_doc_duplicate_keeps_canonical_occurrence(spark):
    # "x y z" appears in both docs; dA:pos2 is canonical (dA < dB),
    # so dB loses exactly the 3 covered tokens
    out = _run(spark, [("dA", "a x y z b"), ("dB", "p x y z q")])
    assert out["dA"]["n_removed"] == 0
    assert out["dA"]["kept_text"] == "a x y z b"
    assert out["dB"]["n_removed"] == 3
    assert out["dB"]["kept_text"] == "p q"


def test_short_docs_untouched(spark):
    # below k tokens -> no k-grams, nothing removed, text intact
    out = _run(spark, [("d1", "a b"), ("d2", "a b")])
    assert out["d1"]["n_removed"] == 0 and out["d1"]["kept_text"] == "a b"
    assert out["d2"]["n_removed"] == 0 and out["d2"]["kept_text"] == "a b"


def test_self_repeat_within_doc(spark):
    # "x y z" occurs twice inside ONE doc: the first occurrence
    # (pos 1) is canonical, the second (pos 5) is scrubbed
    out = _run(spark, [("d1", "x y z q x y z")])
    assert out["d1"]["n_removed"] == 3
    assert out["d1"]["kept_text"] == "x y z q"


def test_overlapping_duplicates_remove_union_of_cover(spark):
    # dB repeats dA's "a b c d" -> duplicated 3-grams (a b c) at
    # dB:1 and (b c d) at dB:2 overlap; removed tokens are the
    # union {1..4}, not double-counted
    out = _run(spark, [("dA", "a b c d"), ("dB", "a b c d e")])
    assert out["dB"]["n_removed"] == 4
    assert out["dB"]["kept_text"] == "e"
    assert out["dA"]["n_removed"] == 0


def test_canonical_is_min_sortable_key_not_input_order(spark):
    # canonical = min(doc_id, zero-padded pos): dA:pos7 beats dB:pos1
    # because doc_id sorts first
    out = _run(spark, [("dB", "x y z p q"), ("dA", "m n o r s t x y z")])
    assert out["dA"]["n_removed"] == 0
    assert out["dB"]["n_removed"] == 3
    assert out["dB"]["kept_text"] == "p q"
