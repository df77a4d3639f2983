"""Per-row signature expressions (pipeline/rowsigs) must equal the
agg-based corpus-pass operators value-for-value — that equivalence is
what lets the crawl's inline curation stage replace a second corpus
scan with a fused projection. The cross-engine gate is the
text_rowsigs contract query; these tests pin Spark-vs-Spark
(expression form vs explode/groupBy form) on real sf0.001 documents
plus hand-built edge cases."""

import os

import pytest
from pyspark.sql import functions as F

from larbin_spark.pipeline import dedup, rowsigs, textstats

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no testdata at {SF_DIR}")
    return (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text").limit(200).cache())


def _edge_docs(spark):
    return spark.createDataFrame(
        [(1, "one two three four five"),
         (2, "one two"),            # < 3 tokens: no shingle
         (3, ""),                   # empty text -> one empty token
         (4, "a  b"),               # doubled space -> empty token
         (5, "one one one one")],   # repeated shingles
        "doc_id long, text string")


def test_simhash_expr_matches_agg(spark, docs):
    for frame in (docs, _edge_docs(spark)):
        per_row = {r["doc_id"]: r["sh"] for r in frame.select(
            "doc_id", rowsigs.simhash_expr().alias("sh")).collect()}
        agg = {r["doc_id"]: r["simhash"]
               for r in dedup.simhash60(frame).collect()}
        assert per_row == agg


def test_minhash_expr_matches_agg(spark, docs):
    for frame in (docs, _edge_docs(spark)):
        per_row = {r["doc_id"]: r["sig"] for r in frame.select(
            "doc_id",
            rowsigs.minhash_sigs_expr(F.col("text"), 16, 3).alias("sig"))
            .collect()}
        agg = {r["doc_id"]: [r[f"mh{i}"] for i in range(16)]
               for r in dedup.minhash_signatures(frame, 16, 3).collect()}
        for did, sig in per_row.items():
            if did in agg:
                assert sig == agg[did], did
            else:  # < k tokens: agg path emits no row, expr emits null
                assert sig is None, did


def test_fingerprint_and_quality_match(spark, docs):
    per_row = {r["doc_id"]: (r["fp"], r["q"], r["nt"]) for r in docs.select(
        "doc_id", rowsigs.fingerprint_expr().alias("fp"),
        rowsigs.quality_expr().alias("q"),
        rowsigs.ntokens_expr().alias("nt")).collect()}
    fp = {r["doc_id"]: r["fingerprint"]
          for r in textstats.fingerprints(docs).collect()}
    qs = {r["doc_id"]: (r["quality"], r["n_tokens"])
          for r in textstats.quality_score(docs).collect()}
    for did, (f_, q_, n_) in per_row.items():
        assert f_ == fp[did]
        assert (q_, n_) == qs[did]


def test_lang_pred_matches_lang_id(spark, docs):
    pl, ps = rowsigs.lang_pred_cols(F.col("text"))
    per_row = {r["doc_id"]: (r["pl"], r["ps"]) for r in docs.select(
        "doc_id", pl.alias("pl"), ps.alias("ps")).collect()}
    frame = docs.withColumn("lang", F.lit("en"))
    agg = {r["doc_id"]: (r["pred_lang"], r["pred_score"])
           for r in textstats.lang_id(frame).collect()}
    assert per_row == agg


def test_rowsigs_plan_has_no_shuffle(spark, docs):
    """The whole point: all signatures in ONE projection, zero
    Exchange in the plan."""
    plan = (docs.select("doc_id", *rowsigs.curation_cols(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_simhash_kernel_matches_expr(spark, docs):
    """The vectorized Arrow kernel (the crawl's inline-curation scale
    path) must be bit-equal to the expression form (the contract
    surface) — including empty/doubled-space/None edge cases and
    chunk boundaries."""
    import pandas as pd

    from larbin_spark.kernels.vectorized import simhash60_batch

    for frame in (docs, _edge_docs(spark)):
        rows = frame.select("doc_id", "text").collect()
        texts = pd.Series([r["text"] for r in rows])
        expr = {r["doc_id"]: r["sh"] for r in frame.select(
            "doc_id", rowsigs.simhash_expr().alias("sh")).collect()}
        for chunk in (7, 2048):
            got = simhash60_batch(texts, chunk_rows=chunk)
            for r, g in zip(rows, got):
                assert g == expr[r["doc_id"]], (chunk, r["doc_id"])
    # None text -> NA (expression form yields NULL)
    assert simhash60_batch(pd.Series([None], dtype=object))[0] is pd.NA
