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


def test_ngram_df_cap_bounds_hot_shingle(spark):
    """One shingle shared by every doc must not contribute pairs when
    df_cap is below the corpus size (stop-shingle removal), and the
    capped jaccard must still find the genuinely-similar pair."""
    from larbin_spark.pipeline.dedup import ngram_jaccard_pairs
    hot = "the quick fox"          # one 3-shingle in every doc
    docs = [("d%02d" % i, f"{hot} filler{i} a{i} b{i} c{i}")
            for i in range(20)]
    # d90/d91 share real content beyond the hot shingle
    docs += [("d90", f"{hot} same same same same x"),
             ("d91", f"{hot} same same same same y")]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    uncapped = ngram_jaccard_pairs(df, 3, 0.05, df_cap=None).collect()
    capped = ngram_jaccard_pairs(df, 3, 0.05, df_cap=10).collect()
    # uncapped: the hot shingle links every doc pair at tiny jaccard
    assert len(uncapped) > len(capped)
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert capped_pairs == {("d90", "d91")}


def test_embedding_neardup_bucketed_subset_of_exact(spark):
    """The LSH-bucketed near-dup pairs must be a subset of the exact
    brute-force pairs with identical cosines, and at a high threshold
    (near-identical vectors) recall must be total for this fixture."""
    import random
    from larbin_spark.pipeline.dedup import embedding_neardup_pairs
    rng = random.Random(3)
    rows = []
    for i in range(40):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    # 5 near-duplicates of vector 0 (tiny perturbation -> cos ~ 1)
    base = rows[0][1]
    for j in range(5):
        rows.append((100 + j,
                     [x + rng.gauss(0, 0.001) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r["id_a"], r["id_b"]): r["cos_r"]
             for r in embedding_neardup_pairs(df, 0.99, n_planes=None)
             .collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cos_r"]
           for r in embedding_neardup_pairs(df, 0.99, n_planes=4,
                                            n_bands=4).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # cos ~ 0.999998: banded candidate prob 1-(1-p^4)^4 ~ 1.0;
    # this fixture must hit 100% recall
    assert set(lsh) == set(exact)


def test_embedding_neardup_loose_threshold_recall(spark):
    """Characterize (pin) the LSH approximation at a LOOSE threshold,
    where banded 4x4 hyperplane LSH is intentionally partial: the
    DuckDB contract oracle inlines the identical LSH, so the
    cross-engine check alone proves both engines run the same
    approximation — THIS test pins the approximation itself against
    the exact brute-force oracle. Theory: candidate prob for a pair
    at angle theta is 1-(1-p^4)^4 with p = 1 - theta/pi; at cos 0.4
    (theta ~ 66.4deg) that is ~0.45, far below 1. Recall must sit in
    the theoretical band — high enough that the banding works, and
    STRICTLY below 1 so a silent switch to exact (or a vacuous
    fixture) fails this test."""
    import random
    from larbin_spark.pipeline.dedup import embedding_neardup_pairs
    rng = random.Random(7)
    rows = []
    # pairs with cosine concentrated JUST above the 0.4 threshold
    # (theta ~ 60-66deg, candidate prob ~0.45-0.55): the regime where
    # the approximation is visibly partial
    for i in range(80):
        base = [rng.gauss(0, 1) for _ in range(32)]
        rows.append((2 * i, base))
        mix = rng.uniform(0.45, 0.55)
        rows.append((2 * i + 1,
                     [mix * x + (1 - mix ** 2) ** 0.5 * rng.gauss(0, 1)
                      for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r["id_a"], r["id_b"])
             for r in embedding_neardup_pairs(df, 0.4, n_planes=None)
             .collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in embedding_neardup_pairs(df, 0.4, n_planes=4,
                                            n_bands=4).collect()}
    assert len(exact) >= 20, "fixture must produce a meaningful pair set"
    assert lsh <= exact            # candidates verified by exact cosine
    recall = len(lsh) / len(exact)
    # pinned characterization: approximate at loose thresholds — the
    # per-pair candidate probs average ~0.57 on this fixture; the
    # band has sampling slack but excludes both a broken LSH (~0) and
    # a silent switch to exact/all-pairs (1.0). This test caught a
    # real bug once: a hardcoded dim=64 against 32-dim vectors
    # NULL-ed the plane dots and collapsed every bucket (recall 1.0).
    assert 0.3 <= recall <= 0.85, f"recall {recall:.2f} out of band"


def test_minhash_xxhash64_variant(spark):
    """hash_fn='xxhash64' must behave like a MinHash: exact-duplicate
    docs collide in every band (always candidates), and candidates
    form a subset of doc pairs with valid ids. (Signatures differ
    from the md5 family by construction — only the md5 path has a
    DuckDB oracle.)"""
    from larbin_spark.pipeline.dedup import minhash_lsh_candidates
    docs = [("a1", "alpha beta gamma delta epsilon zeta"),
            ("a2", "alpha beta gamma delta epsilon zeta"),  # exact dup
            ("b1", "one two three four five six seven"),
            ("c1", "totally different words here indeed")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    for fn in ("md5", "xxhash64"):
        pairs = {(r["id_a"], r["id_b"]) for r in
                 minhash_lsh_candidates(df, 16, 4, 3, hash_fn=fn).collect()}
        assert ("a1", "a2") in pairs, fn
        assert all(a < b for a, b in pairs), fn


def test_ring_histogram_negative_epoch_cross_engine(spark, tmp_path):
    """Pin the division semantics: Spark `div` and DuckDB's integer
    `//` BOTH truncate toward zero (like the C integer division in
    the reference's histogram.cxx rings), so ring bucketing agrees
    across engines even for pre-1970 (negative epoch) timestamps."""
    import duckdb

    from larbin_spark.pipeline.relational import ring_histogram

    ts = [dt.datetime(1969, 12, 31, 23, 59, s) for s in (1, 3, 58)] \
        + [dt.datetime(1970, 1, 1, 0, 0, s) for s in (2, 5)]
    df = spark.createDataFrame([(t,) for t in ts], "ts timestamp_ntz")
    p = str(tmp_path / "neg_events.parquet")
    df.write.parquet(p)
    got = [(r.res, r.bucket, r.n)
           for r in ring_histogram(df, capacity=8).collect()]
    want = duckdb.connect().execute(f"""
WITH sec AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec
             FROM read_parquet('{p}/*.parquet')),
mx AS (SELECT max(sec) AS msec FROM sec),
binned AS (SELECT r.res, sec.sec // r.res AS bucket
           FROM sec, (VALUES (1), (60), (3600)) AS r(res))
SELECT b.res, b.bucket, count(*) AS n
FROM binned b, mx
WHERE b.bucket > mx.msec // b.res - 8
GROUP BY b.res, b.bucket ORDER BY res, bucket""").fetchall()
    assert got == [tuple(w) for w in want]
    # the pre-1970 seconds really are negative and really bucketed
    assert any(b < 0 for _res, b, _n in got)


def test_quantize_embeddings_hand_computed(spark):
    from larbin_spark.pipeline.ann import quantize_embeddings
    rows = [
        (1, [0.5, -1.0, 0.25]),   # exact at levels=4: zero error
        (2, [0.3, 1.0]),          # q=[1,2], |0.3-0.5| -> 2e8
        (3, [0.0, 0.0]),          # zero vector: guarded, all zero
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict()
           for r in quantize_embeddings(df, levels=4).collect()}
    assert out[1] == {"vec_id": 1, "n_dims": 3, "maxabs_e9": 1_000_000_000,
                      "qsum": 2 - 4 + 1, "err_e9_sum": 0}
    out2 = {r["vec_id"]: r.asDict()
            for r in quantize_embeddings(df, levels=2).collect()}
    assert out2[2]["qsum"] == 1 + 2
    assert out2[2]["err_e9_sum"] == 200_000_000
    assert out2[3] == {"vec_id": 3, "n_dims": 2, "maxabs_e9": 0,
                       "qsum": 0, "err_e9_sum": 0}


def test_quantize_embeddings_degenerate_inputs_match_duckdb(spark):
    """Empty vectors, all-NULL vectors, and NULL elements: Spark and
    the DuckDB oracle fragment must agree exactly (array_max -> NULL
    handled as degenerate; NULL elements skipped in the sums like
    DuckDB's list_sum)."""
    import duckdb
    from larbin_spark.pipeline.ann import quantize_embeddings
    rows = [(1, []), (2, [None, None]), (3, [0.5, None, -1.0]),
            (4, [0.25])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(tuple(r) for r in quantize_embeddings(df, 127).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, "
                "embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    import __spark_entry__ as em
    want = sorted(tuple(r) for r in
                  con.execute(em.oracle_sql()["ann_quantize"]).fetchall())
    assert got == want


def test_exact_quantiles_hand_computed(spark):
    """20 rows of value i+1 (n=20): threshold ceil(p*n/100) picks the
    ceil(p/5)-th value; duplicates and an empty-percentile edge are
    covered by the contract row at sf0.01."""
    df = spark.createDataFrame([(i % 4, i + 1) for i in range(20)],
                               "grp int, v long")
    out = {r.pctl: r.value
           for r in analytics.exact_quantiles(df, "v", (50, 90, 99, 100))
           .collect()}
    assert out == {50: 10, 90: 18, 99: 20, 100: 20}


def test_exact_quantiles_skips_nulls_and_duplicates(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (5,), (5,), (9,)], "v long")
    out = {r.pctl: r.value
           for r in analytics.exact_quantiles(df, "v", (50, 75, 100))
           .collect()}
    # n=4 non-null: ceil(2)=2 -> 5; ceil(3)=3 -> 5; ceil(4)=4 -> 9
    assert out == {50: 5, 75: 5, 100: 9}


def test_unigram_surprisal_integer_exact(spark):
    from larbin_spark.pipeline import textstats
    docs = spark.createDataFrame(
        [(1, "the the the rare"), (2, "the the"), (3, "")],
        "doc_id long, text string")
    rows = {r.doc_id: (r.surprisal_bits, r.n_tokens)
            for r in textstats.unigram_surprisal(docs).collect()}
    # corpus: the x5, rare x1, total 6 tokens -> bits(6)=3,
    # wt(the)=3-bits(5)=0, wt(rare)=3-bits(1)=2
    assert rows == {1: (2, 4), 2: (0, 2)}  # doc 3 (empty) drops out


def test_tfidf_keywords_integer_idf(spark):
    from larbin_spark.pipeline import textstats
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string")
    rows = [(r.doc_id, r.token, r.score, r.rnk)
            for r in textstats.tfidf_keywords(docs, 2).collect()]
    # N=2 docs with tokens, bits(2)=2; idf_bits: a=1, b=0, c=1
    # d1 scores: a=2*1, b=1*0; d2: c=1*1, b=1*0
    assert rows == [(1, "a", 2, 1), (1, "b", 0, 2),
                    (2, "c", 1, 1), (2, "b", 0, 2)]


def test_top_terms_rank_and_ties(spark):
    from larbin_spark.pipeline import textstats
    docs = spark.createDataFrame(
        [(1, "a a a b b c", "en"), (2, "b c c", "en"), (3, "x y", "fr")],
        "doc_id long, text string, lang string")
    rows = textstats.top_terms(docs, 2).collect()
    en = [(r.token, r.cnt, r.rnk) for r in rows if r.lang == "en"]
    fr = [(r.token, r.cnt, r.rnk) for r in rows if r.lang == "fr"]
    # en counts: a=3, b=3, c=3 -> tie broken by token asc: a then b
    assert en == [("a", 3, 1), ("b", 3, 2)]
    assert fr == [("x", 1, 1), ("y", 1, 2)]


def test_bigram_surprisal_boilerplate_scores_low(spark):
    # docs 0-3 repeat the same transition (a->b) so its conditional
    # count is high -> low bits; doc 9's transitions are unique ->
    # the context mass all sits on other continuations, high bits.
    from larbin_spark.pipeline.textstats import bigram_surprisal
    rows = [(i, "a b a b a b", "en") for i in range(4)]
    rows.append((9, "a x a y a z", "en"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    per_big_0 = out[0]["bigram_bits"] / out[0]["n_bigrams"]
    per_big_9 = out[9]["bigram_bits"] / out[9]["n_bigrams"]
    assert per_big_9 > per_big_0
    assert out[0]["n_bigrams"] == 5


def test_corpus_composition_projects_not_filters(spark):
    # a language OUTSIDE the pivot column set still counts toward
    # total_tokens; its own column simply doesn't exist. Missing
    # cells are 0, never NULL.
    from larbin_spark.pipeline.textstats import corpus_composition
    rows = [(0, "a b c", "en", "s0"), (1, "d e", "xx", "s0"),
            (2, "f", "de", "s1")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in corpus_composition(df).collect()}
    assert out["s0"]["total_tokens"] == 5      # includes the 'xx' doc
    assert out["s0"]["en_tokens"] == 3
    assert out["s0"]["de_tokens"] == 0         # 0, not NULL
    assert out["s1"]["de_tokens"] == 1
    assert "xx_tokens" not in out["s0"].asDict()
