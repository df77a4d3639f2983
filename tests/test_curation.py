"""Intent-level tests for the curation operators (the contract
parity test in test_entry_contract.py covers engine agreement; these
pin the SEMANTICS on constructed inputs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from larbin_spark.pipeline import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_shared_shingles(spark):
    # doc 0 is the eval doc (0 % 97 == 0); doc 1 copies one of its
    # 3-gram windows, doc 2 shares no shingle.
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "zz alpha beta gamma yy", "en"),
        (2, "one two three four five", "en"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in curation.decontaminate(_docs(spark, rows)).collect()}
    assert set(out) == {1}
    # doc 1's shingles: {zz alpha beta, alpha beta gamma, beta gamma yy}
    # overlap with eval: {alpha beta gamma} -> 1 of 3
    assert out[1]["n_overlap"] == 1
    assert out[1]["n_shingles"] == 3
    assert abs(out[1]["contam_frac"] - round(1 / 3, 6)) < 1e-9


def test_decontaminate_eval_docs_never_reported(spark):
    rows = [(0, "a b c d", "en"), (97, "a b c d", "en"),
            (5, "a b c d", "en")]
    ids = [r["doc_id"]
           for r in curation.decontaminate(_docs(spark, rows)).collect()]
    # 0 and 97 are eval-side; only training doc 5 can be flagged
    assert ids == [5]


def test_stratified_sample_deterministic_and_gated(spark):
    rows = [(i, f"text {i}", lang)
            for i, lang in enumerate(["en", "de", "fr", "es", "zh"] * 40)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in curation.stratified_sample(df).collect())
    b = sorted(r["doc_id"] for r in curation.stratified_sample(df).collect())
    assert a == b and len(a) > 0
    # unknown language samples at rate 0
    unk = _docs(spark, [(1, "x y", "xx"), (2, "x y", "yy")])
    assert curation.stratified_sample(unk).count() == 0
    # custom rates: 1000 keeps everything, 0 drops everything
    assert curation.stratified_sample(
        df, {"en": 1000}).count() == 40
    assert curation.stratified_sample(df, {"en": 0}).count() == 0


def test_repetition_stats_degenerate_vs_diverse(spark):
    rows = [
        (1, "spam spam spam spam spam", "en"),   # 4 identical bigrams
        (2, "a b c d e", "en"),                  # all bigrams distinct
        (3, "solo", "en"),                       # no bigrams -> excluded
    ]
    out = {r["doc_id"]: r.asDict()
           for r in curation.repetition_stats(_docs(spark, rows)).collect()}
    assert set(out) == {1, 2}
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_token_frac"] == 0.8      # 1 distinct of 5
    assert out[2]["top_bigram_frac"] == 0.25    # 1 of 4 bigrams
    assert out[2]["dup_token_frac"] == 0.0


def test_pack_sequences_offsets_and_spans(spark):
    # stream: doc1 [0,3) doc2 [3,8) doc3 [8,10); seq_len=7 cuts at 7
    rows = [(1, "a b c", "s"), (2, "d e f g h", "s"), (3, "i j", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.pack_sequences(df, 7).collect()}
    assert out[1] == {"doc_id": 1, "n_tokens": 3, "begin_off": 0,
                      "seq_id": 0, "n_seqs": 1}
    # doc2 starts in seq 0 (offset 3) and its last token (offset 7)
    # lands in seq 1 -> spans 2 sequences
    assert out[2] == {"doc_id": 2, "n_tokens": 5, "begin_off": 3,
                      "seq_id": 0, "n_seqs": 2}
    assert out[3] == {"doc_id": 3, "n_tokens": 2, "begin_off": 8,
                      "seq_id": 1, "n_seqs": 1}


def test_pack_sequences_long_doc_spans_many(spark):
    rows = [(1, " ".join(["w"] * 20), "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.pack_sequences(df, 7).collect()[0]
    assert (out["begin_off"], out["seq_id"], out["n_seqs"]) == (0, 0, 3)


def test_budget_pack_greedy_by_quality(spark):
    # src1: high-quality 50-token doc packs first; the next doc would
    # blow the 55-token budget and is cut. src2 packs independently.
    hi = " ".join(["the and of to in"] * 10)          # 50 tok, stopword-rich
    lo = " ".join(["zz"] * 10)                        # 10 tok, no stopwords
    rows = [(1, hi, "src1"), (2, lo, "src1"), (3, lo, "src2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.budget_pack(df, 55).collect()}
    assert set(out) == {1, 3}
    assert out[1]["cum_tokens"] == 50
    assert out[3]["cum_tokens"] == 10

def test_decontaminate_k_is_honored(spark):
    # with k=4 the only shared window is the full 4-gram of doc 0;
    # doc 1 shares 3 words but never 4 in a row -> clean at k=4,
    # flagged at k=3 (the regression: _shingles used to hardcode 3)
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "zz alpha beta gamma yy", "en"),
        (97, "p alpha beta gamma delta q", "en"),   # eval side too
        (5, "x alpha beta gamma delta y", "en"),    # shares the 4-gram
    ]
    df = _docs(spark, rows)
    at3 = {r["doc_id"] for r in curation.decontaminate(df, k=3).collect()}
    at4 = {r["doc_id"] for r in curation.decontaminate(df, k=4).collect()}
    assert at3 == {1, 5}
    assert at4 == {5}


def test_group_cumsum_nulls_fail_loud(spark):
    from larbin_spark.operators.sequence import assign_group_cumsum
    import pyspark
    df = spark.createDataFrame(
        [("a", 1, 5), (None, 2, 5)], "grp string, ord long, v long")
    try:
        assign_group_cumsum(df, ["grp"], ["ord"], "v", "cum").collect()
        raise AssertionError("expected the NULL-group guard to raise")
    except pyspark.errors.exceptions.captured.PythonException as e:
        assert "NULL in column 'grp'" in str(e)

def test_curate_mix_every_gate(spark):
    clean = "the quick brown fox jumps over one lazy dog today"  # 10 tok
    rows = [
        (0, "alpha beta gamma delta epsilon", "s1"),   # eval doc (0 % 97)
        (1, clean, "s1"),                              # kept
        (2, clean, "s1"),                              # exact dup of 1 -> dropped
        (3, "zz alpha beta gamma yy qq ww", "s1"),     # contaminated -> dropped
        (4, "spam spam spam spam spam spam", "s1"),    # degenerate -> dropped
        (5, "many different words make a decent doc here", "s2"),  # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.curate_mix(df, budget_tokens=100).collect()}
    assert set(out) == {1, 5}
    assert out[1]["n_tokens"] == 10 and out[1]["cum_tokens"] == 10
    assert out[5]["source"] == "s2"


def test_pii_scrub_semantics(spark):
    rows = [
        (1, "mail a.b-c_d%e+f@sub.example.org now"),
        (2, "server at 192.168.0.1 and 999.999.999.999 edge"),
        (3, "call 555 0123 4567 or 5550123456789012345 toolong"),
        (4, "clean text with no pii at all"),
        (5, "overlap 12.34.56.78 phone 12 34 56 78 90"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.pii_scrub(df).collect()}
    assert out[1]["n_email"] == 1
    assert out[1]["text_scrubbed"] == "mail <EMAIL> now"
    # the ipv4 pattern is shape-only (no range validation): both
    # dotted quads count, matching the oracle regex exactly
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_scrubbed"] == "server at <IPV4> and <IPV4> edge"
    # 11 digits with single-space separators match; the 19-digit run
    # exceeds the 15-digit cap and (having no interior word
    # boundary) matches nowhere
    assert out[3]["n_phone"] == 1
    assert out[3]["text_scrubbed"] == "call <PHONE> or 5550123456789012345 toolong"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert out[4]["text_scrubbed"] == rows[3][1]
    # dots break phone runs, so the ip and the phone don't collide
    assert (out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1)
    assert out[5]["text_scrubbed"] == "overlap <IPV4> phone <PHONE>"


def test_pii_scrub_counts_are_order_free(spark):
    # counts are over the ORIGINAL text per category, while the
    # replacement is sequential email -> ipv4 -> phone: the digit
    # run inside the email counts as a phone (space before, '@'
    # after are both boundaries) but is already redacted by the
    # email pass in the scrubbed text
    df = spark.createDataFrame(
        [(1, "call 12345678 or mail 12345678@example.com")],
        "doc_id long, text string")
    r = curation.pii_scrub(df).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 2
    assert r["text_scrubbed"] == "call <PHONE> or mail <EMAIL>"


def test_curate_mix_budget_still_cuts(spark):
    # two clean docs in one source; tiny budget keeps only the better
    # hi: 50 tokens, every other one a stopword, rest unique -> high
    # quality but dup_token_frac 0.4 (passes the repetition gate)
    stops = ["the", "and", "of", "to", "in"]
    hi = " ".join(f"{stops[i % 5]} u{i}" for i in range(25))
    lo = "just some plain words without common stopwords visible"
    rows = [(1, hi, "s"), (2, lo, "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    ids = {r["doc_id"] for r in
           curation.curate_mix(df, budget_tokens=55).collect()}
    assert ids == {1}


def test_training_shuffle_is_the_md5_permutation(spark):
    import hashlib
    n = 40
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {r["doc_id"]: r["shuffle_pos"]
           for r in curation.training_shuffle(df, "epochX").collect()}
    order = sorted(range(n), key=lambda i: (
        hashlib.md5(f"epochX:{i}".encode()).hexdigest(), i))
    want = {doc: pos for pos, doc in enumerate(order)}
    assert got == want
    # a different salt is an independent permutation (and still a
    # complete one)
    got2 = {r["doc_id"]: r["shuffle_pos"]
            for r in curation.training_shuffle(df, "epochY").collect()}
    assert sorted(got2.values()) == list(range(n))
    assert got2 != got


def test_pii_regex_cross_engine_fuzz(spark):
    """Java (Spark) vs RE2 (DuckDB) agreement on the PII regexes over
    adversarial strings: digit runs of every length, dotted quads,
    separators, '@' clusters — the contract corpus has no natural
    digits, so this pins the engine-portability claim where it could
    actually break."""
    import random
    import duckdb
    rng = random.Random(42)
    atoms = ["1", "23", "456", "7890", "12345678", "123456789012345",
             "1234567890123456", ".", " ", "-", "--", "@", "a", "bc",
             "x9", "%", "+", "_", "example.com", "a@b.cd", "10.0.0.1",
             "999.1.2.3", "1.2.3.4.5", "55 66 77 88", "1-2-3-4-5-6-7-8"]
    texts = ["".join(rng.choice(atoms) for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"],
                         r["text_scrubbed"])
           for r in curation.pii_scrub(df).collect()}
    pats = dict(curation.PII_PATTERNS)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{pats["email"]}')) AS INT),
               CAST(len(regexp_extract_all(text, '{pats["ipv4"]}')) AS INT),
               CAST(len(regexp_extract_all(text, '{pats["phone"]}')) AS INT),
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{pats["email"]}', '<EMAIL>', 'g'),
                   '{pats["ipv4"]}', '<IPV4>', 'g'),
                   '{pats["phone"]}', '<PHONE>', 'g')
        FROM t""").fetchall()}
    assert got == want


def test_dsir_weights_prefer_target_like_docs(spark):
    # target slice = lang 'en'. doc 10 repeats the en vocabulary, so
    # its buckets are dense in the target distribution; doc 11 uses
    # vocabulary only it (a 'de' doc) contains, so its buckets have
    # ct = 0 and every gram is charged the full raw penalty. The
    # en-like doc must outscore the off-target doc per gram.
    rows = [
        (0, "alpha beta gamma alpha beta", "en"),
        (1, "alpha beta gamma delta", "en"),
        (10, "alpha beta gamma alpha", "de"),
        (11, "zeta eta theta iota", "de"),
    ]
    out = {r["doc_id"]: r for r in
           curation.dsir_weights(_docs(spark, rows), 1024, "en").collect()}
    per_gram_10 = out[10]["dsir_bits"] / out[10]["n_grams"]
    per_gram_11 = out[11]["dsir_bits"] / out[11]["n_grams"]
    assert per_gram_10 > per_gram_11
    # n_grams = unigrams + adjacent bigrams
    assert out[0]["n_grams"] == 5 + 4


def test_dsir_weights_empty_target_is_defined(spark):
    # no doc carries the target lang: ct = 0 everywhere, tot_t = 0 —
    # bits(0) = 1 on both engines, so the score is defined (all-raw
    # penalty), not a crash or NULL
    rows = [(0, "a b c", "de"), (1, "c d", "fr")]
    out = curation.dsir_weights(_docs(spark, rows), 64, "en").collect()
    assert len(out) == 2
    assert all(r["dsir_bits"] is not None for r in out)


def test_temperature_mix_upsamples_low_resource(spark):
    # lang 'big' has 100x the token mass of 'small'; sqrt weighting
    # must give 'small' MORE than its proportional share of the
    # budget and 'big' less.
    rows = ([(i, " ".join(["w"] * 400), "big") for i in range(100)]
            + [(1000, " ".join(["w"] * 400), "small")])
    out = {r["lang"]: r for r in
           curation.temperature_mix(_docs(spark, rows), 110_000).collect()}
    assert out["big"]["n_tokens"] == 100 * out["small"]["n_tokens"]
    prop_small = 110_000 * 1 / 101          # proportional share
    assert out["small"]["alloc_tokens"] > prop_small
    assert (out["big"]["alloc_tokens"]
            < 110_000 * 100 / 101)
    # integer construction: weight = floor(sqrt(mass)), exact
    assert out["big"]["weight"] == 200     # sqrt(40000)
    assert out["small"]["weight"] == 20    # sqrt(400)


def test_gram_stream_matches_python_reference(spark):
    # property: the zero-shuffle HOF gram construction (unigrams +
    # adjacent bigrams AFTER empty-token filtering) must equal the
    # obvious Python construction for awkward token layouts —
    # leading/trailing/double spaces, single tokens, empty text.
    texts = ["a b c", "", " ", "x", "  a", "b  ", "a  b", "q w e r",
             "a a a", " a b ", "  ", "lone"]
    rows = [(i, t, "en") for i, t in enumerate(texts)]
    from pyspark.sql import functions as F
    out = (spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
           .select("doc_id", curation._ws_expr().alias("_ws"))
           .select("doc_id", curation._grams_expr().alias("grams"))
           .collect())
    got = {r["doc_id"]: list(r["grams"]) for r in out}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w != ""]
        expect = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        assert got[i] == expect, (t, got[i], expect)


def test_temperature_mix_allocation_bounds(spark):
    # sum of integer allocations never exceeds the budget, and each
    # allocation is within one truncation step of the real share
    rows = [(i, " ".join(["w"] * (10 + 37 * (i % 5))),
             f"l{i % 4}") for i in range(40)]
    budget = 99_991
    out = curation.temperature_mix(_docs(spark, rows), budget).collect()
    total_w = sum(r["weight"] for r in out)
    assert sum(r["alloc_tokens"] for r in out) <= budget
    for r in out:
        exact = r["weight"] * budget / total_w
        assert exact - 1 < r["alloc_tokens"] <= exact
