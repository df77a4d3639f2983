"""Interleaved span-column profile: fixture shape, hand-computed
stats, and the ORDER-SENSITIVITY of the sequence fingerprint."""

import os

from larbin_spark.pipeline.spans import (
    pack_interleaved, spans_profile, spans_rows, write_spans_parquet,
)


def test_fixture_rows_cover_shapes():
    rows = spans_rows(96)
    lens = {len(spans) for _, spans in rows}
    assert lens == {1, 2, 3, 4, 5}
    kinds = {s["kind"] for _, spans in rows for s in spans}
    assert kinds == {"text", "image"}
    # media-first docs exist (doc 2 starts with an image)
    assert rows[2][1][0]["kind"] == "image"
    # all-text docs exist
    assert any(all(s["kind"] == "text" for s in spans)
               for _, spans in rows if len(spans) > 1)


def test_profile_hand_computed(spark, tmp_path):
    path = os.path.join(str(tmp_path), "spans.parquet")
    write_spans_parquet(path, 96)
    out = {r["doc_id"]: r
           for r in spans_profile(spark.read.parquet(path)).collect()}
    assert len(out) == 96
    # doc 0: one text span "t0w0"
    assert out[0]["n_spans"] == 1 and out[0]["n_media"] == 0
    assert out[0]["text_chars"] == 4 and out[0]["first_media"] is None
    # doc 2: image m://2/0, text t2w1, text t2w2
    assert out[2]["n_spans"] == 3 and out[2]["n_media"] == 1
    assert out[2]["text_chars"] == 8
    assert out[2]["first_media"] == "m://2/0"


def test_fingerprint_is_order_sensitive(spark):
    fwd = [{"kind": "text", "text": "a", "media_ref": None, "offset": 0},
           {"kind": "image", "text": None, "media_ref": "m", "offset": 1}]
    rev = list(reversed(fwd))
    schema = ("doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    df = spark.createDataFrame([(0, fwd), (1, rev)], schema)
    fps = {r["doc_id"]: r["span_fp"] for r in spans_profile(df).collect()}
    assert fps[0] != fps[1]


def test_pack_interleaved_matches_reference(spark, tmp_path):
    # full Python reference over the fixture: char-mass + 16/image
    # costs laid end-to-end and cut into 64-budget windows
    seq_len, img = 64, 16
    ref, off = {}, 0
    for i, spans in spans_rows(96):
        chars = sum(len(s["text"]) for s in spans if s["kind"] == "text")
        media = sum(1 for s in spans if s["kind"] == "image")
        cost = chars + img * media
        first = off // seq_len
        last = (off + max(cost, 1) - 1) // seq_len
        ref[i] = (chars, media, cost, off, first, last - first + 1)
        off += cost
    path = os.path.join(str(tmp_path), "p.parquet")
    write_spans_parquet(path, 96)
    got = {r["doc_id"]: (r["n_text_chars"], r["n_media"], r["cost"],
                         r["begin_off"], r["seq_id"], r["n_seqs"])
           for r in pack_interleaved(spark.read.parquet(path),
                                     seq_len, img).collect()}
    assert got == ref
    # docs that straddle a window boundary exist (n_seqs > 1)
    assert any(v[5] > 1 for v in ref.values())


def test_pack_zero_cost_doc_agrees_with_duckdb(spark):
    # a zero-cost doc (empty spans) at stream offset 0 makes the
    # last-window numerator -1 without the greatest(cost,1) clamp —
    # Spark `div` truncates (-1 div 64 = 0) while DuckDB `//` floors
    # (-1 // 64 = -1); with the clamp both engines agree the doc
    # occupies exactly its boundary window
    import duckdb
    schema = ("doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    rows = [(0, []),
            (1, [{"kind": "text", "text": "abcdef",
                  "media_ref": None, "offset": 0}]),
            (2, [])]
    out = {r["doc_id"]: r for r in pack_interleaved(
        spark.createDataFrame(rows, schema), 4, 16).collect()}
    assert (out[0]["cost"], out[0]["begin_off"],
            out[0]["seq_id"], out[0]["n_seqs"]) == (0, 0, 0, 1)
    assert (out[1]["cost"], out[1]["seq_id"], out[1]["n_seqs"]) \
        == (6, 0, 2)
    assert (out[2]["cost"], out[2]["begin_off"],
            out[2]["seq_id"], out[2]["n_seqs"]) == (0, 6, 1, 1)
    # the DuckDB-side formula on the same costs
    got = duckdb.connect().execute("""
      WITH c AS (SELECT * FROM (VALUES (0, 0), (1, 6), (2, 0))
                 t(doc_id, cost)),
      e AS (SELECT *, sum(cost) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - cost AS b FROM c)
      SELECT doc_id, b // 4,
             (b + greatest(cost, 1) - 1) // 4 - b // 4 + 1
      FROM e ORDER BY doc_id""").fetchall()
    for doc_id, seq_id, n_seqs in got:
        assert out[doc_id]["seq_id"] == seq_id
        assert out[doc_id]["n_seqs"] == n_seqs


def test_write_is_deterministic(tmp_path):
    p1 = os.path.join(str(tmp_path), "a.parquet")
    p2 = os.path.join(str(tmp_path), "b.parquet")
    write_spans_parquet(p1, 96)
    write_spans_parquet(p2, 96)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
