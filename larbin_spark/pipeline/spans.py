"""Interleaved text+media span-column operators.

The north-star input model is a table of interleaved documents:
``(doc_id, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>)`` — the shape the crawl emits
(fixtures/webgen.py; reference parse: file.cxx:597-798 produces
exactly this alternation of text runs and media refs) and the per-row
invariant the parity suite pins (span-sequence equality on
kind/text/media_ref/order). This module gives the span column a
direct cross-engine contract surface:

- a deterministic spans fixture written with an explicit pyarrow
  schema — the same session-config-free atomic handoff as the media
  fixture (multimodal.write_media_parquet), so the DuckDB oracle
  reads the identical rows;
- ``spans_profile``: per-document span statistics computed entirely
  with JVM higher-order functions (filter/transform/aggregate) — no
  Python stage, no explode, no shuffle beyond the presentation sort.
  The ``span_fp`` fingerprint is ORDER-SENSITIVE (md5 over the
  joined kind:text:media_ref:offset sequence), i.e. the per-row
  span-sequence-equality invariant as a hashable column.

Scale shape: everything is a per-row map over the spans array —
fused into whatever scan carries it, embarrassingly parallel at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spans_rows(n: int = 96):
    """Deterministic interleaved span rows: doc i carries (i % 5) + 1
    spans; span j is an image ref when (i + j) % 3 == 2, else a text
    run. Covers 1..5-span docs, media-first/media-last orders,
    all-text docs, and empty-text never (the reference never emits
    empty runs)."""
    rows = []
    for i in range(n):
        spans = []
        for j in range(i % 5 + 1):
            if (i + j) % 3 == 2:
                spans.append({"kind": "image", "text": None,
                              "media_ref": f"m://{i}/{j}", "offset": j})
            else:
                spans.append({"kind": "text", "text": f"t{i}w{j}",
                              "media_ref": None, "offset": j})
        rows.append((i, spans))
    return rows


def write_spans_parquet(path: str, n: int = 96) -> None:
    """ONE parquet file from `spans_rows` with an explicit pyarrow
    schema — never via Spark/pandas round-trips (struct columns would
    need the session's arrow config; see write_media_parquet on the
    r3 regression class). Atomic tmp + os.replace."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = spans_rows(n)
    schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("spans", pa.list_(pa.struct([
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]))),
    ])
    table = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows],
         "spans": [r[1] for r in rows]},
        schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # pid-unique tmp: two concurrent writers (contract run + pytest)
    # must never share a tmp inode mid-write (multimodal's pattern)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def text_spans_expr(spans_col: str = "spans"):
    """The text spans of the interleaved array (shared by the
    profile and the packer — one definition of 'text span')."""
    return F.filter(spans_col, lambda s: s["kind"] == F.lit("text"))


def media_spans_expr(spans_col: str = "spans"):
    """The image/media spans of the interleaved array."""
    return F.filter(spans_col, lambda s: s["kind"] == F.lit("image"))


def text_chars_expr(spans_col: str = "spans"):
    """Total text char mass across the text spans (0 when none)."""
    return F.aggregate(text_spans_expr(spans_col),
                       F.lit(0).cast("long"),
                       lambda acc, s: acc + F.length(s["text"]))


def pack_interleaved(docs: DataFrame, seq_len: int = 64,
                     image_cost: int = 16) -> DataFrame:
    """Multimodal training-sequence packing over the interleaved
    span column: each document's budget cost is its text mass (chars
    across text spans — the byte-budget proxy a vision-text packer
    uses) plus a FIXED `image_cost` per media span (the patch-token
    count an image occupies in the sequence), then documents are
    laid end-to-end in doc_id order and cut into `seq_len` windows —
    curation.pack_sequences' layout step, fed by the span costs.

    Returns per doc: (doc_id, n_text_chars, n_media, cost,
    begin_off, seq_id, n_seqs).

    Scale shape: the cost is a per-row higher-order map fused into
    the scan; the stream offsets come from the same two-phase
    distributed cumsum as pack_sequences (never an unpartitioned
    window); offsets are exact longs on both engines."""
    from ..operators.sequence import assign_group_cumsum

    base = docs.select(
        "doc_id",
        text_chars_expr().alias("n_text_chars"),
        F.size(media_spans_expr()).cast("int").alias("n_media"))
    base = base.withColumn(
        "cost",
        (F.col("n_text_chars")
         + F.lit(image_cost) * F.col("n_media")).cast("long"))
    packed = assign_group_cumsum(
        base.withColumn("_stream", F.lit(0)),
        ["_stream"], ["doc_id"], "cost", "_end",
        probe_key="group_cumsum:_stream->_end@pack_interleaved")
    # integer `div`, never a double `/`: offsets are exact longs and
    # stay exact past 2^53. greatest(cost, 1) keeps the last-window
    # numerator non-negative even for a zero-cost doc at offset 0 —
    # Spark's `div` truncates toward zero while DuckDB's `//` floors,
    # so a -1 numerator would diverge across engines; with the clamp
    # a zero-cost doc occupies exactly its boundary window on both
    begin = F.col("_end") - F.col("cost")
    packed = packed.withColumn("begin_off", begin)
    first_seq = F.expr(f"begin_off div {seq_len}")
    last_seq = F.expr(
        f"(begin_off + greatest(cost, 1L) - 1) div {seq_len}")
    return (packed.select(
        "doc_id", "n_text_chars", "n_media", "cost", "begin_off",
        first_seq.alias("seq_id"),
        (last_seq - first_seq + 1).alias("n_seqs"))
        .orderBy("doc_id"))


def spans_profile(docs: DataFrame) -> DataFrame:
    """Per-document profile of the interleaved span sequence, all
    JVM-side higher-order functions over the array column:

    - n_spans / n_media: size + filtered size
    - text_chars: aggregate over text spans (0 when none)
    - first_media: media_ref of the first image span (null when none)
    - span_fp: order-sensitive md5 of the full
      kind:text:media_ref:offset sequence — the span-sequence
      equality invariant as a column
    """
    media = media_spans_expr()
    text_chars = text_chars_expr()
    seq = F.transform("spans", lambda s: F.concat_ws(
        ":", s["kind"], F.coalesce(s["text"], F.lit("")),
        F.coalesce(s["media_ref"], F.lit("")),
        s["offset"].cast("string")))
    return (docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(media).alias("n_media"),
        text_chars.alias("text_chars"),
        F.try_element_at(media, F.lit(1))["media_ref"].alias("first_media"),
        F.md5(F.encode(F.array_join(seq, "|"), "utf-8")).alias("span_fp"))
        .orderBy("doc_id"))
