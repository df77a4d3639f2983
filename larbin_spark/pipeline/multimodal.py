"""Multimodal column plumbing: opaque binary media + typed metadata.

Media payloads (image/audio/video) are opaque `binary` columns with a
typed metadata struct, processed by Arrow-batched mapInPandas stages.
The decode kernels themselves are STUBBED (no image/audio libraries
in this container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded by
the content digest) produces stable shapes/features — so the
Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is real and tested end-to-end while the codec is swappable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def decode_image(payload: bytes, fake: bool = False) -> List[float]:
    """Decode + feature-extract one image. STUB: real decoding needs
    an imaging library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; run with "
            "fake=True for the deterministic test decoder")
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def media_rows(n: int = 64) -> List[tuple]:
    """Deterministic synthetic media rows (the single source of truth
    for both the Spark DataFrame and the parquet handoff fixture)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 5 + 1)
        rows.append((f"m{i:04d}", kind, bytearray(payload),
                     (f"{kind}/x-fake", 64 + i % 128, 64 + (i * 7) % 128,
                      1000 * (i % 30))))
    return rows


def make_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    return spark.createDataFrame(media_rows(n), MEDIA_SCHEMA)


def write_media_parquet(path: str, n: int = 64) -> None:
    """Write the deterministic media fixture as ONE parquet file built
    directly from `media_rows` with an explicit pyarrow schema.

    Deliberately does NOT round-trip through Spark/pandas: a
    `toPandas()` of a struct column yields `Row` objects unless
    `spark.sql.execution.arrow.pyspark.enabled` is set in the session,
    and pyarrow inference then dies with ArrowTypeError — the exact
    round-3 driver regression. Building the table session-config-free
    makes the handoff independent of the caller's Spark config.

    The write is atomic (tmp + os.replace); the pre-r3 directory
    layout migration retries once because two concurrent contract
    runs can race on rmtree/replace — the loser's file is identical,
    so a second attempt (or an already-migrated path) is benign.
    """
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = media_rows(n)
    schema = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.struct([
            pa.field("mime", pa.string()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("duration_ms", pa.int32()),
        ])),
    ])
    table = pa.Table.from_pydict(
        {
            "media_id": [r[0] for r in rows],
            "kind": [r[1] for r in rows],
            "payload": [bytes(r[2]) for r in rows],
            "meta": [{"mime": r[3][0], "width": r[3][1],
                      "height": r[3][2], "duration_ms": r[3][3]}
                     for r in rows],
        },
        schema=schema,
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    for attempt in (0, 1):
        try:
            if os.path.isdir(path):  # pre-r3 dir layout
                shutil.rmtree(path)
            os.replace(tmp, path)
            break
        except OSError:
            if os.path.isfile(path):
                # a concurrent run won the race with an identical file
                # (same deterministic rows, same schema)
                if os.path.exists(tmp):
                    os.remove(tmp)
                break
            if attempt:
                # both attempts failed and nothing usable exists at
                # path — a persistent error (permissions, un-removable
                # dir), not the benign race; surface it here rather
                # than as a confusing read failure downstream
                raise


def extract_features(media: DataFrame, batch_hint: int = 256,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. The
    repartition keys on media_id so one oversized asset cannot skew a
    task; Arrow moves the binary batches, no per-row Python UDF.

    The content digest is md5 over the lowercase-hex encoding of the
    payload (not the raw bytes): hex is an injective encoding, and it
    makes the digest computable by any engine whose md5 is
    VARCHAR-only (the DuckDB oracle: md5(lower(hex(payload))))."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                feat = decode_image(payload, fake=fake)
                out.append((row.media_id, row.kind, len(payload),
                            hashlib.md5(payload.hex().encode()).hexdigest(),
                            feat))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA])

    return (media.repartition("media_id")
            .mapInPandas(gen, FEATURES_SCHEMA))


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: explode sample timestamps from the
    metadata duration (pure column ops; the decode of each frame is
    the stubbed kernel above)."""
    n_frames = F.greatest(F.lit(1),
                          (F.col("meta.duration_ms") / every_ms).cast("int"))
    return (media.filter(F.col("kind") == "video")
            .select("media_id", F.explode(F.sequence(
                F.lit(0), n_frames - 1)).alias("frame_idx"))
            .withColumn("ts_ms", F.col("frame_idx") * every_ms))


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = True) -> DataFrame:
    """Image resize stage: mapInPandas over binary payloads emitting
    resized payloads + updated metadata. The pixel transform is
    STUBBED like decode_image (no imaging library in this container):
    with fake=True the 'resized' payload is a deterministic digest
    expansion of (payload, width, height), so downstream plumbing —
    schema evolution, metadata rewrite, batch shapes — is real and
    regression-testable; without fake it raises NotImplementedError.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_SCHEMA["meta"].dataType),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image resize requires an imaging library; run "
                        "with fake=True for the deterministic stub")
                seed = hashlib.sha256(
                    bytes(row.payload) + f":{width}x{height}".encode()
                ).digest()
                n_out = max(1, width * height // 16)
                payload = (seed * (n_out // len(seed) + 1))[:n_out]
                meta = dict(row.meta)  # struct arrives as a dict
                meta.update(width=width, height=height)
                out.append((row.media_id, row.kind, bytearray(payload),
                            {"mime": meta["mime"],
                             "width": int(meta["width"]),
                             "height": int(meta["height"]),
                             "duration_ms": int(meta["duration_ms"])}))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "meta"])

    return media.mapInPandas(gen, out_schema)


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media deduplication over the opaque binary payloads:
    group by the payload digest (md5 over the lowercase-hex
    encoding, the same VARCHAR-md5-portable construction
    extract_features uses), keep the lowest media_id as canonical,
    and report the duplicate count per kept asset — the
    binary-column analogue of dedup.exact_dedup, e.g. the same
    banner image embedded by thousands of pages.

    Scale: digesting is a per-row JVM expression (md5/hex — no
    Python, no decode); the groupBy keys on the 32-hex digest with
    map-side partials, so the shuffle payload is (digest, id,
    count) — the binary payloads themselves never move. Returns
    (digest, kind, n_copies, canonical_id, total_bytes) per distinct
    payload."""
    d = media.select(
        F.col("media_id"), F.col("kind"),
        F.octet_length("payload").alias("n_bytes"),
        F.md5(F.encode(F.lower(F.hex("payload")), "utf-8"))
        .alias("digest"))
    return (d.groupBy("digest")
            .agg(F.min("kind").alias("kind"),
                 F.count("*").cast("long").alias("n_copies"),
                 F.min("media_id").alias("canonical_id"),
                 F.sum("n_bytes").cast("long").alias("total_bytes"))
            .orderBy("digest"))
