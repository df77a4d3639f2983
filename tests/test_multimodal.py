"""Multimodal plumbing: binary payload columns through Arrow-batched
mapInPandas, stubbed decode, frame-sample planning."""

import pytest

from larbin_spark.pipeline.multimodal import (
    decode_image, extract_features, frame_sample_plan, make_media_table,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_decode_fake_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a == b and len(a) == 8
    assert decode_image(b"other", fake=True) != a


def test_extract_features_end_to_end(spark):
    media = make_media_table(spark, 30)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["feature"]) == 8 for r in feats)
    assert by_id["m0000"]["n_bytes"] > 0
    # deterministic digest across runs
    feats2 = extract_features(make_media_table(spark, 30), fake=True).collect()
    assert {r["media_id"]: r["digest"] for r in feats2} == \
        {r["media_id"]: r["digest"] for r in feats}


def test_frame_sample_plan(spark):
    media = make_media_table(spark, 30)
    plan = frame_sample_plan(media, every_ms=500).collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 500 for r in plan)
    vids = media.filter("kind = 'video'").count()
    assert len({r["media_id"] for r in plan}) == vids


def test_resize_stub_deterministic(spark):
    from larbin_spark.pipeline.multimodal import resize_images
    media = make_media_table(spark, 30)
    a = {r["media_id"]: bytes(r["payload"])
         for r in resize_images(media, 64, 64).collect()}
    b = {r["media_id"]: bytes(r["payload"])
         for r in resize_images(make_media_table(spark, 30), 64, 64).collect()}
    assert a == b and len(a) == 10           # images only (every 3rd)
    c = {r["media_id"]: r for r in resize_images(media, 32, 32).collect()}
    assert all(r["meta"]["width"] == 32 for r in c.values())
    assert bytes(c["m0000"]["payload"]) != a["m0000"]  # size-dependent


def test_media_parquet_handoff_without_arrow_config(tmp_path):
    """Regression pin for the r3 driver red: the handoff parquet must
    be buildable and the multimodal_features query green in a Spark
    session that does NOT set spark.sql.execution.arrow.pyspark.enabled
    (the driver's session doesn't). Runs in a fresh interpreter — a
    second SparkContext in this process would hit the dead-accumulator
    bug — and asserts the Spark result matches a DuckDB read of the
    same fixture byte-for-byte."""
    import subprocess
    import sys
    import textwrap

    repo = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    script = textwrap.dedent(f"""
        import hashlib, sys
        sys.path.insert(0, {repo!r})
        import duckdb
        from pyspark.sql import SparkSession
        from larbin_spark.pipeline import multimodal

        path = {str(tmp_path / "media.parquet")!r}
        multimodal.write_media_parquet(path, 64)

        # NO arrow config — mimic the driver's session exactly
        spark = (SparkSession.builder.master("local[2]")
                 .appName("noarrow-regression")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "4")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        df = (multimodal.extract_features(
                  spark.read.parquet(path), fake=True)
              .select("media_id", "kind", "n_bytes", "digest")
              .orderBy("media_id"))
        got = [(r.media_id, r.kind, r.n_bytes, r.digest)
               for r in df.collect()]
        want = duckdb.connect().execute(
            "SELECT media_id, kind, octet_length(payload)::INT, "
            "md5(lower(hex(payload))) FROM read_parquet(?) "
            "ORDER BY media_id", [path]).fetchall()
        assert got == [tuple(w) for w in want], (got[:3], want[:3])
        assert len(got) == 64
        # meta struct survives the explicit-schema write
        meta = spark.read.parquet(path).select("meta.mime").collect()
        assert all(m.mime for m in meta)
        print("OK")
        spark.stop()
    """)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "OK" in out.stdout


def test_media_dedup_groups_identical_payloads(spark):
    from larbin_spark.pipeline.multimodal import media_dedup
    rows = [("a1", "image", bytearray(b"\x01\x02"), None),
            ("a2", "image", bytearray(b"\x01\x02"), None),
            ("b1", "audio", bytearray(b"\x03"), None)]
    from larbin_spark.pipeline.multimodal import MEDIA_SCHEMA
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["canonical_id"]: r for r in media_dedup(df).collect()}
    assert out["a1"]["n_copies"] == 2          # a1+a2 share bytes
    assert out["a1"]["total_bytes"] == 4
    assert out["b1"]["n_copies"] == 1
    assert len(out) == 2
