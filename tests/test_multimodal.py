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
