"""Multimodal plumbing tests — binary columns + metadata structs +
Arrow-batched mapInPandas shapes (decode stubbed via fake_decoder)."""

from __future__ import annotations

import pytest

from open_data_pipelines_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    fake_decoder,
    feature_extract,
    frame_sample_plan,
    resize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, {"mime": "image/png", "width": 64, "height": 48, "duration_ms": None, "sample_rate": None}, bytes(range(256)) * 4),
        (2, {"mime": "image/jpeg", "width": 320, "height": 200, "duration_ms": None, "sample_rate": None}, b"\x00\x01\x02\x03" * 100),
        (3, {"mime": "video/mp4", "width": 1920, "height": 1080, "duration_ms": 4000, "sample_rate": None}, b"\xff" * 1000),
        (4, {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 2500, "sample_rate": 16000}, b"riff...."),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extract_shapes(media):
    out = feature_extract(media, decoder=fake_decoder, n_features=8).collect()
    assert len(out) == 4
    for r in out:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram


def test_feature_extract_default_decoder_rejects_unknown_formats(media):
    # decoder=None now means the native BMP/WAV codecs; these fixture
    # payloads are fake PNG/JPEG bytes, so execution must surface the
    # UnsupportedMediaError message (wrapped in Spark's PythonException)
    with pytest.raises(Exception, match="unrecognized media format"):
        feature_extract(media).collect()


def test_resize_scales_meta_and_payload(media):
    out = {r["media_id"]: r for r in resize_media(media, 100, decoder=fake_decoder).collect()}
    r3 = out[3]  # 1920x1080 -> max dim 100
    assert r3["meta"]["width"] == 100 and r3["meta"]["height"] == 56
    assert len(r3["content"]) < 1000
    r1 = out[1]  # 64x48 already smaller -> untouched
    assert r1["meta"]["width"] == 64 and len(r1["content"]) == 1024


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in plan:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert by_id[3] == [0, 1000, 2000, 3000, 4000]
    assert by_id[4] == [0, 1000, 2000]
    assert by_id[1] == [0]  # no duration -> single frame at 0
