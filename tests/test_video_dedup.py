"""Video dedup plumbing: deterministic fake frame decoder (the decode
itself is environment-gated per the multimodal charter), real frame
sampling / signature folding / banded pairs / cluster-minimum."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_pipelines_spark.operators.video_dedup import (
    dedup_video,
    video_signature,
    with_video_signature,
)


def _make_fake_frames():
    """Deterministic fake frame decoder, built inside the test process
    so Spark pickles it BY VALUE (a module-level test function would
    be pickled by reference and fail to import on executors). Videos
    with the same tag produce near-identical frame streams; a 'noise'
    suffix perturbs a few pixels — a re-encode stand-in."""

    def fake_frames(content: bytes, ts_ms: int) -> dict:
        if not content.startswith(b"VID:"):
            raise ValueError("not a video")
        tag = content[4:5][0]
        noisy = b"noise" in content
        w = h = 16
        payload = bytearray()
        for y in range(h):
            for x in range(w):
                v = (x * 16 + tag * 7 + (ts_ms // 1000)) % 256
                if noisy and (x + y) % 37 == 0:
                    v = (v + 25) % 256
                payload += bytes((v, v, v))
        return {"kind": "image", "width": w, "height": h, "channels": 3, "payload": bytes(payload)}

    return fake_frames


def test_signature_folding_robust_to_noise_and_discriminative():
    fake_frames = _make_fake_frames()
    a = video_signature(b"VID:A", 5000, fake_frames)
    a2 = video_signature(b"VID:A noise", 5000, fake_frames)
    b = video_signature(b"VID:Z", 5000, fake_frames)
    assert a == video_signature(b"VID:A", 5000, fake_frames)  # deterministic
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(a, a2) <= 6, ham(a, a2)
    assert ham(a, b) > 10, ham(a, b)
    # dropped tail frames barely move the majority fold
    short = video_signature(b"VID:A", 4000, fake_frames)
    assert ham(a, short) <= 6
    assert video_signature(b"nope", 5000, fake_frames) is None


def test_dedup_video_end_to_end(spark):
    fake_frames = _make_fake_frames()
    meta_t = T.StructType([T.StructField("duration_ms", T.LongType())])
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("meta", meta_t),
            T.StructField("content", T.BinaryType()),
        ]
    )
    rows = [
        (1, {"duration_ms": 5000}, b"VID:A"),
        (2, {"duration_ms": 5000}, b"VID:A noise"),  # re-encode of 1
        (3, {"duration_ms": 4000}, b"VID:A"),  # truncated copy of 1
        (4, {"duration_ms": 5000}, b"VID:Z"),  # distinct
        (5, {"duration_ms": 5000}, b"not video"),  # undecodable
    ]
    df = spark.createDataFrame(rows, schema)
    sigs = {r["media_id"]: r["vsig"] for r in with_video_signature(df, fake_frames).collect()}
    assert sigs[5] is None and sigs[1] is not None
    kept = {r["media_id"] for r in dedup_video(df, fake_frames).select("media_id").collect()}
    assert kept == {1, 4, 5}
