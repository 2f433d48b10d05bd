"""Perceptual image dedup: aHash determinism and robustness on real
BMP bytes, banded Hamming candidates, cluster-minimum dedup,
undecodable quarantine behavior."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.image_dedup import (
    average_hash,
    dedup_images,
    image_near_dup_pairs,
    with_image_ahash,
)
from open_data_pipelines_spark.operators.media_codecs import decode_bmp, encode_bmp


def _gradient_bmp(w=32, h=24, noise=0, seed=1, bright=0):
    rnd = random.Random(seed)
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            v = min(255, (x * 255) // w + bright)
            if noise and rnd.random() < 0.02:
                v = min(255, v + noise)
            rgb += bytes((v, v, min(255, (y * 255) // h + bright)))
    return encode_bmp(w, h, bytes(rgb))


def _checker_bmp(w=32, h=24):
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if (x // 4 + y // 4) % 2 else 0
            rgb += bytes((v, v, v))
    return encode_bmp(w, h, bytes(rgb))


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_average_hash_deterministic_and_discriminative():
    a = average_hash(decode_bmp(_gradient_bmp()))
    assert a == average_hash(decode_bmp(_gradient_bmp()))
    b = average_hash(decode_bmp(_checker_bmp()))
    assert _ham(a, b) > 8  # different content, far hashes
    # near-dup variants stay close
    noisy = average_hash(decode_bmp(_gradient_bmp(noise=30, seed=2)))
    brighter = average_hash(decode_bmp(_gradient_bmp(bright=10)))
    resized = average_hash(decode_bmp(_gradient_bmp(w=64, h=48)))
    for v in (noisy, brighter, resized):
        assert _ham(a, v) <= 6, _ham(a, v)


def test_banded_pairs_and_dedup(spark):
    rows = [
        (1, _gradient_bmp()),
        (2, _gradient_bmp(noise=30, seed=2)),  # near-dup of 1
        (3, _gradient_bmp(w=64, h=48)),  # resized dup of 1
        (4, _checker_bmp()),  # distinct
        (5, b"not an image at all"),  # undecodable
    ]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    hashed = with_image_ahash(df)
    got = {r["media_id"]: r["ahash"] for r in hashed.collect()}
    assert got[5] is None and got[1] is not None

    pairs = {(r["id_a"], r["id_b"]) for r in image_near_dup_pairs(hashed).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)

    kept = {r["media_id"] for r in dedup_images(df).select("media_id").collect()}
    assert kept == {1, 4, 5}  # cluster min kept; distinct + undecodable kept


def test_injectable_decoder_for_gated_formats(spark):
    """Formats the container can't decode flow through an injected
    decoder — same posture as multimodal.resize_media."""
    def fake(content: bytes) -> dict:
        v = 255 if content.startswith(b"JPEGISH-A") else 0
        return {"kind": "image", "width": 8, "height": 8, "channels": 3, "payload": bytes([v]) * 192}

    df = spark.createDataFrame(
        [(1, b"JPEGISH-A1"), (2, b"JPEGISH-A2"), (3, b"JPEGISH-B")],
        ["media_id", "content"],
    )
    hashed = with_image_ahash(df, decoder=fake)
    got = {r["media_id"]: r["ahash"] for r in hashed.collect()}
    assert got[1] == got[2] and got[1] is not None


def test_ahash_hash_size_guard(spark):
    """hash_size > 8 would overflow int64 at Arrow conversion OUTSIDE
    the per-row try/except, failing the whole task — guard up front
    like video_signature does (round-9 review find)."""
    import pytest

    from open_data_pipelines_spark.operators.image_dedup import with_image_ahash

    df = spark.createDataFrame([(1, b"")], ["media_id", "content"])
    with pytest.raises(ValueError, match="hash_size"):
        with_image_ahash(df, hash_size=16)


def test_ahash_numpy_path_bit_identical_to_scalar():
    """The numpy fast path must be BIT-identical to the scalar
    reference on arbitrary shapes — odd dims, grids smaller than the
    hash, 1/3/4 channels, constant and extreme payloads."""
    import random

    from open_data_pipelines_spark.operators.image_dedup import (
        _average_hash_np,
        _average_hash_py,
    )

    rnd = random.Random(20260815)
    cases = []
    for _ in range(40):
        w = rnd.randint(1, 37)
        h = rnd.randint(1, 29)
        ch = rnd.choice([1, 3, 4])
        payload = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        cases.append({"width": w, "height": h, "channels": ch, "payload": payload})
    cases.append({"width": 5, "height": 4, "channels": 3, "payload": bytes(60)})
    cases.append(
        {"width": 6, "height": 3, "channels": 3, "payload": bytes([255]) * 54}
    )
    for hs in (4, 8):
        for c in cases:
            assert _average_hash_np(c, hs) == _average_hash_py(c, hs), (c["width"], c["height"], c["channels"], hs)

    # truncated payloads raise on BOTH paths (callers map to NULL)
    import pytest

    bad = {"width": 8, "height": 8, "channels": 3, "payload": bytes(100)}
    with pytest.raises(Exception):
        _average_hash_np(bad, 8)
    with pytest.raises(Exception):
        _average_hash_py(bad, 8)
