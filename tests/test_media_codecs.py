"""Native BMP/WAV codec tests — the multimodal decode path running on
REAL bytes end to end, no injection (VERDICT r1 item 5)."""

from __future__ import annotations

import struct

import pytest

from open_data_pipelines_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_image_nn,
    sniff_and_decode,
)
from open_data_pipelines_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    feature_extract,
    resize_media,
)


def checkerboard_bmp(width: int, height: int) -> bytes:
    rgb = bytearray()
    for y in range(height):
        for x in range(width):
            on = (x + y) % 2 == 0
            rgb += b"\xff\x00\x00" if on else b"\x00\x00\xff"  # red / blue
    return encode_bmp(width, height, bytes(rgb))


def sine_wav(n_frames: int = 800, rate: int = 8000) -> bytes:
    # deterministic triangle-ish PCM16 mono ramp (no math import needed)
    pcm = b"".join(
        struct.pack("<h", ((i * 257) % 20000) - 10000) for i in range(n_frames)
    )
    return encode_wav(rate, 1, 16, pcm)


def test_bmp_round_trip_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    bmp = checkerboard_bmp(3, 2)
    d = decode_bmp(bmp)
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
    assert d["payload"][0:3] == b"\xff\x00\x00"  # top-left red, top-down order
    assert d["payload"][3:6] == b"\x00\x00\xff"
    assert decode_bmp(encode_bmp(3, 2, d["payload"]))["payload"] == d["payload"]


def test_bmp_rejects_nonpositive_dimensions():
    bmp = bytearray(checkerboard_bmp(3, 2))
    struct.pack_into("<i", bmp, 18, 0)  # width = 0
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(bmp))
    bmp = bytearray(checkerboard_bmp(3, 2))
    struct.pack_into("<i", bmp, 18, -3)  # negative width
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(bmp))
    bmp = bytearray(checkerboard_bmp(3, 2))
    struct.pack_into("<i", bmp, 22, 0)  # height = 0
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(bmp))


def test_wav_parse_fields():
    wav = sine_wav(800, 8000)
    d = decode_wav(wav)
    assert d["sample_rate"] == 8000
    assert d["channels"] == 1
    assert d["bits_per_sample"] == 16
    assert d["n_frames"] == 800
    assert d["duration_ms"] == 100


def test_sniff_dispatch_and_gate():
    assert sniff_and_decode(checkerboard_bmp(2, 2))["kind"] == "image"
    assert sniff_and_decode(sine_wav())["kind"] == "audio"
    with pytest.raises(UnsupportedMediaError):
        sniff_and_decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_image_nn_halves():
    d = decode_bmp(checkerboard_bmp(8, 4))
    r = resize_image_nn(d, 4)
    assert (r["width"], r["height"]) == (4, 2)
    assert len(r["payload"]) == 4 * 2 * 3
    # never upscale
    assert resize_image_nn(d, 100)["width"] == 8


@pytest.fixture(scope="module")
def real_media(spark):
    rows = [
        (1, {"mime": "image/bmp", "width": 8, "height": 4, "duration_ms": None,
             "sample_rate": None}, checkerboard_bmp(8, 4)),
        (2, {"mime": "audio/wav", "width": None, "height": None,
             "duration_ms": 100, "sample_rate": 8000}, sine_wav(800, 8000)),
        (3, {"mime": None, "width": None, "height": None, "duration_ms": None,
             "sample_rate": None}, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extract_real_bytes_no_injection(real_media):
    out = {r["media_id"]: r for r in feature_extract(real_media, n_features=8).collect()}
    assert out[3]["features"] is None
    img = out[1]["features"]
    assert len(img) == 8 and abs(sum(img) - 1.0) < 1e-9
    # checkerboard decodes to only 0x00/0xff bytes -> only buckets 0 and 7
    assert img[0] > 0 and img[7] > 0 and all(b == 0 for b in img[1:7])
    aud = out[2]["features"]
    assert len(aud) == 8 and abs(sum(aud) - 1.0) < 1e-9


def test_resize_media_real_bytes_no_injection(real_media):
    out = {r["media_id"]: r for r in resize_media(real_media, 4).collect()}
    img = out[1]
    assert img["meta"]["width"] == 4 and img["meta"]["height"] == 2
    redecoded = decode_bmp(bytes(img["content"]))
    assert (redecoded["width"], redecoded["height"]) == (4, 2)
    # audio + null rows untouched
    assert decode_wav(bytes(out[2]["content"]))["n_frames"] == 800
    assert out[3]["content"] is None


def test_bmp_and_resize_numpy_paths_bit_identical_to_scalar():
    """r10: the decode/encode/resize numpy fast paths must be
    BIT-identical to the scalar references on arbitrary shapes — odd
    widths (stride padding), 1-pixel edges, top-down and bottom-up row
    order, and downscales that hit the index-clamp branches."""
    import random

    from open_data_pipelines_spark.operators.media_codecs import (
        _bmp_pixels_np,
        _bmp_pixels_py,
        _resize_nn_np,
        _resize_nn_py,
    )

    rnd = random.Random(20260815)
    for _ in range(30):
        w = rnd.randint(1, 41)
        h = rnd.randint(1, 23)
        rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        bmp = encode_bmp(w, h, rgb)
        # the full decode (padding + bottom-up + BGR->RGB) round-trips
        dec = decode_bmp(bmp)
        assert dec["payload"] == rgb

        stride = (w * 3 + 3) & ~3
        data_offset = struct.unpack_from("<I", bmp, 10)[0]
        for top_down in (False, True):
            assert _bmp_pixels_np(bmp, data_offset, w, h, stride, top_down) == (
                _bmp_pixels_py(bmp, data_offset, w, h, stride, top_down)
            )

        new_w = rnd.randint(1, w)
        new_h = rnd.randint(1, h)
        assert _resize_nn_np(rgb, w, h, new_w, new_h) == _resize_nn_py(
            rgb, w, h, new_w, new_h
        )


def test_encode_bmp_numpy_matches_scalar_layout():
    """encode_bmp's vectorized body must produce byte-identical files
    to the documented format (stride padding zeroed, bottom-up BGR) —
    checked by decoding and by a hand-built 2x2 expectation."""
    rgb = bytes(
        [
            255, 0, 0,   0, 255, 0,    # row 0: red, green
            0, 0, 255,   9, 8, 7,      # row 1: blue, (9,8,7)
        ]
    )
    bmp = encode_bmp(2, 2, rgb)
    # bottom-up: file row 0 is image row 1; BGR order; 6->8 stride pad
    body = bmp[54:]
    assert body[:6] == bytes([255, 0, 0, 7, 8, 9])  # blue BGR, (9,8,7) BGR
    assert body[6:8] == b"\x00\x00"
    assert body[8:14] == bytes([0, 0, 255, 0, 255, 0])  # red BGR, green BGR
    assert decode_bmp(bmp)["payload"] == rgb
