"""Perceptual audio dedup: gain invariance on real WAV bytes, banded
pairs, cluster-minimum keeps, undecodable quarantine behavior."""

from __future__ import annotations

import math
import struct

from open_data_pipelines_spark.operators.audio_dedup import (
    audio_fingerprint,
    dedup_audio,
    with_audio_fingerprint,
)
from open_data_pipelines_spark.operators.media_codecs import decode_wav, encode_wav


def _melody_wav(notes, gain=0.5, rate=8000, note_ms=40, noise_seed=None):
    import random

    rnd = random.Random(noise_seed)
    samples = []
    for freq in notes:
        n = rate * note_ms // 1000
        for i in range(n):
            v = gain * math.sin(2 * math.pi * freq * i / rate)
            if noise_seed is not None:
                v += rnd.uniform(-0.01, 0.01)
            samples.append(max(-32767, min(32767, int(v * 32767))))
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    return encode_wav(rate, 1, 16, pcm)


TUNE_A = [220, 440, 220, 880, 440, 220, 660, 330] * 2
TUNE_B = [990, 110, 550, 220, 990, 770, 110, 440] * 2


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_gain_invariant_and_discriminative():
    a = audio_fingerprint(decode_wav(_melody_wav(TUNE_A)))
    quiet = audio_fingerprint(decode_wav(_melody_wav(TUNE_A, gain=0.1)))
    noisy = audio_fingerprint(decode_wav(_melody_wav(TUNE_A, noise_seed=3)))
    other = audio_fingerprint(decode_wav(_melody_wav(TUNE_B)))
    assert a == audio_fingerprint(decode_wav(_melody_wav(TUNE_A)))  # deterministic
    assert _ham(a, quiet) <= 4, _ham(a, quiet)  # volume re-encode
    assert _ham(a, noisy) <= 6, _ham(a, noisy)
    assert _ham(a, other) > 10, _ham(a, other)


def test_dedup_audio_end_to_end(spark):
    rows = [
        (1, _melody_wav(TUNE_A)),
        (2, _melody_wav(TUNE_A, gain=0.1)),  # volume dup of 1
        (3, _melody_wav(TUNE_B)),  # distinct
        (4, b"not audio"),  # undecodable
    ]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    fps = {r["media_id"]: r["afp"] for r in with_audio_fingerprint(df).collect()}
    assert fps[4] is None and fps[1] is not None
    kept = {r["media_id"] for r in dedup_audio(df).select("media_id").collect()}
    assert kept == {1, 3, 4}


def test_audio_fingerprint_numpy_path_bit_identical_to_scalar():
    """The mono-8/16-bit numpy fast path must be BIT-identical to the
    scalar reference (exact-int energy sums under the frame guard)."""
    import random
    import struct as _struct

    from open_data_pipelines_spark.operators.audio_dedup import (
        _audio_fingerprint_py,
        audio_fingerprint,
    )

    rnd = random.Random(20260815)
    for bits_per in (8, 16):
        for n in (0, 1, 63, 64, 65, 1000, 5000):
            if bits_per == 16:
                vals = [rnd.randint(-32768, 32767) for _ in range(n)]
                payload = _struct.pack(f"<{n}h", *vals)
            else:
                payload = bytes(rnd.randrange(256) for _ in range(n))
            d = {"bits_per_sample": bits_per, "channels": 1, "payload": payload}
            assert audio_fingerprint(d) == _audio_fingerprint_py(d), (bits_per, n)
    # non-fast-path shapes still work (scalar route)
    stereo = {
        "bits_per_sample": 16,
        "channels": 2,
        "payload": _struct.pack("<8h", *[100, -100, 2000, -2000, 5, 5, 0, 1]),
    }
    assert audio_fingerprint(stereo) == _audio_fingerprint_py(stereo)
