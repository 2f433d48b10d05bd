"""Perceptual audio deduplication (engine extension): completes the
multimodal dedup triad (text / :mod:`.image_dedup` / audio) with an
energy-delta fingerprint over REAL PCM (stdlib WAV codec; injectable
decoder for gated formats), sharing :func:`.image_dedup
.image_near_dup_pairs`'s Hamming-banded candidate generation — one
signature equi-join, never an all-pairs product.

Fingerprint: mono-mix the samples, split into 64 equal frames,
per-frame RMS energy, bit_i = energy[i] > energy[i-1] (bit 0
compares against the global mean). Comparing ENERGY DELTAS makes the
signature invariant to uniform gain (volume re-encodes) and robust to
mild noise; time-stretch/clipping need embedding-space dedup instead
— exactly the image-side caveat.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media_codecs import sniff_and_decode


def audio_fingerprint(decoded: dict, n_bits: int = 64) -> int | None:
    """Energy-delta fingerprint of a decoded audio dict — signed-long
    two's-complement output (the same Arrow/LongType posture as
    :func:`.image_dedup.average_hash`). Returns None for sample widths
    the decoder can't interpret.

    Dispatches to a numpy fast path for the common shape — mono 8/16
    bit PCM with frames short enough that int64 energy sums stay
    exact (s^2 <= 2^30, frame < 2^23 samples ⇒ sums < 2^53, so the
    int→float64 division is bit-identical to the scalar big-int
    path). Everything else (multi-channel float mixing, 24/32-bit)
    keeps the scalar reference, whose Python big-int sums have no
    overflow to guard. Parity pinned by ``tests/test_audio_dedup.py``."""
    bits_per = decoded.get("bits_per_sample", 16)
    channels = max(decoded.get("channels", 1), 1)
    payload = decoded.get("payload", b"")
    if bits_per in (8, 16) and channels == 1:
        try:
            import numpy as np
        except ImportError:
            return _audio_fingerprint_py(decoded, n_bits)
        if bits_per == 16:
            samples = np.frombuffer(
                payload[: len(payload) // 2 * 2], dtype="<i2"
            ).astype(np.int64)
        else:
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
        if samples.size == 0:
            return 0
        frame = max(samples.size // n_bits, 1)
        if frame >= 1 << 23:
            return _audio_fingerprint_py(decoded, n_bits)
        sq = samples * samples
        energies = []
        for i in range(n_bits):
            chunk = sq[i * frame : (i + 1) * frame]
            if chunk.size == 0:
                energies.append(0.0)
            else:
                # int64 sum is exact (< 2^53 by the frame guard), so
                # the division matches the scalar exact-int path
                energies.append(int(chunk.sum()) / chunk.size)
        mean_e = sum(energies) / len(energies)
        bits = 0
        for i, e in enumerate(energies):
            prev = mean_e if i == 0 else energies[i - 1]
            if e > prev:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= 1 << 63 else bits
    return _audio_fingerprint_py(decoded, n_bits)


def _audio_fingerprint_py(decoded: dict, n_bits: int = 64) -> int | None:
    """The scalar reference implementation (and the fallback for
    shapes the fast path's exactness guard excludes)."""
    bits_per = decoded.get("bits_per_sample", 16)
    channels = max(decoded.get("channels", 1), 1)
    payload = decoded.get("payload", b"")
    # real sample decoding per WAV width — 8-bit PCM is UNSIGNED with
    # a 128 DC offset (recentre or the DC term swamps frame energies
    # and gain invariance breaks); 24-bit is 3-byte little-endian
    # signed; treating raw bytes as samples would fingerprint the
    # byte layout, not the audio
    if bits_per == 16:
        samples = list(struct.unpack(f"<{len(payload) // 2}h", payload[: len(payload) // 2 * 2]))
    elif bits_per == 8:
        samples = [b - 128 for b in payload]
    elif bits_per == 32:
        samples = list(struct.unpack(f"<{len(payload) // 4}i", payload[: len(payload) // 4 * 4]))
    elif bits_per == 24:
        samples = []
        for i in range(0, len(payload) - 2, 3):
            v = payload[i] | (payload[i + 1] << 8) | (payload[i + 2] << 16)
            samples.append(v - (1 << 24) if v & 0x800000 else v)
    else:
        return None  # unknown width: no fingerprint beats a wrong one
    if channels > 1:  # mono mix
        samples = [
            sum(samples[i : i + channels]) / channels
            for i in range(0, len(samples) - channels + 1, channels)
        ]
    if not samples:
        return 0
    frame = max(len(samples) // n_bits, 1)
    energies = []
    for i in range(n_bits):
        chunk = samples[i * frame : (i + 1) * frame]
        if not chunk:
            energies.append(0.0)
            continue
        energies.append(sum(s * s for s in chunk) / len(chunk))
    mean_e = sum(energies) / len(energies)
    bits = 0
    for i, e in enumerate(energies):
        prev = mean_e if i == 0 else energies[i - 1]
        if e > prev:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def with_audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """(id, afp) appended — decode + fingerprint in one Arrow-batched
    pass; non-audio / undecodable rows get NULL. Only the 8-byte
    signature leaves the scan."""
    dec = decoder or sniff_and_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    decoded = dec(bytes(r[content_col]) if r[content_col] is not None else b"")
                    sig = audio_fingerprint(decoded) if decoded.get("kind") == "audio" else None
                except Exception:
                    sig = None
                out.append({"__id": r[id_col], "afp": sig})
            yield pd.DataFrame(out, columns=["__id", "afp"])

    schema = T.StructType(
        [
            T.StructField("__id", df.schema[id_col].dataType),
            T.StructField("afp", T.LongType()),
        ]
    )
    fps = df.select(id_col, content_col).mapInPandas(run, schema)
    return df.join(fps.withColumnRenamed("__id", id_col), id_col, "left")


def dedup_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    max_hamming: int = 6,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Keep one representative (min id) per perceptual-dup cluster;
    undecodable rows are kept — no evidence of duplication. Shares the
    banded pair generation and cluster-minimum endgame with the image
    and text packs."""
    from .graph import keep_cluster_representatives
    from .image_dedup import image_near_dup_pairs

    fps = with_audio_fingerprint(df, content_col, id_col, decoder=decoder)
    pairs = image_near_dup_pairs(fps, id_col, hash_col="afp", max_hamming=max_hamming)
    return keep_cluster_representatives(df, pairs, id_col)
