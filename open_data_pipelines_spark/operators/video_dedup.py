"""Perceptual video deduplication plumbing (engine extension): the
last leg of the multimodal dedup pack. Container video codecs don't
exist in this environment, so — per the multimodal charter — the
DECODE step is injectable while everything Spark-side is real and
tested: frame sampling, per-frame aHash, per-bit-majority signature
folding, Hamming-banded candidates, cluster-minimum dedup.

Signature: sample frames every ``every_ms`` (the
:func:`.multimodal.frame_sample_plan` cadence), aHash each frame with
:func:`.image_dedup.average_hash`, then fold the frame hashes into
ONE 64-bit video signature by per-bit majority (the SimHash move —
stable under dropped/extra frames and re-encoding, which per-frame
equality is not). Only the 8-byte signature leaves the scan; pairs
come from the shared Hamming-banded equi-join.

A frame decoder has the signature ``(content: bytes, ts_ms: int) ->
dict`` returning an image dict ({width, height, channels, payload})
for the frame at ``ts_ms``. Production wires ffmpeg/PyAV here; tests
use a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .image_dedup import average_hash

FrameDecoder = Callable[[bytes, int], dict]


def video_signature(
    content: bytes,
    duration_ms: int,
    frame_decoder: FrameDecoder,
    every_ms: int = 1000,
    hash_size: int = 8,
) -> int | None:
    """Per-bit-majority fold of sampled-frame aHashes; None when no
    frame decodes (quarantine by policy)."""
    n_bits = hash_size * hash_size
    if n_bits > 64:
        # the fold targets one LongType signature; a wider grid would
        # silently overflow the two's-complement conversion below
        raise ValueError(f"hash_size {hash_size} exceeds the 64-bit signature (max 8)")
    counts = [0] * n_bits
    n_frames = 0
    for ts in range(0, max(duration_ms, 0) + 1, every_ms):
        try:
            frame = frame_decoder(content, ts)
        except Exception:
            continue
        h = average_hash(frame, hash_size) & ((1 << n_bits) - 1)
        for i in range(n_bits):
            counts[i] += (h >> i) & 1
        n_frames += 1
    if n_frames == 0:
        return None
    bits = 0
    for i, c in enumerate(counts):
        if 2 * c > n_frames:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def with_video_signature(
    df: DataFrame,
    frame_decoder: FrameDecoder,
    content_col: str = "content",
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
    every_ms: int = 1000,
) -> DataFrame:
    """(id, vsig) appended — frame sampling + hashing in one
    Arrow-batched pass per video row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    sig = video_signature(
                        bytes(r["__content"]) if r["__content"] is not None else b"",
                        int(r["__dur"]) if r["__dur"] is not None else 0,
                        frame_decoder,
                        every_ms,
                    )
                except Exception:
                    sig = None
                out.append({"__id": r["__id"], "vsig": sig})
            yield pd.DataFrame(out, columns=["__id", "vsig"])

    schema = T.StructType(
        [
            T.StructField("__id", df.schema[id_col].dataType),
            T.StructField("vsig", T.LongType()),
        ]
    )
    proj = df.select(
        F.col(id_col).alias("__id"),
        F.col(content_col).alias("__content"),
        F.col(duration_col).cast("long").alias("__dur"),
    )
    sigs = proj.mapInPandas(run, schema).withColumnRenamed("__id", id_col)
    return df.join(sigs, id_col, "left")


def dedup_video(
    df: DataFrame,
    frame_decoder: FrameDecoder,
    content_col: str = "content",
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
    max_hamming: int = 6,
    every_ms: int = 1000,
) -> DataFrame:
    """Keep one representative (min id) per perceptual-dup cluster;
    rows with no decodable frame are kept. Shares the banded pair
    generation and cluster-minimum endgame with the image/audio/text
    packs."""
    from .graph import keep_cluster_representatives
    from .image_dedup import image_near_dup_pairs

    sigs = with_video_signature(
        df, frame_decoder, content_col, id_col, duration_col, every_ms
    )
    pairs = image_near_dup_pairs(sigs, id_col, hash_col="vsig", max_hamming=max_hamming)
    return keep_cluster_representatives(df, pairs, id_col)
