"""Multimodal (image/audio/video) column handling — engine extension
for training-data pipelines (BASELINE.json north-star).

Design: media ride as opaque ``binary`` columns + a typed metadata
struct; all processing is Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row objects. The decode step defaults to the
native pure-stdlib codecs in :mod:`.media_codecs` (uncompressed BMP,
PCM WAV) so the pipeline runs end to end on real bytes in this
container; formats that genuinely need absent libraries (JPEG/PNG/
MP4...) raise :class:`.media_codecs.UnsupportedMediaError` unless a
``decoder=`` callable (e.g. PIL-based) is injected.

Scale notes: binary payloads dominate partition size — reader should
cap ``spark.sql.files.maxPartitionBytes`` and media tables should be
stored with the binary column LAST (parquet column pruning keeps
metadata-only queries from touching bytes at all). ``mapInPandas``
streams Arrow batches, so peak memory is one batch of decoded media,
not one partition.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("meta", MEDIA_META),
        # binary LAST: metadata-only scans never read payload pages
        T.StructField("content", T.BinaryType()),
    ]
)

Decoder = Callable[[bytes], "object"]


def fake_decoder(content: bytes) -> dict:
    """Deterministic stand-in for a pixel decoder: summarizes raw bytes.

    Real deployments inject a PIL/torchvision/ffmpeg-backed callable
    with the same signature.
    """
    if content is None:
        raise ValueError("null content")
    return {
        "n_bytes": len(content),
        "byte_sum": int(sum(content)) if content else 0,
        "head": bytes(content[:4]),
    }


def feature_extract(
    df: DataFrame,
    decoder: Decoder | None = None,
    n_features: int = 8,
) -> DataFrame:
    """binary content -> fixed-width float feature vector.

    Arrow-batched mapInPandas. The histogram is computed over the
    DECODED payload (RGB pixels for BMP, PCM samples for WAV — via the
    default :func:`.media_codecs.sniff_and_decode`) when the decoder
    surfaces one; an injected decoder without a ``payload`` key (e.g.
    :func:`fake_decoder`) falls back to raw container bytes, standing
    in for a real embedding model.
    """
    if decoder is None:
        from .media_codecs import sniff_and_decode as decoder  # noqa: F811

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                decoded = decoder(bytes(content))
                payload = (
                    decoded["payload"]
                    if isinstance(decoded, dict) and "payload" in decoded
                    else bytes(content)
                )
                buckets = [0.0] * n_features
                for byte in payload:
                    buckets[byte % n_features] += 1.0
                total = max(len(payload), 1)
                feats.append([b / total for b in buckets])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "content").mapInPandas(run, out_schema)


def resize_media(df: DataFrame, max_dim: int, decoder: Decoder | None = None) -> DataFrame:
    """Bound image dimensions to ``max_dim`` (longest side).

    Default path is REAL: decode via the native codecs, nearest-
    neighbor downscale, re-encode as BMP, and write back true
    width/height metadata; audio rows pass through unchanged. An
    injected decoder keeps the legacy shape-only behavior (metadata
    scaled, payload truncated proportionally) for plumbing tests with
    formats the container can't decode.
    """
    if decoder is None:
        return _resize_media_native(df, max_dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = dict(r["meta"]) if r["meta"] is not None else {}
                w, h = meta.get("width") or 0, meta.get("height") or 0
                scale = min(1.0, max_dim / max(w, h, 1))
                new_w, new_h = int(w * scale), int(h * scale)
                content = bytes(r["content"]) if r["content"] is not None else b""
                new_len = max(1, int(len(content) * scale * scale)) if content else 0
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "meta": {**meta, "width": new_w, "height": new_h},
                        "content": content[:new_len],
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "meta", "content"])

    return df.mapInPandas(run, MEDIA_SCHEMA)


def _resize_media_native(df: DataFrame, max_dim: int) -> DataFrame:
    """Real decode -> downscale -> re-encode path (BMP in/out; audio
    and null-content rows untouched)."""
    from .media_codecs import encode_bmp, resize_image_nn, sniff_and_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = dict(r["meta"]) if r["meta"] is not None else {}
                content = bytes(r["content"]) if r["content"] is not None else None
                if content:
                    decoded = sniff_and_decode(content)
                    if decoded["kind"] == "image":
                        resized = resize_image_nn(decoded, max_dim)
                        content = encode_bmp(
                            resized["width"], resized["height"], resized["payload"]
                        )
                        meta = {
                            **meta,
                            "width": resized["width"],
                            "height": resized["height"],
                        }
                rows.append({"media_id": r["media_id"], "meta": meta, "content": content})
            yield pd.DataFrame(rows, columns=["media_id", "meta", "content"])

    return df.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Video -> frame-timestamp plan (pure expressions: no decode
    needed to *plan* sampling). explode(sequence(...)) per media row."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long")),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
