"""Streaming media ingest (engine extension): the multimodal
counterpart of :mod:`.corpus_stream` — crawl drops of media files land
continuously, and the streaming-safe work happens ON ARRIVAL:

- decode + perceptual signature (aHash for images, energy-delta
  fingerprint for audio) in one Arrow-batched pass — a pure map, so
  it is streaming-safe;
- EXACT-signature dedup via ``dropDuplicatesWithinWatermark`` keyed
  on (kind, signature) — identical re-encodes collapse at the door,
  state bounded by the watermark horizon;
- NEAR-dup (Hamming > 0) needs the banded self-join Structured
  Streaming cannot run — deferred to batch compaction over bronze via
  :func:`..operators.image_dedup.dedup_images` /
  :func:`..operators.audio_dedup.dedup_audio`, exactly the
  stream-then-compact layout the text funnel uses.

Bronze rows carry (media_id, kind, signature, meta, content,
ingest_ts): the signature column is what the batch compaction bands
on — it never recomputes pixels it already paid for on arrival.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.audio_dedup import audio_fingerprint
from ..operators.image_dedup import average_hash
from ..operators.media_codecs import sniff_and_decode


def with_media_signature(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """``kind`` + ``signature`` columns appended — one decode per row
    dispatching to the right perceptual hash, carrying every input
    column through the SAME ``mapInPandas`` pass (no self-join, so it
    is legal on streaming frames too)."""
    dec = decoder or sniff_and_decode
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, sigs = [], []
            for content in pdf[content_col]:
                kind, sig = None, None
                try:
                    decoded = dec(bytes(content) if content is not None else b"")
                    kind = decoded.get("kind")
                    if kind == "image":
                        sig = average_hash(decoded)
                    elif kind == "audio":
                        sig = audio_fingerprint(decoded)
                except Exception:
                    kind, sig = None, None
                kinds.append(kind)
                sigs.append(sig)
            out = pdf[in_cols].copy()
            out["kind"] = kinds
            out["signature"] = pd.array(sigs, dtype="Int64")
            yield out

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("kind", T.StringType()), T.StructField("signature", T.LongType())]
    )
    return df.mapInPandas(run, schema)


def streaming_media_bronze(
    stream: DataFrame,
    dedup_watermark: str = "24 hours",
    decoder: Callable[[bytes], dict] | None = None,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """The streaming-safe media funnel prefix: signature on arrival,
    exact-signature dedup within the watermark horizon. Undecodable
    rows (NULL signature) pass through — the batch compaction
    quarantines them by policy, mirroring the text funnel's split of
    cheap-on-arrival vs global-in-batch work. ``id_col`` names the
    per-row unique id used as the undecodable-row dedup key, mirroring
    ``content_col`` on :func:`with_media_signature` so streams with
    differently-named columns work end to end."""
    signed = with_media_signature(stream, content_col=content_col, decoder=decoder).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    # ONE dedup key over the whole stream (a decodable/undecodable
    # filter-union would re-execute the decode+hash mapInPandas
    # subtree once per branch — doubling the dominant per-row cost):
    # decodable rows key on (kind, signature); undecodable rows get a
    # per-row unique key so null signatures never collapse together
    # the undecodable branch must stay per-row-unique even when the id
    # itself is NULL: F.concat is null-propagating, so a NULL id made
    # the whole key NULL and dropDuplicatesWithinWatermark collapsed
    # every null-id undecodable row into one (round-9 review find) —
    # null ids fall back to a per-row uuid (nondeterministic, so a
    # replayed null-id row is not deduped: at-least-once into the
    # quarantine, the honest posture for rows with no identity)
    dedup_key = F.when(
        F.col("signature").isNotNull(),
        F.concat_ws(":", F.col("kind"), F.col("signature").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("undecodable:"),
            F.coalesce(F.col(id_col).cast("string"), F.expr("uuid()")),
        )
    )
    return (
        signed.withColumn("__dk", dedup_key)
        .withWatermark("ingest_ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["__dk"])
        .drop("__dk")
    )


def stream_media_to_bronze(
    stream: DataFrame,
    bronze_path: str,
    checkpoint_dir: str,
    **funnel_kwargs,
):
    """availableNow drain into the bronze directory the batch near-dup
    compaction (dedup_images / dedup_audio over the signature column)
    later reads — same at-least-once append posture as the text
    bronze."""
    bronze = streaming_media_bronze(stream, **funnel_kwargs)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(bronze_path)

    return (
        bronze.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_media_with_near_dedup(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    decoder=None,
    content_col: str = "content",
    id_col: str = "media_id",
    dedup_watermark: str = "24 hours",
    **near_kwargs,
):
    """Online-admission variant of the media funnel (round 11 — the
    multimodal twin of
    :func:`.corpus_stream.stream_corpus_with_near_dedup`): the
    streaming-safe prefix (perceptual signature on arrival +
    watermarked exact-signature dedup) feeds
    :func:`.dedup_stream.stream_media_near_dedup_to_parquet`, so
    perceptual near-duplicates of previously ADMITTED media are
    rejected at ingest against the persisted Hamming band index
    instead of waiting for batch compaction. ``near_kwargs`` pass
    through (band_bits / max_hamming / ...); quarantine rows (NULL
    signature) are admitted, to be split off by batch policy. Returns
    the StreamingQuery; read results with
    :func:`.dedup_stream.read_admitted`."""
    from .dedup_stream import stream_media_near_dedup_to_parquet

    bronze = streaming_media_bronze(
        stream,
        dedup_watermark=dedup_watermark,
        decoder=decoder,
        content_col=content_col,
        id_col=id_col,
    )
    return stream_media_near_dedup_to_parquet(
        bronze, index_path, out_path, checkpoint_dir,
        "signature", id_col, "kind", **near_kwargs,
    )
