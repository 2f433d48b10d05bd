"""Streaming incremental dedup: admit only never-seen-before rows
from a document stream, maintaining the durable seen-signature index
of :mod:`..operators.incremental_dedup` (engine extension; the
streaming twin of the batch entry point, like
:mod:`.ivf_stream` / :mod:`.media_stream`).

Each micro-batch probes the index, commits its ADMITTED OUTPUT first
(a per-batch subdirectory of ``out_path`` — a plain append would
duplicate rows on replay, an overwrite cannot), and only then
publishes the index's ``batch=<id>`` segment, DERIVED from that
committed output. Output-first makes the output the source of truth
across every crash interleaving:

- crash before the output commits → replay finds no committed
  output, re-probes (its own index segment, if any, is excluded by
  batch id) and rewrites both — idempotent;
- crash after the output commits but before the index segment lands
  → replay sees the committed output, SKIPS the probe (so a
  compaction that ran in between cannot make the batch see its own
  signatures and emit empty — the round-10 review find), and REPAIRS
  the missing index segment from the committed output;
- both committed → replay is a no-op.

The ``batch=<id>`` output keying is only meaningful within ONE
checkpoint lineage: a fresh checkpoint restarts batch ids at 0, and
if the source has since grown (or batch boundaries shifted), id N
names DIFFERENT content than the committed ``out/batch=N`` — the
skip would then silently drop the new content. ``out_path`` and
``checkpoint_dir`` therefore live and die together, and the wrapper
REFUSES to start a fresh checkpoint against a non-empty output
(reset both, or resume the existing checkpoint; the same
generation-mismatch posture as :mod:`.scd2_stream`'s
``on_log_ahead``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.incremental_dedup import (
    _BATCH_PREFIX,
    batch_segment_ids,
    content_signature,
    dedup_against_index,
    has_batch_segment,
    publish_batch_signatures,
)
from ..operators.index_commit import _hadoop_fs, _is_complete


def _checkpoint_is_fresh(spark, checkpoint_dir: str) -> bool:
    fs, hp = _hadoop_fs(spark, checkpoint_dir)
    return not fs.exists(hp(checkpoint_dir.rstrip("/") + "/offsets"))


def _committed_out_dirs(spark, out_path: str) -> list[str]:
    """Output batch directories whose write COMMITTED (``_SUCCESS``
    landed) — a torn write's visible part files are not admitted
    output, the same completeness rule as the index's segments."""
    base = out_path.rstrip("/")
    fs, hp = _hadoop_fs(spark, base)
    if not fs.exists(hp(base)):
        return []
    out = []
    for status in fs.listStatus(hp(base)):
        name = status.getPath().getName()
        if (
            status.isDirectory()
            and name.startswith(_BATCH_PREFIX)
            and _is_complete(fs, hp, base + "/" + name)
        ):
            out.append(base + "/" + name)
    return sorted(out)


def _start_output_first_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    admit,
    publish_from_output,
    trigger_once: bool,
):
    """The shared output-first foreachBatch skeleton (module
    docstring): fresh-lineage guards, committed-output replay skip +
    index-segment repair, admit -> commit output -> publish index.
    ``admit(spark, batch_df, batch_id) -> DataFrame`` probes the index
    WITHOUT publishing; ``publish_from_output(out_df, batch_id)``
    derives and publishes the index segment from committed output."""
    spark = stream.sparkSession
    if _checkpoint_is_fresh(spark, checkpoint_dir):
        if _committed_out_dirs(spark, out_path):
            raise RuntimeError(
                f"dedup stream: fresh checkpoint {checkpoint_dir!r} against a "
                f"non-empty output {out_path!r} — batch ids would restart at 0 "
                "and the committed-output skip would silently drop any content "
                "whose batch boundaries differ from the original run. Reset the "
                "output together with the checkpoint, or resume the existing "
                "checkpoint."
            )
        if batch_segment_ids(spark, index_path):
            # a new lineage's ids 0..N would OVERWRITE same-numbered
            # index segments from a previous lineage (or the batch
            # API), silently erasing their membership (round-10
            # review find). Compaction absorbs batch segments into a
            # base generation, after which any lineage can start.
            raise RuntimeError(
                f"dedup stream: fresh checkpoint {checkpoint_dir!r} but the "
                f"index at {index_path!r} holds batch segments from another "
                "lineage — this stream's restarted batch ids would overwrite "
                "them and erase their membership. Run THIS index's own "
                "compaction (compact_seen_index / compact_band_index / "
                "compact_media_band_index — match it to the index layout) "
                "first, then start."
            )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = f"{out_path.rstrip('/')}/{_BATCH_PREFIX}{batch_id}"
        fs, hp = _hadoop_fs(spark, target)
        if _is_complete(fs, hp, target):
            # replay of a fully-output batch: never re-probe (a
            # compaction may have absorbed this batch's index segment,
            # making its own signatures look already-seen); repair the
            # index segment from the committed output if the crash
            # fell between the two writes
            if not has_batch_segment(spark, index_path, batch_id):
                publish_from_output(spark.read.parquet(target), batch_id)
            return
        fresh = admit(spark, batch_df, batch_id)
        fresh.write.mode("overwrite").parquet(target)
        publish_from_output(spark.read.parquet(target), batch_id)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_to_parquet(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str,
    id_col: str,
    *,
    n_buckets: int = 256,
    normalize: bool = True,
    fast: bool = True,
    trigger_once: bool = True,
):
    """Start the EXACT dedup stream; returns the StreamingQuery.

    ``trigger_once`` runs one drain-the-source pass (the test/batch-
    cron mode); pass False for a continuous micro-batch stream.
    """
    sig = content_signature(text_col, normalize=normalize, fast=fast)

    def admit(spark, batch_df: DataFrame, batch_id: int) -> DataFrame:
        return dedup_against_index(
            spark,
            batch_df,
            index_path,
            sig,
            id_col,
            n_buckets=n_buckets,
            batch_id=batch_id,
            update=False,
        )

    def publish_from_output(out_df: DataFrame, batch_id: int) -> None:
        publish_batch_signatures(
            out_df, index_path, sig, batch_id, n_buckets=n_buckets
        )

    return _start_output_first_stream(
        stream, index_path, out_path, checkpoint_dir, admit,
        publish_from_output, trigger_once,
    )


def stream_near_dedup_to_parquet(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    fast: bool = True,
    min_agreement: float | None = None,
    n_buckets: int = 256,
    trigger_once: bool = True,
):
    """Start the NEAR-dup admission stream (VERDICT r10 task #4):
    each micro-batch is admitted through
    :func:`..operators.minhash_index.near_dedup_against_index` — a
    document is rejected when it shares an LSH band (optionally
    verified by minhash agreement >= ``min_agreement``) with an
    already-admitted document, or loses the within-batch cluster
    keeper — under the exact crash protocol of
    :func:`stream_dedup_to_parquet` (output-first, replay skip,
    index-segment repair from committed output). Greedy-vs-batch
    semantics are in :mod:`..operators.minhash_index`'s docstring."""
    from ..operators.minhash_index import (
        near_dedup_against_index,
        publish_band_rows,
    )

    def admit(spark, batch_df: DataFrame, batch_id: int) -> DataFrame:
        return near_dedup_against_index(
            spark,
            batch_df,
            index_path,
            text_col,
            id_col,
            n=n,
            k=k,
            bands=bands,
            fast=fast,
            min_agreement=min_agreement,
            n_buckets=n_buckets,
            batch_id=batch_id,
            update=False,
        )

    def publish_from_output(out_df: DataFrame, batch_id: int) -> None:
        publish_band_rows(
            out_df, index_path, text_col, id_col, batch_id,
            n=n, k=k, bands=bands, fast=fast, n_buckets=n_buckets,
        )

    return _start_output_first_stream(
        stream, index_path, out_path, checkpoint_dir, admit,
        publish_from_output, trigger_once,
    )


def stream_media_near_dedup_to_parquet(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    sig_col: str,
    id_col: str,
    kind_col: str,
    *,
    band_bits: int = 8,
    max_hamming: int = 6,  # the batch media funnel threshold — online == batch standard
    n_buckets: int = 256,
    trigger_once: bool = True,
):
    """The MEDIA twin of :func:`stream_near_dedup_to_parquet`: each
    micro-batch is admitted through
    :func:`..operators.media_band_index.near_dedup_media_against_index`
    — a media item is rejected when its 64-bit perceptual signature is
    within ``max_hamming`` of an already-admitted item of the same
    kind (Hamming-band probe + exact verification), or loses the
    per-kind within-batch cluster keeper — under the same output-first
    crash protocol. The incoming stream must already carry
    ``kind_col`` + ``sig_col`` (the bronze form
    :func:`.media_stream.with_media_signature` produces on arrival);
    NULL-signature quarantine rows always pass."""
    from ..operators.media_band_index import (
        near_dedup_media_against_index,
        publish_media_band_rows,
    )

    def admit(spark, batch_df: DataFrame, batch_id: int) -> DataFrame:
        return near_dedup_media_against_index(
            spark,
            batch_df,
            index_path,
            sig_col,
            id_col,
            kind_col,
            band_bits=band_bits,
            max_hamming=max_hamming,
            n_buckets=n_buckets,
            batch_id=batch_id,
            update=False,
        )

    def publish_from_output(out_df: DataFrame, batch_id: int) -> None:
        publish_media_band_rows(
            out_df, index_path, sig_col, id_col, kind_col, batch_id,
            band_bits=band_bits, n_buckets=n_buckets,
        )

    return _start_output_first_stream(
        stream, index_path, out_path, checkpoint_dir, admit,
        publish_from_output, trigger_once,
    )


def read_admitted(spark, out_path: str) -> DataFrame:
    """All admitted rows across COMMITTED batches (a torn write's
    visible part files are not admitted output — round-10 review
    find)."""
    dirs = _committed_out_dirs(spark, out_path)
    if not dirs:
        raise FileNotFoundError(
            f"no committed admitted output under {out_path!r} "
            "(no _SUCCESS-marked batch directory)"
        )
    return spark.read.parquet(*dirs)
