"""Event-time windowed aggregation over streams.

Batch/stream parity: the same ``F.window`` expressions back both the
batch driver queries (``queries/streaming_q.py``) and these streaming
pipelines, so results converge to the batch answer once the stream
drains (verified in tests with ``trigger(availableNow=True)``).

Scale notes: watermarks bound state (late events beyond the watermark
are dropped — the reference's late-event policy I4 is 'latest wins',
which the SCD2 path handles; here lateness is bounded explicitly);
state store partitioning follows ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_event_stream(
    spark,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival source — the streaming analog of the reference's
    monthly-drop ingest (new files in a landing dir = new micro-batch).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per key — no reference counterpart;
    idiomatic-Spark extension."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: duplicates of a key arriving within the
    watermark horizon are dropped; state is bounded by the watermark
    (vs. unbounded ``dropDuplicates``). The streaming analog of the
    reference's idempotent re-load semantics (I2/I4)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def stream_to_month_partitions(
    stream: DataFrame,
    warehouse_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    """foreachBatch sink: derive (year, month) from event time and
    append each micro-batch into the SAME partitioned warehouse table
    the batch pipelines write — streaming and batch ingest converge on
    one layout.

    Delivery is AT-LEAST-ONCE: a failure between the parquet append
    and the checkpoint commit re-runs the batch and re-appends its
    rows. For exactly-once either dedup upstream
    (:func:`dedup_within_watermark` on a natural key) or write to a
    transactional sink (Delta with txnAppId/txnVersion).
    """
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("year", F.year(ts_col))
            .withColumn("month", F.month(ts_col))
            .write.mode("append")
            .partitionBy("year", "month")
            .parquet(warehouse_path)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_month_partitions_exactly_once(
    stream: DataFrame,
    warehouse_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    """Effectively-once variant of :func:`stream_to_month_partitions`
    on plain parquet (no transactional format needed).

    Mechanism: each micro-batch writes under an extra ``__batch_id``
    partition column with DYNAMIC partition overwrite. foreachBatch
    guarantees a replayed batch carries the same batch_id and the same
    rows, so a crash between the data write and the checkpoint commit
    re-runs the batch and *overwrites its own partitions* instead of
    appending duplicates — idempotent replay == exactly-once effective
    output. Readers prune or drop ``__batch_id``; compaction
    (``sinks.writers.compact_partitions``) folds it away entirely.
    """
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("year", F.year(ts_col))
            .withColumn("month", F.month(ts_col))
            .withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("year", "month", "__batch_id")
            .parquet(warehouse_path)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def drain_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    output_mode: str = "complete",
):
    """availableNow drain of a (windowed-aggregate) stream into a
    parquet table.

    Complete-mode aggregations have no native file sink, so each
    micro-batch idempotently overwrites the output (the streaming
    analog of the reference's CREATE OR REPLACE month table, I2); the
    checkpoint dir gives exactly-once across restarts (K7/I3 pairing:
    attach :class:`..streaming.listener.MetadataStreamListener` for
    the per-batch metadata rows).

    Mode-aware writer: ``complete`` batches carry the full result, so
    overwrite is correct; ``append`` batches carry only newly-finalized
    windows, so they must be *appended* (overwriting would keep only
    the last micro-batch when availableNow splits the backlog).
    ``update`` batches carry only changed groups — neither overwrite
    nor append yields a consistent file table, so it is rejected
    (a transactional MERGE sink is required for update mode).
    Append-mode delivery is AT-LEAST-ONCE across crash-restarts (same
    caveat as :func:`stream_to_month_partitions`); complete-mode
    overwrite stays idempotent.
    """
    if output_mode not in ("complete", "append"):
        raise ValueError(
            f"drain_to_parquet supports output_mode 'complete' or 'append', "
            f"got {output_mode!r} (update-mode batches only contain changed "
            f"groups; a plain file sink cannot merge them)"
        )
    file_mode = "overwrite" if output_mode == "complete" else "append"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode(file_mode).parquet(out_path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain the stream with availableNow into an in-memory table —
    the test harness analog of the reference's in-memory-DuckDB
    substitution pattern (SURVEY.md §5)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
