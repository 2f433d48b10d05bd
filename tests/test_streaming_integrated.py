"""VERDICT r1 item 8: ONE integrated Structured Streaming run —
availableNow through streaming/windows.py, the K7-style metadata
listener attached, a real (parquet) sink — asserted EQUAL to the batch
answer on the same data."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.streaming.listener import MetadataStreamListener
from open_data_pipelines_spark.streaming.windows import (
    drain_to_parquet,
    read_event_stream,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def test_available_now_run_with_listener_equals_batch(spark, tmp_path):
    events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    src = str(tmp_path / "landing")
    # two files -> availableNow still sees one logical backlog
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    n_events = events.count()

    log_path = str(tmp_path / "stream_logs")
    out_path = str(tmp_path / "tumbling_table")
    listener = MetadataStreamListener(spark, log_path)
    spark.streams.addListener(listener)
    try:
        stream = tumbling_counts(read_event_stream(spark, src, events.schema))
        drain_to_parquet(stream, out_path, str(tmp_path / "ckpt"))

        # --- result parity: drained stream == batch, exactly ------------
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.read.parquet(out_path).collect()
        }
        batch = (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        )
        expect = {(r["w"]["start"], r["event_type"]): (r["n"], r["s"]) for r in batch}
        assert set(got) == set(expect)
        for k, (n, s) in expect.items():
            assert got[k][0] == n
            assert abs(got[k][1] - s) < 1e-6

        # --- K7-style metadata: lifecycle rows with true row counts -----
        logs = None
        for _ in range(40):  # listener callbacks are async
            time.sleep(0.5)
            try:
                logs = spark.read.parquet(log_path)
                if logs.filter(F.col("event") == "TERMINATED").count() >= 1:
                    break
            except Exception:
                continue
        assert logs is not None
        evs = {r["event"] for r in logs.select("event").distinct().collect()}
        assert {"STARTED", "PROGRESS", "TERMINATED"} <= evs
        prog = logs.filter(F.col("event") == "PROGRESS").collect()
        assert sum(r["num_input_rows"] or 0 for r in prog) == n_events
        assert any(r["watermark"] for r in prog), "event-time watermark not recorded"
    finally:
        spark.streams.removeListener(listener)


def test_session_window_stream_equals_batch(spark, tmp_path):
    """VERDICT r2 item 5: session-gap windows with watermark, drained
    availableNow in APPEND mode (the one windowing family that had no
    streaming-mode proof), asserted equal to the batch session
    aggregation on the same data.

    Append mode only emits a session once the watermark passes its
    close, so a single far-future sentinel event (excluded from the
    comparison) pushes the global watermark beyond every real
    session's end before the stream terminates.
    """
    from open_data_pipelines_spark.streaming.windows import sessionized_counts

    events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    gap, delay = "30 minutes", "2 hours"

    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    sentinel = spark.createDataFrame(
        [(int(-1), int(-1), "FLUSH", 0.0, max_ts)],
        schema=events.select("event_id", "user_id", "event_type", "value", "ts").schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 27 HOURS"))

    src = str(tmp_path / "landing")
    events.select(sentinel.columns).write.parquet(src)
    sentinel.write.mode("append").parquet(src)

    stream = sessionized_counts(
        read_event_stream(spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1),
        gap=gap,
        watermark=delay,
    )
    out = str(tmp_path / "sessions_table")
    drain_to_parquet(stream, out, str(tmp_path / "ckpt_sessions"), output_mode="append")

    got = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in spark.read.parquet(out).filter(F.col("user_id") >= 0).collect()
    }
    batch = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expect = {(r["w"]["start"], r["user_id"]): r["n"] for r in batch}
    assert got == expect


def test_exactly_once_month_partitions_survive_batch_replay(spark, tmp_path):
    """The __batch_id dynamic-overwrite sink must make replayed batches
    idempotent: re-delivering a batch (the crash-between-write-and-
    checkpoint case foreachBatch can produce) leaves row counts
    unchanged, while the plain append sink would duplicate."""
    from open_data_pipelines_spark.streaming.windows import (
        stream_to_month_partitions_exactly_once,
    )

    events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    src = str(tmp_path / "landing")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    wh = str(tmp_path / "wh")
    stream = read_event_stream(
        spark, src, events.schema, max_files_per_trigger=1  # force >=2 batches
    )
    q = stream_to_month_partitions_exactly_once(stream, wh, str(tmp_path / "ckpt"))
    q.awaitTermination()

    table = spark.read.parquet(wh)
    n = events.count()
    assert table.count() == n
    batch_ids = sorted(r["__batch_id"] for r in table.select("__batch_id").distinct().collect())
    assert len(batch_ids) >= 2  # maxFilesPerTrigger split the backlog

    # simulate the failure-replay: re-run batch 0's write with the same
    # batch_id and the same rows (exactly what foreachBatch re-delivers).
    # Materialized first — the real sink writes from the SOURCE stream,
    # never from the warehouse it overwrites (self-read hazard).
    replay = (
        table.filter(F.col("__batch_id") == batch_ids[0])
        .drop("year", "month", "__batch_id")
        .localCheckpoint(eager=True)
    )
    (
        replay.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("__batch_id", F.lit(batch_ids[0]))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("year", "month", "__batch_id")
        .parquet(wh)
    )
    assert spark.read.parquet(wh).count() == n  # no duplicates after replay
    # month-level contents still equal the batch ingest
    got = {
        (r["year"], r["month"]): r["n"]
        for r in spark.read.parquet(wh).groupBy("year", "month").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expect = {
        (r["year"], r["month"]): r["n"]
        for r in events.select(F.year("ts").alias("year"), F.month("ts").alias("month"))
        .groupBy("year", "month").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect
