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
