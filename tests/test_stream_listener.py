from __future__ import annotations

import time

from pyspark.sql import functions as F

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.streaming.listener import MetadataStreamListener
from open_data_pipelines_spark.streaming.windows import read_event_stream, run_to_memory
from tests.conftest import SF_SMOKE


def test_listener_logs_lifecycle(spark, tmp_path):
    log_path = str(tmp_path / "stream_logs")
    listener = MetadataStreamListener(spark, log_path)
    spark.streams.addListener(listener)
    try:
        events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
        src = str(tmp_path / "src")
        events.limit(500).write.parquet(src)
        stream = read_event_stream(spark, src, events.schema).groupBy("event_type").count()
        run_to_memory(stream, "listener_out", "complete")
        # listener callbacks are async — allow them to drain
        for _ in range(40):
            time.sleep(0.5)
            try:
                logs = spark.read.parquet(log_path)
                if logs.filter(F.col("event") == "TERMINATED").count() >= 1:
                    break
            except Exception:
                continue
        logs = spark.read.parquet(log_path)
        evs = {r["event"] for r in logs.select("event").distinct().collect()}
        assert {"STARTED", "PROGRESS", "TERMINATED"} <= evs
        prog = logs.filter(F.col("event") == "PROGRESS").collect()
        assert sum(r["num_input_rows"] or 0 for r in prog) == 500
        assert all(r["query_id"] for r in logs.collect())
    finally:
        spark.streams.removeListener(listener)
