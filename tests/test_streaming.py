"""Streaming parity tests: drained streams must agree with the batch
computation on the same data (reference-style in-memory substitution,
SURVEY.md §5)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.streaming.windows import (
    read_event_stream,
    run_to_memory,
    sessionized_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_landing(spark):
    events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    d = tempfile.mkdtemp(prefix="events_landing_")
    # two "monthly drop" files — two micro-batches with availableNow
    events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(f"{d}/b0")
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(f"{d}/b0")
    yield f"{d}/b0", events


def test_tumbling_stream_matches_batch(spark, events_landing):
    path, events = events_landing
    stream = read_event_stream(spark, path, events.schema)
    # complete mode: append would withhold windows newer than the final
    # watermark (max event time - 2h) when the stream drains
    run_to_memory(tumbling_counts(stream), "tumbling_out", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("tumbling_out").collect()
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


def test_session_windows_drain(spark, events_landing):
    path, events = events_landing
    stream = read_event_stream(spark, path, events.schema)
    run_to_memory(sessionized_counts(stream, gap="10 minutes"), "sessions_out", "complete")
    out = spark.table("sessions_out")
    assert out.count() > 0
    bad = out.filter(F.col("session_end") < F.col("session_start"))
    assert bad.count() == 0
    # session totals preserve event counts per user
    totals = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    }
    expect = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert totals == expect


def test_latest_state_per_key(spark, events_landing):
    from open_data_pipelines_spark.streaming.stateful import latest_state_per_key

    path, events = events_landing
    stream = read_event_stream(spark, path, events.schema, max_files_per_trigger=1).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "props",
    )
    run_to_memory(latest_state_per_key(stream), "latest_out", "update")
    # last emitted row per key must equal the batch latest
    out = spark.table("latest_out")
    got = {
        r["user_id"]: r["ts_us"]
        for r in out.groupBy("user_id").agg(F.max("ts_us").alias("ts_us")).collect()
    }
    expect = {
        r["user_id"]: r["m"]
        for r in events.groupBy("user_id").agg(F.max(F.unix_micros("ts")).alias("m")).collect()
    }
    assert got == expect
