"""Stream-stream interval join: availableNow drain equals the batch
interval join on the same events (purchases x errors per user within
±10 minutes), and the unbounded-state misuse is rejected by Spark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.streaming.joins import interval_join
from open_data_pipelines_spark.streaming.windows import (
    drain_to_parquet,
    read_event_stream,
)
from tests.conftest import SF_SMOKE


def _sides(spark):
    ev = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    return purchases, errors


def test_stream_join_equals_batch(spark, tmp_path):
    purchases, errors = _sides(spark)
    lp, rp = str(tmp_path / "purchases"), str(tmp_path / "errors")
    # one file per side -> one availableNow batch: nothing can fall
    # behind the watermark mid-drain, so parity must be exact
    purchases.coalesce(1).write.parquet(lp)
    errors.coalesce(1).write.parquet(rp)

    joined_stream = interval_join(
        read_event_stream(spark, lp, purchases.schema),
        read_event_stream(spark, rp, errors.schema),
        on="user_id",
    )
    out = str(tmp_path / "joined")
    drain_to_parquet(joined_stream, out, str(tmp_path / "ckpt"), output_mode="append")
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.read.parquet(out).collect()
    }

    batch = interval_join(purchases, errors, on="user_id")
    want = {(r["event_id"], r["event_id_r"]) for r in batch.collect()}
    assert want, "harness produced no purchase-error pairs to join"
    assert got == want


def test_batch_interval_semantics(spark):
    purchases, errors = _sides(spark)
    got = interval_join(purchases, errors, on="user_id").collect()
    for r in got:
        assert r["user_id"] == r["user_id_r"]
        delta_s = (r["ts_r"] - r["ts"]).total_seconds()
        assert -600 <= delta_s <= 600


def test_outer_join_without_time_bound_rejected(spark, tmp_path):
    """Outer stream-stream joins need the interval bound to know when
    an unmatched row is final; Spark must refuse one without it (inner
    joins it merely lets accumulate state — the docstring caveat in
    :mod:`streaming.joins`)."""
    purchases, errors = _sides(spark)
    lp, rp = str(tmp_path / "p2"), str(tmp_path / "e2")
    purchases.coalesce(1).write.parquet(lp)
    errors.coalesce(1).write.parquet(rp)
    ls = read_event_stream(spark, lp, purchases.schema).withWatermark("ts", "30 minutes")
    rs = (
        read_event_stream(spark, rp, errors.schema)
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("ts_r"),
            F.col("event_id").alias("event_id_r"),
        )
    )
    unbounded = ls.join(rs, F.col("user_id") == F.col("user_id_r"), "left_outer")
    with pytest.raises(AnalysisException):
        (
            unbounded.writeStream.format("memory")
            .queryName("unbounded_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
