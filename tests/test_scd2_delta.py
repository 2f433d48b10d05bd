"""The MERGE-shaped (Delta) SCD2 path must produce the same dimension
as the oracle-checked join-based rewrite.

delta-spark is absent from this container, so the MERGE semantics are
executed by the pure-DataFrame simulator (which mirrors the branches
``scd2_merge_delta`` hands to DeltaTable); the real-engine test skips
unless delta is importable, flipping on automatically the moment the
environment grows it.

Round-12 status: re-checked — ``import delta`` still fails, and the
build environment forbids installing packages, so the blocker stands
as environmental, not code. Nothing to do here until the container
ships delta-spark; this file needs no change when it does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.scd2 import scd2_initial_load, scd2_merge
from open_data_pipelines_spark.operators.scd2_delta import (
    DeltaUnavailableError,
    build_staged_updates,
    scd2_merge_delta,
    simulate_merge,
)
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE

ATTRS = ["event_type", "props", "value"]
HASH_COLS = ["event_type", "props"]


def _canon(df):
    return sorted(
        (
            r["user_id"],
            r["event_type"],
            r["props"],
            r["value"],
            r["event_time"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
            r["record_hash"],
        )
        for r in df.collect()
    )


def _batches(spark):
    events = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    return (
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
    )


def test_merge_shaped_path_matches_rewrite(spark):
    batch1, batch2 = _batches(spark)
    dim = scd2_initial_load(batch1, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])
    generic = scd2_merge(dim, batch2, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])

    staged = build_staged_updates(
        dim, batch2, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"]
    )
    merged = simulate_merge(dim, staged, "user_id")
    assert _canon(generic) == _canon(merged)


def test_staged_updates_shape(spark):
    """Changed entities ride twice (keyed + NULL-key); everything else
    exactly once."""
    batch1, batch2 = _batches(spark)
    dim = scd2_initial_load(batch1, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])
    staged = build_staged_updates(
        dim, batch2, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"]
    )
    counts = (
        staged.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count("__mergekey").alias("n_keyed"),
        )
        .collect()
    )
    for r in counts:
        assert r["n_keyed"] == 1, "every entity needs exactly one keyed copy"
        assert r["n"] in (1, 2)


def test_delta_gate_raises_cleanly(spark):
    try:
        import delta  # noqa: F401

        pytest.skip("delta present - gate cannot fire")
    except ImportError:
        pass
    batch1, batch2 = _batches(spark)
    with pytest.raises(DeltaUnavailableError):
        scd2_merge_delta(
            spark, "/tmp/does-not-matter", batch2, "user_id", "ts", ATTRS, HASH_COLS
        )


def test_delta_real_engine(spark, tmp_path):
    delta = pytest.importorskip("delta")  # noqa: F841 - skip w/o delta-spark
    batch1, batch2 = _batches(spark)
    dim = scd2_initial_load(batch1, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])
    path = str(tmp_path / "dim_delta")
    dim.write.format("delta").save(path)
    scd2_merge_delta(spark, path, batch2, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])
    merged = spark.read.format("delta").load(path)
    generic = scd2_merge(dim, batch2, "user_id", "ts", ATTRS, HASH_COLS, ["event_id"])
    assert _canon(generic) == _canon(merged)
