"""SCD2 semantics tests mirroring the reference's Section 58 cases
(FIXTURES.md F8: unchanged / changed / brand-new / out-of-order)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.scd2 import (
    SENTINEL_TS,
    scd2_initial_load,
    scd2_merge,
    with_surrogate_keys,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 10)
T2 = dt.datetime(2024, 2, 1)


def _staging(spark, rows):
    return spark.createDataFrame(rows, ["entity", "status", "ts", "event_ref"])


def test_scd2_full_lifecycle(spark):
    batch1 = _staging(
        spark,
        [
            ("a", "open", T0, 1),
            ("a", "active", T1, 2),  # latest for a
            ("b", "open", T0, 3),
            ("c", "open", T1, 4),
        ],
    )
    dim = scd2_initial_load(batch1, "entity", "ts", ["status"], ["status"], ["event_ref"])
    assert dim.count() == 3
    assert dim.filter(F.col("entity") == "a").collect()[0]["status"] == "active"

    batch2 = _staging(
        spark,
        [
            ("a", "closed", T2, 5),  # changed, newer -> new version
            ("b", "open", T2, 6),  # newer but same hash -> untouched
            ("c", "stale", T0, 7),  # OLDER than dim (late event) -> must NOT fire
            ("d", "open", T2, 8),  # brand new entity
        ],
    )
    out = with_surrogate_keys(
        scd2_merge(dim, batch2, "entity", "ts", ["status"], ["status"], ["event_ref"]),
        ["entity", "valid_from"],
    ).cache()

    rows = {(r["entity"], r["is_current"]): r for r in out.collect()}
    assert out.count() == 5  # a(old)+a(new)+b+c+d

    closed = rows[("a", False)]
    assert closed["status"] == "active" and closed["valid_to"] == T2
    assert rows[("a", True)]["status"] == "closed"
    assert rows[("b", True)]["status"] == "open"
    # late event guard: c keeps original version + validity
    c = rows[("c", True)]
    assert c["status"] == "open" and str(c["valid_to"]) == SENTINEL_TS
    assert rows[("d", True)]["status"] == "open"
    # surrogate keys sequential + unique
    keys = sorted(r["surrogate_key"] for r in out.collect())
    assert keys == list(range(1, 6))


def test_scd2_merge_idempotent_when_no_changes(spark):
    batch = _staging(spark, [("a", "open", T0, 1)])
    dim = scd2_initial_load(batch, "entity", "ts", ["status"], ["status"], ["event_ref"])
    out = scd2_merge(dim, batch, "entity", "ts", ["status"], ["status"], ["event_ref"])
    assert out.count() == 1
    assert out.filter(F.col("is_current")).count() == 1
