from __future__ import annotations

import datetime as dt

from open_data_pipelines_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    probe = spark.createDataFrame(
        [(1, _ts(5), "p1"), (1, _ts(10), "p2"), (1, _ts(2), "p0"), (2, _ts(5), "q1")],
        ["k", "ts", "name"],
    )
    state = spark.createDataFrame(
        [(1, _ts(3), "A"), (1, _ts(5), "B"), (1, _ts(8), "C")],
        ["k", "ts", "st"],
    )
    out = {r["name"]: r["st_asof"] for r in asof_join(probe, state, "k", "ts", ["st"]).collect()}
    assert out["p0"] is None  # before any state
    assert out["p1"] == "B"  # state at exactly t IS visible (ties: state first)
    assert out["p2"] == "C"  # latest earlier state
    assert out["q1"] is None  # key with no state rows


def test_asof_null_state_value_matches_not_skips(spark):
    # a right row whose VALUE is NULL still matches (DuckDB ASOF
    # semantics) — the carry must not skip it and resurrect older state
    probe = spark.createDataFrame([(1, _ts(9), "p")], ["k", "ts", "name"])
    state = spark.createDataFrame(
        [(1, _ts(1), "old", "x1"), (1, _ts(5), None, "x2")],
        ["k", "ts", "st", "aux"],
    )
    row = asof_join(probe, state, "k", "ts", ["st", "aux"]).collect()[0]
    assert row["st_asof"] is None  # NOT 'old'
    assert row["aux_asof"] == "x2"  # both values from the SAME right row


def test_asof_join_keeps_left_columns(spark):
    probe = spark.createDataFrame([(1, _ts(9), 42.0)], ["k", "ts", "metric"])
    state = spark.createDataFrame([(1, _ts(1), "X")], ["k", "ts", "st"])
    row = asof_join(probe, state, "k", "ts", ["st"]).collect()[0]
    assert row["metric"] == 42.0 and row["st_asof"] == "X"
    assert set(asof_join(probe, state, "k", "ts", ["st"]).columns) == {"k", "ts", "metric", "st_asof"}


def test_asof_null_ts_state_never_matches(spark):
    """Round-9 review find: Spark sorts NULLS FIRST ascending, so an
    unfiltered NULL-ts right row sat at the head of every key's window
    and was carried forward as the as-of match for every probe. DuckDB
    ASOF (l.ts >= r.ts) never matches NULL — neither may we."""
    probe = spark.createDataFrame(
        [(1, _ts(5), "early"), (1, _ts(12), "late")], ["k", "ts", "name"]
    )
    state = spark.createDataFrame(
        [(1, None, "GHOST"), (1, _ts(10), "real")], ["k", "ts", "st"]
    )
    out = {
        r["name"]: r["st_asof"]
        for r in asof_join(probe, state, "k", "ts", ["st"]).collect()
    }
    assert out["early"] is None  # no state at t<=5; the NULL-ts row must not leak
    assert out["late"] == "real"
