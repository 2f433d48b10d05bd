from __future__ import annotations

import pytest

from open_data_pipelines_spark.operators.text_dedup import simhash_band_candidates
from open_data_pipelines_spark.plans.dag import (
    ModelTestFailure,
    assert_accepted_values,
    assert_relationship,
)


def test_accepted_values(spark):
    df = spark.createDataFrame([("Active",), ("Inactive",), (None,)], ["status"])
    assert_accepted_values(df, "status", ["Active", "Inactive"])  # passes; NULLs exempt
    with pytest.raises(ModelTestFailure, match="accepted_values"):
        assert_accepted_values(df, "status", ["Active"])


def test_relationship(spark):
    child = spark.createDataFrame([(1,), (2,), (None,)], "fk INT")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk INT")
    assert_relationship(child, "fk", parent, "pk")  # passes; NULL fk exempt
    orphaned = spark.createDataFrame([(9,)], "fk INT")
    with pytest.raises(ModelTestFailure, match="orphans"):
        assert_relationship(orphaned, "fk", parent, "pk")


def test_simhash_band_candidates_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1 (small Hamming distance)
            (3, "completely different words about spark shuffles and parquet files"),
        ],
        ["doc_id", "text"],
    )
    cands = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_band_candidates(docs, "text", "doc_id", max_hamming=3).collect()
    }
    assert (1, 2) in cands and cands[(1, 2)] <= 3
    assert (1, 3) not in cands and (2, 3) not in cands


def test_simhash_band_pigeonhole(spark):
    # identical docs -> hamming 0, must be found regardless of banding
    docs = spark.createDataFrame([(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"])
    out = simhash_band_candidates(docs, "text", "doc_id", max_hamming=0).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0
