"""Round-14 checkpoint-free grind guard (VERDICT r13 #5): with
SPARK_GRAFT_NO_INTERNAL_CHECKPOINT set, a construction whose skipped
reuse checkpoints multiply past the limit must raise
CheckpointFreeDepthWarning; a shallow pipeline must not. The estimate
is pure arithmetic over the declared consumer fan-outs — the plan
tree is deliberately never probed, and these tests deliberately never
CONSTRUCT the full checkpoint-free funnel either: that construction
is itself the measured 25-minute Catalyst grind being guarded
(EXPLAIN_AUDIT.md footnote; a collectLeaves probe ran past 400 s).
Instead the warning is asserted on the funnel's own checkpoint
CADENCE (base fan-out 7 declared by funnel_planted_docs — verified
against the real helper below — followed by the pipeline's 2-consumer
reuse points), and silence is asserted on a REAL shallow
prepare_corpus construction."""

from __future__ import annotations

import os
import warnings

import pytest
from pyspark.sql import functions as F

import open_data_pipelines_spark.caching as caching
from open_data_pipelines_spark.caching import (
    CheckpointFreeDepthWarning,
    _reset_checkpoint_free_estimate,
    lazy_checkpoint,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def kill_switch():
    _reset_checkpoint_free_estimate()
    os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"] = "1"
    try:
        yield
    finally:
        os.environ.pop("SPARK_GRAFT_NO_INTERNAL_CHECKPOINT", None)
        _reset_checkpoint_free_estimate()


def test_warns_on_funnel_cadence(spark, kill_switch):
    """The funnel's reuse-point sequence: the 7-consumer base scan,
    then the LM trainer's two scratch caches, then exact dedup — by
    which point the estimate (7*2*2*2 = 56) has crossed the default
    limit of 32 and the guard must have warned exactly once."""
    df = spark.range(10)
    with pytest.warns(CheckpointFreeDepthWarning):
        lazy_checkpoint(df, consumers=7)
        lazy_checkpoint(df)
        lazy_checkpoint(df)
        lazy_checkpoint(df)
    # warn-once: further crossings stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error", CheckpointFreeDepthWarning)
        lazy_checkpoint(df)


def test_funnel_base_declares_its_fanout(spark, kill_switch):
    """The REAL funnel planting feeds the guard with its documented
    7-consumer fan-out (this is the construction prefix that is still
    tractable checkpoint-free; the full funnel is not)."""
    from open_data_pipelines_spark.queries.text import funnel_planted_docs

    funnel_planted_docs(spark, SF_SMOKE)
    assert caching._nockpt_state["blowup"] >= 7
    assert caching._nockpt_state["points"] >= 1


def test_silent_on_shallow_pipeline(spark, kill_switch):
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    with warnings.catch_warnings():
        warnings.simplefilter("error", CheckpointFreeDepthWarning)
        out = prepare_corpus(
            spark, SF_SMOKE, docs=docs, near_dup="none",
            chunk_size=100_000, overlap=0,
        )
    assert out.columns  # constructed fine, no warning


def test_silent_when_checkpoints_enabled(spark):
    """Without the kill switch the guard never engages — checkpoints
    truncate the lineage, so there is nothing to warn about."""
    _reset_checkpoint_free_estimate()
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    with warnings.catch_warnings():
        warnings.simplefilter("error", CheckpointFreeDepthWarning)
        for _ in range(8):
            df = lazy_checkpoint(df, consumers=7)
    assert caching._nockpt_state["blowup"] == 1
