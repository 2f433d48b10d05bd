"""Model-based quality filter: distributed logistic regression on
codegen features — separation on held-out data, loss decrease,
zero-shuffle scoring plan, funnel composition."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.quality_model import (
    FEATURE_NAMES,
    fit_quality_model,
    quality_model_filter,
    score_quality,
    with_quality_features,
)

GOOD_WORDS = (
    "the quick brown fox jumps over a lazy dog and then walks to the old "
    "market where people buy fresh bread with their friends in the morning"
).split()
JUNK_ALPHA = list("#$%@!&*0123456789^~|")


def _good(rnd: random.Random, n: int) -> str:
    return " ".join(rnd.choice(GOOD_WORDS) for _ in range(n))


def _junk(rnd: random.Random, n: int) -> str:
    # digit/punct soup with erratic spacing and just enough sprinkled
    # stopwords to pass lang-id — the junk a rule-based lang filter
    # does NOT catch, which is exactly what the learned filter is for
    return "".join(
        ("the " if rnd.random() < 0.12 else rnd.choice(JUNK_ALPHA))
        + ("   " if rnd.random() < 0.2 else "")
        for _ in range(n)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rnd = random.Random(42)
    rows = []
    for i in range(200):
        rows.append((i, _good(rnd, rnd.randint(30, 80)), 1))
    for i in range(200, 400):
        rows.append((i, _junk(rnd, rnd.randint(60, 200)), 0))
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    return df.filter(F.col("doc_id") % 2 == 0), df.filter(F.col("doc_id") % 2 == 1)


def test_fit_separates_held_out(spark, corpus):
    train, test = corpus
    model = fit_quality_model(train, "text", "label")
    scored = score_quality(test, model, "text")
    acc = (
        scored.select(
            ((F.col("model_quality") >= 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # loss trace: end strictly below start, no catastrophic divergence
    assert model.train_loss[-1] < model.train_loss[0] * 0.5
    assert len(model.weights) == len(FEATURE_NAMES)


def test_scoring_plan_is_single_projection(spark, corpus):
    train, test = corpus
    model = fit_quality_model(train, "text", "label", n_iter=5)
    plan = (
        score_quality(test, model, "text")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle
    assert "Join" not in plan  # weights are inlined literals, not a table


def test_filter_composes_and_is_deterministic(spark, corpus):
    train, test = corpus
    model = fit_quality_model(train, "text", "label", n_iter=30)
    kept1 = quality_model_filter(test, model, "text", threshold=0.5)
    kept2 = quality_model_filter(test, model, "text", threshold=0.5)
    ids1 = {r["doc_id"] for r in kept1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert ids1 == ids2
    assert kept1.columns == test.columns
    # mostly good docs survive
    labels = {r["doc_id"]: r["label"] for r in test.collect()}
    frac_good = sum(labels[i] for i in ids1) / max(len(ids1), 1)
    assert frac_good >= 0.9


def test_features_are_finite_on_edge_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "x"), (4, "A B"), (5, "123")],
        ["doc_id", "text"],
    )
    out = with_quality_features(df, "text")
    for r in out.collect():
        for name in FEATURE_NAMES:
            v = r[name]
            assert v is not None and v == v, f"{name} not finite for doc {r['doc_id']}: {v}"


def test_fit_raises_on_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty training frame"):
        fit_quality_model(df, "text", "label", n_iter=1)


def test_funnel_composition_model_stage(spark, corpus):
    """prepare_corpus(quality_model=...) drops the junk docs the
    rule-based filter alone would need hand thresholds for."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    train, test = corpus
    model = fit_quality_model(train, "text", "label", n_iter=30)
    docs = test.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=docs,
        near_dup="none",
        quality_model=model,
        quality_min=0.0,  # neutralize the rule filter; isolate the model stage
        with_stats=True,
    )
    assert stats["model_quality_kept"] < stats["quality_kept"]
    surviving = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    labels = {r["doc_id"]: r["label"] for r in test.collect()}
    frac_good = sum(labels[i] for i in surviving) / len(surviving)
    assert frac_good >= 0.95, f"survivor purity {frac_good}"


def test_model_round_trips_through_dict(spark, corpus):
    import json

    from open_data_pipelines_spark.operators.quality_model import QualityModel

    train, test = corpus
    model = fit_quality_model(train, "text", "label", n_iter=10)
    clone = QualityModel.from_dict(json.loads(json.dumps(model.to_dict())))
    a = score_quality(test, model, "text").select("doc_id", "model_quality").collect()
    b = score_quality(test, clone, "text").select("doc_id", "model_quality").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    with pytest.raises(ValueError, match="do not match"):
        QualityModel.from_dict({"features": ["other"], "weights": [1.0], "bias": 0.0})


def test_streaming_funnel_applies_quality_model(spark, corpus):
    """The learned filter is a pure projection -> streaming-safe; the
    drained bronze keeps (mostly) only model-approved docs."""
    import tempfile

    from open_data_pipelines_spark.streaming.corpus_stream import (
        read_document_stream,
        stream_corpus_to_bronze,
    )

    train, test = corpus
    model = fit_quality_model(train, "text", "label", n_iter=30)
    landing = tempfile.mkdtemp(prefix="qm_landing_")
    test.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{landing}/drop")

    bronze = tempfile.mkdtemp(prefix="qm_bronze_") + "/corpus"
    q = stream_corpus_to_bronze(
        read_document_stream(spark, f"{landing}/drop"),
        bronze,
        tempfile.mkdtemp(prefix="qm_ckpt_"),
        quality_min=0.0,
        quality_model=model,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(bronze)
    labels = {r["doc_id"]: r["label"] for r in test.collect()}
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids, "stream kept nothing"
    frac_good = sum(labels[i] for i in ids) / len(ids)
    assert frac_good >= 0.95, f"streamed survivor purity {frac_good}"
