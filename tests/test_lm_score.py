"""N-gram LM perplexity scoring: separation of in-domain vs junk
text, determinism, empty/single-token edges, broadcast==shuffle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.lm_score import (
    perplexity_filter,
    perplexity_score,
    train_ngram_lm,
)

WORDS = (
    "the quick brown fox jumps over a lazy dog and then walks to the old "
    "market where people buy fresh bread with their friends in the morning"
).split()


def _sentence(rnd, n):
    return " ".join(rnd.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def lm(spark):
    rnd = random.Random(3)
    ref = spark.createDataFrame(
        [(i, _sentence(rnd, rnd.randint(20, 60))) for i in range(300)],
        ["doc_id", "text"],
    )
    return train_ngram_lm(ref, "text")


def test_in_domain_beats_junk(spark, lm):
    rnd = random.Random(9)
    rows = [(1, _sentence(rnd, 40), "good"), (2, _sentence(rnd, 25), "good")]
    rows += [(3, "zxqj vvkw pflm qqrs ttxz " * 8, "junk")]
    rows += [(4, "the the the the the the the the", "degenerate")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "kind"])
    scores = {r["doc_id"]: r["perplexity"] for r in perplexity_score(df, "text", "doc_id", lm).collect()}
    assert scores[3] > scores[1] * 10 and scores[3] > scores[2] * 10
    # degenerate repetition is in-vocab, so the LM alone scores it low —
    # that is exactly why the repetition signals exist alongside it
    assert scores[4] < scores[3]


def test_score_edges_and_determinism(spark, lm):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the"), (4, "the quick brown fox")],
        ["doc_id", "text"],
    )
    a = perplexity_score(df, "text", "doc_id", lm).collect()
    b = perplexity_score(df, "text", "doc_id", lm).collect()
    rows = {r["doc_id"]: r for r in a}
    assert rows[1]["n_tokens"] == 0 and rows[1]["perplexity"] is None
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["n_tokens"] == 1 and rows[3]["perplexity"] > 0
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_broadcast_and_shuffle_paths_agree(spark, lm):
    rnd = random.Random(5)
    df = spark.createDataFrame(
        [(i, _sentence(rnd, 15)) for i in range(30)], ["doc_id", "text"]
    )
    a = perplexity_score(df, "text", "doc_id", lm, broadcast_model=True)
    b = perplexity_score(df, "text", "doc_id", lm, broadcast_model=False)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_perplexity_filter_keeps_head(spark, lm):
    rnd = random.Random(7)
    good = [(i, _sentence(rnd, 30)) for i in range(10)]
    junk = [(100 + i, "qzx wvv kjj " * 10) for i in range(10)]
    df = spark.createDataFrame(good + junk, ["doc_id", "text"])
    # threshold from the scored distribution (CCNet head practice)
    scores = perplexity_score(df, "text", "doc_id", lm)
    thr = scores.agg(F.expr("percentile(perplexity, 0.5)")).first()[0]
    kept = perplexity_filter(df, "text", "doc_id", lm, max_perplexity=thr)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {i for i, _ in good}


def test_funnel_composition_perplexity_stage(spark, lm):
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    rnd = random.Random(11)
    junk = spark.createDataFrame(
        [(90000 + i, "qzx wvv kjj " * 30, "en", "web", 360) for i in range(20)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    # junk must pass the rule-based filter to prove the LM stage did it
    planted = docs.unionByName(junk)
    with pytest.raises(ValueError, match="perplexity_max"):
        prepare_corpus(spark, SF_SMOKE, docs=planted, perplexity_lm=lm)
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=planted,
        near_dup="none",
        quality_min=0.0,
        keep_langs=("en", "fr", "de", "und"),
        perplexity_lm=lm,
        perplexity_max=5000.0,
        with_stats=True,
    )
    assert stats["perplexity_kept"] < stats["quality_kept"]
    assert out.filter(F.col("doc_id") >= 90000).count() == 0
