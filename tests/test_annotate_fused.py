"""annotate_text (fused lang/quality/token annotate) parity + plan shape.

The fused operator must be VALUE-identical to selecting the three
scalar functions — it exists purely to share the tokenization work and
to stop Catalyst's predicate pushdown from duplicating the HOF/regex
trees into a following quality filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_analysis import (
    annotate_text,
    lang_id,
    normalize_text,
    quality_score,
    redact_pii,
    token_count_ws,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

# edge cases the scalar functions guard explicitly: empty text,
# whitespace-only, no stopwords at all, exact inter-language hit ties,
# punctuation-heavy, out-of-band lengths
EDGE_TEXTS = [
    (1, ""),
    (2, "   \t  "),
    (3, "zzz qqq xyzzy plugh"),
    (4, "the le der"),  # three-way tie -> 'en' by insertion order
    (5, "le la et les des"),
    (6, "der die und das ist"),
    (7, "!!! ??? ... ;;; :::"),
    (8, "the " * 30 + "quick brown fox is in it for that and of to"),
    (9, "a" * 25000 + " the of"),
    (10, "the quick brown fox jumps over the lazy dog " * 10),
]


def _scalar(df):
    return df.select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        quality_score("text").alias("quality"),
        token_count_ws("text").alias("n_tokens"),
    )


def test_annotate_text_matches_scalar_trio_on_edges(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    got = annotate_text(df, "text").orderBy("doc_id").collect()
    want = _scalar(df).orderBy("doc_id").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_annotate_text_matches_scalar_trio_on_corpus(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    cleaned = docs.select(
        "doc_id", normalize_text(redact_pii("text")).alias("text"), "source"
    )
    got = annotate_text(cleaned, "text").orderBy("doc_id").collect()
    want = cleaned.select(
        "doc_id",
        "source",
        "text",
        lang_id("text").alias("lang"),
        quality_score("text").alias("quality"),
        token_count_ws("text").alias("n_tokens"),
    ).orderBy("doc_id").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # carry columns pass through, annotated columns come last
    assert annotate_text(cleaned, "text").columns == [
        "doc_id",
        "source",
        "text",
        "lang",
        "quality",
        "n_tokens",
    ]


def test_quality_filter_stays_above_the_generate_barrier(spark):
    """The reason the operator exists: a filter on the computed
    columns must NOT be pushed below the annotate work (pushdown
    through a plain projection substitutes the full expression trees
    into the predicate, evaluating every tree twice)."""
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    kept = annotate_text(df, "text").filter(
        (F.col("quality") >= 0.5) & F.col("lang").isin("en", "fr", "de")
    )
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    gen_at = plan.find("Generate")
    filter_at = plan.find("Filter")
    assert gen_at != -1 and filter_at != -1
    # the optimized tree prints top-down: the Filter must sit ABOVE
    # (i.e. print before) the Generate, not below it
    assert filter_at < gen_at, plan


def test_annotate_text_rejects_unknown_quality_lang(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    try:
        annotate_text(df, "text", quality_lang="xx")
    except ValueError as e:
        assert "quality_lang" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown quality_lang")
