"""Corpus datasheet report (engine extension): the "datasheet for
datasets" numbers every training-data release ships — document /
token / character volumes, exact-duplicate rate, and mean heuristic
quality, per (lang, source) cohort, per lang, and globally.

ONE aggregation pass: ``rollup(lang, source)`` computes all three
grouping levels in a single shuffle (no self-union of three
groupBys), with ``grouping_id()`` labeling the level. Duplicate rate
comes from fingerprint distinct-counting: ``exact=False`` (the 100 TB
default) uses ``approx_count_distinct`` (HLL, one pass, mergeable);
``exact=True`` uses COUNT(DISTINCT ...) — the cross-engine-
reproducible form the DuckDB parity test runs, since HLL sketches are
engine-specific (the same approx-vs-exact discipline as the CCNet
bucket cutoffs in lm_score).

Determinism: counts are exact integers; mean quality goes through
DECIMAL (order-independent sum) and back, the repo's standard
float-determinism rule (operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import doc_fingerprint, quality_score, token_count_ws

__all__ = ["corpus_report"]


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    exact: bool = False,
) -> DataFrame:
    """(lang, source, level, n_docs, n_tokens, n_chars, n_unique,
    p50_tokens, p90_tokens, mean_quality) at rollup levels 0 = per (lang, source), 1 = per
    lang, 3 = global (``grouping_id`` semantics). ``n_unique`` counts
    distinct content fingerprints — ``n_docs - n_unique`` is the
    exact-duplicate surplus a dedup pass would remove."""
    base = df.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        token_count_ws(text_col).alias("__tok"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__len"),
        doc_fingerprint(text_col).alias("__fp"),
        quality_score(text_col).alias("__q"),
    )
    uniq = (
        F.count_distinct(F.col("__fp"))
        if exact
        else F.approx_count_distinct("__fp")
    )
    # token-length distribution: exact `percentile` is bit-identical
    # to DuckDB quantile_cont on the same values (the lm_score bucket
    # precedent); approx_percentile is the one-pass mergeable 100 TB
    # default
    if exact:
        p50 = F.percentile(F.col("__tok"), F.lit(0.5))
        p90 = F.percentile(F.col("__tok"), F.lit(0.9))
    else:
        p50 = F.percentile_approx(F.col("__tok"), F.lit(0.5), F.lit(10000)).cast("double")
        p90 = F.percentile_approx(F.col("__tok"), F.lit(0.9), F.lit(10000)).cast("double")
    return base.rollup("lang", "source").agg(
        F.grouping_id().alias("level"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__len").alias("n_chars"),
        uniq.alias("n_unique"),
        p50.alias("p50_tokens"),
        p90.alias("p90_tokens"),
        # decimal sum (order-independent) -> double, THEN divide: both
        # engines perform the identical double division, avoiding
        # engine-specific decimal-quotient scale rules
        (
            F.sum(F.col("__q").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_quality"),
    )
