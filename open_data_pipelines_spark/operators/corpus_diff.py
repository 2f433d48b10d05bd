"""Corpus release diffing (engine extension): what changed between
two corpus versions — the release-notes numbers (added / removed /
modified / unchanged documents) and the per-doc change table a
curation audit drills into. The ops move every corpus release needs
and ad-hoc joins get subtly wrong (NULL keys, both-sides-missing
fingerprints, asymmetric column sets).

Scale shape: ONE full outer join on the document key comparing
content fingerprints (computed inline — the frames never need
pre-fingerprinting), one map-side-combinable aggregation for the
summary. No driver data, no window, no skew-sensitive key beyond the
document id itself.

Cross-engine: pinned against a DuckDB FULL OUTER JOIN mirror in
tests/test_corpus_diff.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import doc_fingerprint

__all__ = ["corpus_diff", "corpus_diff_summary"]


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_fingerprint, new_fingerprint) per document id
    present in either version; ``status`` is ``added`` / ``removed``
    / ``modified`` / ``unchanged``. "Same" means same NORMALIZED
    content fingerprint (``text_analysis.doc_fingerprint`` —
    whitespace/case cosmetics don't count as modification, the exact
    contract the dedup stages use); presence comes from join-side
    markers, never from fingerprint NULLness, so NULL-text documents
    classify correctly (two NULL texts compare equal — null-safe).

    Input hygiene (the things ad-hoc diff joins get wrong, round-12
    review): a NULL id raises (the guard rides the JOIN KEY, which no
    projection can prune away); duplicate ids on a side collapse when
    their fingerprints agree (exact ingest dups) and RAISE when they
    conflict — a diff over an id mapping to two different contents
    has no meaning."""

    def side(df: DataFrame, fp_name: str, mark: str) -> DataFrame:
        guarded = F.when(
            F.col(id_col).isNull(),
            F.raise_error(F.lit("NULL document id in corpus_diff input")),
        ).otherwise(F.col(id_col))
        # count_distinct ignores NULLs: a NULL-text row next to a
        # real-text row under one id is ALSO a conflict
        n_distinct = F.count_distinct(F.col("__fp"))
        has_null = F.max(F.col("__fp").isNull().cast("int")) == 1
        conflict = F.when(
            (n_distinct > 1) | ((n_distinct >= 1) & has_null),
            F.raise_error(
                F.lit(
                    f"duplicate {id_col} with CONFLICTING content in corpus_diff "
                    f"({mark} side)"
                )
            ),
        ).otherwise(F.min("__fp"))
        return (
            df.select(
                guarded.alias("__id"), doc_fingerprint(text_col).alias("__fp")
            )
            .groupBy("__id")
            .agg(conflict.alias(fp_name), F.lit(True).alias(mark))
        )

    o = side(old, "old_fingerprint", "in_old")
    n = side(new, "new_fingerprint", "in_new")
    joined = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("modified"))
    )
    return joined.select(
        F.col("__id").alias(id_col), status.alias("status"),
        "old_fingerprint", "new_fingerprint",
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per status with its document count — the release-notes
    form. Derived from :func:`corpus_diff`, one extra map-side
    aggregation."""
    return (
        corpus_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
