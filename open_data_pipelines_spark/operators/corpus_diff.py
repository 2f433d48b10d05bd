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
    contract the dedup stages use). NULL ids raise — a diff keyed on
    NULL would silently merge every keyless doc into one row."""
    o = old.select(
        F.col(id_col).alias("__id"), doc_fingerprint(text_col).alias("old_fingerprint")
    )
    n = new.select(
        F.col(id_col).alias("__id"), doc_fingerprint(text_col).alias("new_fingerprint")
    )
    joined = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(F.col("old_fingerprint") == F.col("new_fingerprint"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    out = joined.select(
        F.col("__id").alias(id_col), status.alias("status"),
        "old_fingerprint", "new_fingerprint",
    )
    # fail loud on NULL keys rather than emitting a merged junk row;
    # expression-level guard (raise_error) so no extra action is paid
    guard = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit("NULL document id in corpus_diff input")),
    ).otherwise(F.col(id_col))
    return out.withColumn(id_col, guard)


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
