"""Corpus hygiene audits (engine extension): the observability side
of the training-data funnel — what a curator checks BEFORE shipping a
corpus, expressed as the same scale-shaped aggregations as the
pipeline itself.

- **PII redaction audit**: per-category match counts for the
  :func:`..operators.text_analysis.redact_pii` patterns — both the
  pre-redaction exposure ("how much PII is in the raw drop") and the
  post-redaction residue check (must be zero). Pure codegen
  ``regexp_count`` expressions, one global aggregation.
- **Split leakage audit**: cross-split near-duplicate pairs — the
  eval-hygiene invariant (a test doc with a train near-twin inflates
  benchmarks). Reuses the banded near-dup candidate machinery, so the
  audit costs what one dedup pass costs, never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _PII_PATTERNS

PII_CATEGORIES = tuple(token.strip("<>").lower() for _, token in _PII_PATTERNS)


def pii_audit(df: DataFrame, text_col: str) -> DataFrame:
    """One row: per-category PII match counts + affected-doc counts
    over the corpus. Run on raw text for exposure, on redacted text
    for the zero-residue check (the replacement tokens themselves do
    not match any pattern).

    Patterns are applied in redact_pii's order semantics — a long
    digit run counts as its most specific category the way redaction
    would consume it (count after neutralizing earlier patterns).
    """
    aggs = []
    c = F.col(text_col)
    for (pattern, token), cat in zip(_PII_PATTERNS, PII_CATEGORIES):
        n = F.regexp_count(c, F.lit(pattern))
        aggs.append(F.sum(n).alias(f"{cat}_matches"))
        aggs.append(F.sum((n > 0).cast("long")).alias(f"{cat}_docs"))
        # neutralize so the next (greedier) pattern can't re-count the
        # same span — mirrors redact_pii's sequential replacement
        c = F.regexp_replace(c, pattern, token)
    return df.agg(F.count(F.lit(1)).alias("n_docs"), *aggs)


def assert_no_pii_residue(df: DataFrame, text_col: str) -> None:
    """Raise if any PII pattern still matches ``text_col`` (call on
    the funnel's cleaned output; the dbt-style assertion counterpart
    of ``plans/dag.py`` tests)."""
    row = pii_audit(df, text_col).first()
    residue = {
        cat: row[f"{cat}_matches"]
        for cat in PII_CATEGORIES
        if (row[f"{cat}_matches"] or 0) > 0
    }
    if residue:
        raise AssertionError(f"PII residue after redaction: {residue}")


def split_leakage_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """(id_a, split_a, id_b, split_b) near-duplicate pairs whose two
    sides live in DIFFERENT splits — each one a potential eval leak.

    Cost shape: exactly one MinHash-LSH dedup pass (banded equi-join
    candidates, Jaccard verify) plus a broadcast-sized join to attach
    split labels. A leak-free corpus (near-dup dedup BEFORE splitting,
    the prepare_corpus order) returns zero rows — pinned by
    ``tests/test_audits.py``.
    """
    from .text_dedup import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(
        df,
        text_col,
        id_col,
        threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    labels = df.select(F.col(id_col), F.col(split_col))
    a = labels.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    b = labels.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "split_a", "id_b", "split_b")
    )


def split_leakage_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    **kwargs,
) -> DataFrame:
    """Aggregate leakage counts per (split_a, split_b) direction —
    the one-screen summary (empty == clean)."""
    pairs = split_leakage_pairs(df, text_col, id_col, split_col, **kwargs)
    return pairs.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("leaked_pairs")
    )
