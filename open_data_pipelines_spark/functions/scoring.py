"""CASE-based scoring expressions — the engine's flagship expression.

Re-expresses the reference's Street Works Impact Index scoring
(``dbt .../impact_scores_england.sql:21-74,153-159``):

- base score from a category map (Standard→2, Major→5, Minor→1,
  HS2→2, Immediate→4),
- +0.5 TTRO required, +0.5 traffic-sensitive,
- a traffic-management tier (2.0 / 1.0 / 0.5 / 0; NULL→0.5),
- a density tier over 8 buckets (0.2 … 1.6),
- final min-max-normalized score bucketed Severe/High/Moderate/Low/
  Minimal.

The generic builders take a mapping and produce one chained
``when().otherwise()`` column, so the same machinery scores any
categorical rubric. All increments are exactly-representable doubles
(halves/tenths sums stay deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column

from .exprmemo import memo_column
from pyspark.sql import functions as F


@memo_column
def category_score(
    col: Column | str,
    mapping: dict[str, float],
    default: float = 0.0,
) -> Column:
    """Chained CASE WHEN category map (impact_scores_england.sql:21-44).
    Accepts a column NAME so plain-column call sites hit the
    expression cache (a Column argument builds fresh)."""
    col = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for value, score in mapping.items():
        expr = (
            F.when(col == value, F.lit(score))
            if expr is None
            else expr.when(col == value, F.lit(score))
        )
    assert expr is not None, "mapping must be non-empty"
    return expr.otherwise(F.lit(default))


def flag_bonus(cond: Column, bonus: float = 0.5) -> Column:
    """+bonus when condition holds (TTRO / traffic-sensitive +0.5)."""
    return F.when(cond, F.lit(bonus)).otherwise(F.lit(0.0))


@memo_column
def tier_score(
    col: Column | str,
    thresholds: Sequence[tuple[float, float]],
    default: float,
    null_score: float | None = None,
) -> Column:
    """Ascending threshold buckets: first (limit, score) with col <= limit.

    Mirrors the uprn-density tiers (8 buckets 0.2-1.6,
    impact_scores_england.sql:65-74) and the traffic-management tier
    with its NULL→0.5 rule (:45-58).
    """
    col = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    if null_score is not None:
        expr = F.when(col.isNull(), F.lit(null_score))
    for limit, score in thresholds:
        branch_cond = col <= F.lit(limit)
        expr = F.when(branch_cond, F.lit(score)) if expr is None else expr.when(branch_cond, F.lit(score))
    assert expr is not None
    return expr.otherwise(F.lit(default))


@memo_column
def bucket_label(
    score: Column | str,
    cuts: Sequence[tuple[float, str]],
    top_label: str,
) -> Column:
    """Score → category label (Severe/High/Moderate/Low/Minimal,
    impact_scores_england.sql:153-159). ``cuts`` ascending (limit, label)."""
    score = F.col(score) if isinstance(score, str) else score
    expr: Column | None = None
    for limit, label in cuts:
        c = score <= F.lit(limit)
        expr = F.when(c, F.lit(label)) if expr is None else expr.when(c, F.lit(label))
    assert expr is not None
    return expr.otherwise(F.lit(top_label))
