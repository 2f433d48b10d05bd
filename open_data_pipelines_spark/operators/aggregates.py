"""Aggregation operators (SURVEY.md §2.6-2.7).

Reference semantics being reproduced:

- A2 multi-key GROUP BY + SUM (``dbt .../impact_scores_england.sql:112-131``)
- A3 conditional aggregation SUM(CASE WHEN ...) / COUNT(CASE WHEN ...)
  (``int_postcodes.sql:21-26``, ``impact_scores_highway_authority_england.sql:159-168``)
- A4 COUNT(DISTINCT) + AVG/MAX/MIN/SUM battery (``:176-216``)
- A5 PERCENT_RANK over a grouped aggregate (``:189``)
- W3 global min-max normalization with constant-input guard -> 50.0
  (``impact_scores_england.sql:142-150``)
- W4 PERCENT_RANK * 100 scaling (``impact_scores_highway_authority_england.sql:141``)

Scale notes: W3's empty-partition window (`MIN(x) OVER ()`) funnels the
whole dataset through ONE partition. :func:`minmax_normalize` instead
computes the two scalars with a regular (map-side combinable)
aggregation and broadcast-cross-joins them back — same result, no
single-partition shuffle. PERCENT_RANK is inherently a global sort; we
keep it for parity (it runs on grouped, already-small data in the
reference) and note `approx` percentile alternatives for raw-fact scale.

Exactness for oracle checks: money-ish sums go through DECIMAL(18,2)
and back to DOUBLE so the result is order-independent and bit-identical
to DuckDB's (floating sums are order-dependent; decimal sums are not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent exact sum of a double column.

    Sum in DECIMAL(18, scale), return DOUBLE — deterministic under any
    partitioning/AQE re-plan, and matches the DuckDB oracle bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def decimal_avg(col: Column | str, scale: int = 6, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def conditional_sum(cond: Column, value: Column, alias: str) -> Column:
    """SUM(CASE WHEN cond THEN value ELSE 0 END)."""
    return F.sum(F.when(cond, value).otherwise(F.lit(0))).alias(alias)


def conditional_count(cond: Column, alias: str) -> Column:
    """COUNT(CASE WHEN cond THEN 1 END)."""
    return F.count(F.when(cond, F.lit(1))).alias(alias)


def minmax_normalize(
    df: DataFrame,
    value_col: str,
    out_col: str,
    lo: float = 1.0,
    hi: float = 100.0,
    constant_value: float = 50.0,
) -> DataFrame:
    """``lo + (hi-lo) * (x - min) / NULLIF(max - min, 0)``, constant -> 50.

    Reference: ``impact_scores_england.sql:142-150`` uses
    ``MIN/MAX(x) OVER ()`` — a single-partition global window. Here the
    extremes come from a scalar aggregate broadcast back via cross
    join: identical algebra, shuffle-free at any scale.
    """
    extremes = df.agg(
        F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx")
    )
    x = F.col(value_col)
    span = F.col("__mx") - F.col("__mn")
    norm = F.when(span == 0, F.lit(constant_value)).otherwise(
        F.lit(lo) + (F.lit(hi) - F.lit(lo)) * (x - F.col("__mn")) / span
    )
    return (
        df.crossJoin(F.broadcast(extremes))
        .withColumn(out_col, norm)
        .drop("__mn", "__mx")
    )


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    salt: Column,
    salt_mod: int,
    alias: str,
    scale: int = 2,
) -> DataFrame:
    """Skew-resistant two-stage sum: partial-aggregate on
    (keys, salt % salt_mod) then merge on keys.

    With a hot key, a plain groupBy funnels that key's rows through
    one reducer; salting spreads them over ``salt_mod`` reducers and
    merges the (tiny) partials. Decimal-routed, so the result is
    bit-identical to the unsalted sum — salting changes the shuffle,
    never the answer. (Spark's map-side partial aggregation already
    mitigates this for algebraic aggs; explicit salting is the pattern
    for when combine ratios are poor — many distinct keys per task —
    or for non-algebraic states.)
    """
    stage1 = df.groupBy(
        *keys, F.pmod(salt, F.lit(salt_mod)).alias("__salt")
    ).agg(F.sum(value.cast(f"decimal(18,{scale})")).alias("__partial"))
    return stage1.groupBy(*keys).agg(
        F.sum("__partial").cast("double").alias(alias)
    )


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """The 100 TB-scale variant of A4's exact COUNT(DISTINCT):
    HyperLogLog++ sketch, one pass, mergeable, no per-key set state.
    Exact semantics stay available for oracle checks (A4 note,
    SURVEY.md §2.6)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias(f"approx_{col}"),
        F.countDistinct(col).alias(f"exact_{col}"),
    )


def percent_rank_over(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str,
    scale: float = 1.0,
) -> DataFrame:
    """PERCENT_RANK() OVER (ORDER BY ...) [* scale].

    Global window — single partition by construction. Use only on
    pre-aggregated (small) frames, as the reference does; for raw-fact
    percentiles at 100 TB use approx_percentile instead.
    """
    w = Window.orderBy(*order_by)
    c = F.percent_rank().over(w)
    if scale != 1.0:
        c = c * F.lit(scale)
    return df.withColumn(out_col, c)
