"""Key-based deduplication operators.

Reference semantics being reproduced:

- ``DISTINCT ON (key) ... ORDER BY key, ord`` — one row per permit,
  latest by start time (``dbt .../in_progress_list_england.sql:7``,
  ``stg_emergency_works_by_authority.sql:10,58-59``).
- ``ROW_NUMBER() OVER (PARTITION BY ref ORDER BY event_time DESC,
  event_reference DESC) ... WHERE rn = 1`` — latest-event selection for
  the SCD2 staging (``src/data_sources/section_58.py:258-268``).

Spark-first notes (100 TB): top-1-per-key is a single hash shuffle on
the key. Prefer this over ``dropDuplicates`` when an explicit order
matters, and always carry a total order (tiebreaker columns) — the
reference relies on DuckDB's incidental first-row semantics, which is
nondeterministic; we make determinism explicit (SURVEY.md §7 watch
list). The window's sort is per-key (no global sort); AQE handles key
skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """One row per key, first by ``order_by`` (make it a TOTAL order).

    Equivalent of DuckDB ``DISTINCT ON`` with an explicit ORDER BY.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal — hash-groupBy on all (or subset) columns.

    Plain ``dropDuplicates``: one shuffle on the hash of the subset,
    map-side partial aggregation applies. For 100 TB this is the
    cheapest possible dedup — no window, no sort.
    """
    return df.dropDuplicates(list(subset) if subset else None)
