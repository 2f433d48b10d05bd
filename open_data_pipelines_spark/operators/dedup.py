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
list). Skew posture (measured, STRESS.md round 15
``--relational-skew``): the ``rn = 1`` filter compiles to a map-side
WindowGroupLimit on Spark 4 (SPARK-37099) that pre-reduces every
input partition to one row per key BEFORE the shuffle, so a zipf-hot
key never concentrates — but that protection is pattern-matched to
rank/row_number group-limit filters; general windows (running
aggregates) have no such rescue and AQE does not split window
partitions. :func:`top1_per_key_agg` is the algebraic twin whose
immunity is structural (``max_by`` partial-aggregates map-side)
rather than dependent on an optimizer rule recognizing the filter
shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    spread: bool = False,
) -> DataFrame:
    """One row per key, first by ``order_by`` (make it a TOTAL order).

    Equivalent of DuckDB ``DISTINCT ON`` with an explicit ORDER BY.

    ``spread=True`` fans narrow input out FIRST (round 15): the
    map-side WindowGroupLimit Spark 4 inserts below the key exchange
    is the right shape on wide input (pre-reduces every partition
    before the shuffle — the skew rescue the module docstring
    describes), but on a 1-3-partition scan (single-row-group files)
    that partial sort+limit serializes the whole table onto as many
    cores (event-log: 0.94 s single-task on the sf0.1 lineitem; the
    wellbeing DAG's latest-line pass measured 4.2 -> 1.4 s). The
    key-partitioned spread SATISFIES the window's distribution, so
    exactly one exchange remains either way, and scale_out no-ops on
    wide input, keeping the map-side pre-reduction at scale. It is
    OPT-IN because the probe + exchange also carry a cost: callers
    whose narrow input is genuinely small (SCD2 staging slices,
    +0.15 s in the round-15 interleaved A/B) or who sit mid-pipeline
    on deep plans (the funnel's exact-dedup — the probe would compile
    and, under AQE, eagerly execute the upstream segment per call)
    must keep the default. Enable it where the input is a wide-scan
    candidate feeding real per-key reduction (distinct_on, the
    wellbeing latest-line pass).
    """
    if spread:
        from .text_dedup import scale_out

        df = scale_out(df, keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top1_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_struct: Column,
) -> DataFrame:
    """Skew-immune top-1-per-key: ``max_by(row, order_struct)``.

    Value-identical to :func:`top1_per_key` with a DESCENDING total
    order over the same columns (``max_by`` picks the row whose
    ``order_struct`` is LARGEST under Spark's lexicographic struct
    comparison — the caller encodes direction in the struct, e.g.
    negate numerics for ascending fields). Equality on skewed keys is
    pinned in tests/test_macros_salting.py.

    Why it exists: the window form sorts each key's rows inside ONE
    task and AQE cannot split a skewed window partition, so a key
    holding 13% of a 100 TB table serializes 13 TB through one core.
    This form is a plain hash aggregation — per-key state is a single
    row, partial-aggregated map-side, so the hot key contributes one
    row per map task to the shuffle regardless of its share. Column
    order is preserved. Output partition count follows
    ``spark.sql.shuffle.partitions``/AQE like any aggregation.
    """
    cols = df.columns
    row = F.max_by(F.struct(*[F.col(c) for c in cols]), order_struct).alias("__r")
    return df.groupBy(*[F.col(k) for k in keys]).agg(row).select(
        *[F.col(f"__r.{c}").alias(c) for c in cols]
    )


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal — hash-groupBy on all (or subset) columns.

    Plain ``dropDuplicates``: one shuffle on the hash of the subset,
    map-side partial aggregation applies. For 100 TB this is the
    cheapest possible dedup — no window, no sort.
    """
    return df.dropDuplicates(list(subset) if subset else None)
