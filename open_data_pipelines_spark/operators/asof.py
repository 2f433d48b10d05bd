"""As-of join — for each left event, the latest right event with
``right.ts <= left.ts`` per key.

No reference counterpart (engine extension from the custom-operator
list: as-of/range/rollup); included because it is the workhorse of
event-state enrichment at scale (join a fact stream to the most recent
dimension state without an SCD lookup table).

Implementation is the union-and-carry-forward pattern — a *single*
hash shuffle on (key) + one per-key sort, instead of a per-row
subquery or a range join product:

  1. tag left (probe) and right (state) rows, union them;
  2. window over (key) ordered by (ts, tag) with
     ``last(right_value, ignorenulls=True)`` carried forward;
  3. keep probe rows; the carried value is the as-of match.

Ties (equal ts): right rows sort BEFORE left rows, so a state change
at exactly t is visible to a probe at t (DuckDB ASOF JOIN
``ON l.ts >= r.ts`` semantics — verified against its native ASOF in
the oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Columns of ``left`` + ``{v}{suffix}`` for each right value col."""
    lt = left.withColumn("__tag", F.lit(1))
    for v in value_cols:
        lt = lt.withColumn(f"__r_{v}", F.lit(None).cast(right.schema[v].dataType))
    rt = right.select(
        key,
        ts,
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    ).withColumn("__tag", F.lit(0))
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt.select(lt.columns))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in value_cols:
        unioned = unioned.withColumn(
            f"{v}{suffix}", F.last(f"__r_{v}", ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("__tag") == 1).drop(
        "__tag", *[f"__r_{v}" for v in value_cols]
    )
