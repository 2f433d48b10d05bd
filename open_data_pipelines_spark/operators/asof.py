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
    """Columns of ``left`` + ``{v}{suffix}`` for each right value col.

    The right row's value columns are carried as ONE struct, so (a) a
    right row whose value is legitimately NULL still *matches* (the
    struct is non-null — DuckDB ASOF semantics), and (b) multiple
    value columns always come from the same right row, never a chimera
    of different rows.
    """
    struct_type = "struct<" + ",".join(
        f"{v}:{right.schema[v].dataType.simpleString()}" for v in value_cols
    ) + ">"
    lt = left.withColumn("__tag", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(struct_type)
    )
    # a NULL-ts right row can never be an as-of match (DuckDB ASOF
    # l.ts >= r.ts never matches NULL) — but Spark sorts NULLS FIRST
    # ascending, so an unfiltered null-ts row would sort to the head
    # of every key's window and be carried forward into every probe
    # (round-9 review find)
    rt = right.filter(F.col(ts).isNotNull()).select(
        key,
        ts,
        F.struct(*[F.col(v) for v in value_cols]).alias("__r"),
    ).withColumn("__tag", F.lit(0))
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt.select(lt.columns))

    # total order: ties at (ts, tag) among right rows are broken by the
    # value struct itself (ascending -> last() picks the lexicographic
    # max), so the matched row is deterministic even when the right
    # side has duplicate timestamps per key. Left rows have NULL __r
    # but sort after all same-ts right rows via the tag anyway.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = unioned.filter(F.col("__tag") == 1)
    for v in value_cols:
        out = out.withColumn(f"{v}{suffix}", F.col(f"__match.{v}"))
    return out.drop("__tag", "__r", "__match")
