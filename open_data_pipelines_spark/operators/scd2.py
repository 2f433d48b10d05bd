"""SCD Type 2 dimension maintenance (SURVEY.md §2.10 I1/I4, §2.7 W2/W6).

Re-expresses the reference's Section 58 SCD2 machinery
(``src/data_sources/section_58.py:215-357``, orchestrated by
``src/data_processors/section_58.py:298-385``):

- **initial load**: window-dedup staging to the latest event per entity
  (ROW_NUMBER ... ORDER BY event_time DESC, event_reference DESC,
  ``section_58.py:258-268``) and insert as current rows with
  ``valid_from = event_time``, ``valid_to = '9999-12-31'``,
  ``is_current = true`` and an md5 change hash over the tracked
  attributes (``:250-257``).
- **incremental merge**: for entities whose newest staged event is
  *newer* than the dimension's current row (``event_time >`` guard,
  ``:349-353`` — late/out-of-order events must NOT fire) *and* whose
  record hash changed, close out the current row
  (``valid_to = new event_time``, ``is_current = false``) and insert
  the new version; brand-new entities are plain inserts.
- **surrogate keys**: the reference uses a DB sequence
  (``src/data_processors/section_58.py:206-215``). Exact-sequential
  keys serialize in a distributed engine; parity mode assigns
  ``row_number() OVER (ORDER BY entity, valid_from)`` over the final
  snapshot (deterministic, but a global sort — documented as
  parity-only). Scale mode (``with_surrogate_keys_scaled``) produces
  the SAME deterministic 1..N numbering via range partitioning +
  per-partition row numbers + broadcast cumulative offsets — no
  single-partition stage, one tiny driver action.

The implementation is a pure join-based rewrite over immutable
storage (oracle-checkable, no Delta dependency): the Delta MERGE
variant is a drop-in for environments that have it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import lazy_checkpoint
from ..functions.exprmemo import memo_column
from ..functions.hashing import record_hash
from .dedup import top1_per_key

SENTINEL_TS = "9999-12-31 00:00:00"


def _latest_per_entity(
    staging: DataFrame,
    entity_key: str,
    event_time: str,
    tiebreakers: Sequence[str],
    via: str = "window",
) -> DataFrame:
    """Latest staging row per entity. ``via="agg"`` swaps the
    row_number window for the algebraic ``max_by`` twin
    (:func:`..dedup.top1_per_key_agg`) — value-identical because the
    order here is all-DESC (max of the (event_time, *tiebreakers)
    struct IS the window's first row). Both forms measured flat under
    a 13%-hot zipf key (STRESS.md round 15 ``--relational-skew``):
    Spark 4's WindowGroupLimit pre-reduces the rn=1 window map-side,
    and max_by partial-aggregates map-side. The agg form is the one
    whose immunity doesn't hinge on the optimizer recognizing the
    filter pattern."""
    if via not in ("window", "agg"):
        raise ValueError(f"unknown dedup via {via!r} (use 'window' or 'agg')")
    if via == "agg":
        from .dedup import top1_per_key_agg

        order = F.struct(
            F.col(event_time), *[F.col(t) for t in tiebreakers]
        )
        return top1_per_key_agg(staging, [entity_key], order)
    order = [F.col(event_time).desc()] + [F.col(t).desc() for t in tiebreakers]
    # default spread=False: staging slices are dim-to-moderate frames
    # behind reuse checkpoints; the narrow-input spread's extra
    # exchange measured +0.15 s against a ~0.1 s single-task window
    # (round-15 interleaved A/B)
    return top1_per_key(staging, [entity_key], order)


def scd2_initial_load(
    staging: DataFrame,
    entity_key: str,
    event_time: str,
    attr_cols: Sequence[str],
    hash_cols: Sequence[str],
    tiebreakers: Sequence[str] = (),
    dedup_via: str = "window",
) -> DataFrame:
    """W2 dedup -> typed insert with validity window + change hash.
    ``dedup_via="agg"`` is the skew-immune staging dedup (see
    :func:`_latest_per_entity`)."""
    latest = _latest_per_entity(staging, entity_key, event_time, tiebreakers, dedup_via)
    return latest.select(
        entity_key,
        *attr_cols,
        F.col(event_time).alias("event_time"),
        F.col(event_time).alias("valid_from"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
        record_hash(*hash_cols).alias("record_hash"),
    )


def scd2_merge(
    dim: DataFrame,
    staging: DataFrame,
    entity_key: str,
    event_time: str,
    attr_cols: Sequence[str],
    hash_cols: Sequence[str],
    tiebreakers: Sequence[str] = (),
    dedup_via: str = "window",
) -> DataFrame:
    """Incremental merge -> new dimension snapshot (join-based rewrite).

    ``dedup_via="agg"`` swaps the staging dedup window for the
    algebraic ``max_by`` aggregation (see :func:`_latest_per_entity`);
    value-identical, structurally skew-immune.

    Plan shape (round 8: the union branches used to re-run their
    shared subtrees — 9 shuffles in EXPLAIN_AUDIT): ``inc`` (consumed
    by the change-detection join AND the brand-new anti-join) and the
    joined frame ``j`` (consumed by THREE union branches) are lazily
    local-checkpointed, so the staging dedup window and the wide join
    each execute once; blocks are reclaimed when the result frame is
    GC'd (repo caching convention — no clearCache() obligation leaks
    to the caller, incl. the per-batch streaming wrapper).
    """
    inc = (
        _latest_per_entity(staging, entity_key, event_time, tiebreakers, dedup_via)
        .select(
            F.col(entity_key).alias("__k"),
            *[F.col(c).alias(f"__{c}") for c in attr_cols],
            F.col(event_time).alias("__t"),
            record_hash(*hash_cols).alias("__h"),
        )
    )
    inc = lazy_checkpoint(inc)

    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    j = lazy_checkpoint(
        current.join(inc, current[entity_key] == inc["__k"], "left")
    )

    # I4 guard: strictly newer AND changed
    is_changed = F.col("__k").isNotNull() & (F.col("__t") > F.col("event_time")) & (
        F.col("__h") != F.col("record_hash")
    )

    untouched_current = j.filter(~F.coalesce(is_changed, F.lit(False))).select(dim.columns)

    closed_out = (
        j.filter(is_changed)
        .withColumn("valid_to", F.col("__t"))
        .withColumn("is_current", F.lit(False))
        .select(dim.columns)
    )

    new_versions = j.filter(is_changed).select(
        F.col("__k").alias(entity_key),
        *[F.col(f"__{c}").alias(c) for c in attr_cols],
        F.col("__t").alias("event_time"),
        F.col("__t").alias("valid_from"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.col("__h").alias("record_hash"),
    )

    dim_keys = dim.select(F.col(entity_key).alias("__dk")).distinct()
    brand_new = (
        inc.join(dim_keys, inc["__k"] == dim_keys["__dk"], "left_anti")
        .select(
            F.col("__k").alias(entity_key),
            *[F.col(f"__{c}").alias(c) for c in attr_cols],
            F.col("__t").alias("event_time"),
            F.col("__t").alias("valid_from"),
            F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
            F.col("__h").alias("record_hash"),
        )
    )

    return (
        history.unionByName(untouched_current)
        .unionByName(closed_out)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )


def scd2_two_batch_single_shuffle(
    events: DataFrame,
    batch_col: Column,
    entity_key: str,
    event_time: str,
    attr_cols: Sequence[str],
    hash_cols: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Scale-optimized SCD2 for the common both-batches-from-one-source
    case: ONE hash aggregation replaces the generic path's two dedup
    windows + change-detection join + anti-join (4 shuffles -> 1).

    Both batches' latest events are computed simultaneously as
    *conditional struct-maxes* per entity (lexicographic max over
    (event_time, tiebreakers, attrs) == the total-order row_number
    pick), then the merge decision is row-local and the up-to-two dim
    rows per entity are exploded out. Result is identical to
    ``scd2_initial_load`` + :func:`scd2_merge` (asserted in tests).

    ``batch_col``: boolean column — True = initial batch, False =
    incremental batch.
    """
    payload = _twin_payload(event_time, tuple(tiebreakers), tuple(attr_cols))
    agg = events.groupBy(entity_key).agg(
        F.max(F.when(batch_col, payload)).alias("__init"),
        F.max(F.when(~batch_col, payload)).alias("__inc"),
    )
    rows = _twin_rows(event_time, tuple(attr_cols), tuple(hash_cols))
    exploded = agg.select(entity_key, F.explode(rows).alias("__d"))
    return exploded.select(entity_key, "__d.*")


@memo_column
def _twin_payload(
    event_time: str, tiebreakers: tuple, attr_cols: tuple
) -> Column:
    """The twin's per-batch struct-max payload — pure names/literals,
    memoized (round 16): rebuilt identically per query construction
    otherwise."""
    order_cols = [event_time, *tiebreakers]
    return F.struct(
        *[F.col(c) for c in order_cols], *[F.col(c) for c in attr_cols]
    )


@memo_column
def _twin_rows(event_time: str, attr_cols: tuple, hash_cols: tuple) -> Column:
    """The twin's merge-decision CASE/array forest (two full dim-row
    structs + md5 change hashes — the expensive construction piece,
    ~100 py4j round-trips). Pure names/literals, memoized."""

    def _hash(side: str) -> Column:
        return F.md5(
            F.concat_ws("|", *[F.col(f"{side}.{c}").cast("string") for c in hash_cols])
        )

    sentinel = F.lit(SENTINEL_TS).cast("timestamp")
    is_changed = (
        F.col("__inc").isNotNull()
        & F.col("__init").isNotNull()
        & (F.col(f"__inc.{event_time}") > F.col(f"__init.{event_time}"))
        & (_hash("__inc") != _hash("__init"))
    )
    is_new = F.col("__init").isNull() & F.col("__inc").isNotNull()

    def _row(side: str, valid_to: Column, current: Column) -> Column:
        t = F.col(f"{side}.{event_time}")
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in attr_cols],
            t.alias("event_time"),
            t.alias("valid_from"),
            valid_to.alias("valid_to"),
            current.alias("is_current"),
            _hash(side).alias("record_hash"),
        )

    return F.when(
        is_changed,
        F.array(
            _row("__init", F.col(f"__inc.{event_time}"), F.lit(False)),
            _row("__inc", sentinel, F.lit(True)),
        ),
    ).when(is_new, F.array(_row("__inc", sentinel, F.lit(True)))).when(
        F.col("__init").isNotNull(), F.array(_row("__init", sentinel, F.lit(True)))
    )


def with_surrogate_keys(dim: DataFrame, order_by: Sequence[str]) -> DataFrame:
    """W6 parity-mode sequential surrogate keys (global sort — document
    as parity-only; see :func:`with_surrogate_keys_scaled` for the
    scale path)."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return dim.withColumn("surrogate_key", F.row_number().over(w))


def with_surrogate_keys_scaled(
    dim: DataFrame,
    order_by: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """W6 scale-mode sequential surrogate keys: same deterministic
    1..N numbering as :func:`with_surrogate_keys` (given ``order_by``
    is a total order) with NO single-partition stage.

    Plan shape: range-partition on the key order, materialize that
    frame ONCE (``localCheckpoint(eager=True)``), per-partition
    ``row_number`` (window partitioned by the materialized partition
    id), ONE tiny driver action collecting the per-partition counts
    (``num_partitions`` rows), then a broadcast join adding cumulative
    offsets. Every wide stage runs at full parallelism — this replaces
    the reference's DB sequence (``section_58.py:229,302``) without
    serializing the pipeline the way the parity-mode global window
    does.

    The checkpoint is load-bearing, not an optimization:
    ``repartitionByRange`` samples its boundaries with a
    non-reproducible seed, so a *recomputed* range shuffle can land
    rows in different partitions than the ones the counts collect
    observed, producing duplicate/gapped keys. Freezing the ranged
    frame guarantees the counts and the numbering read the same
    physical partitioning. The trade-off is fail-fast semantics at
    cluster scale: checkpoint blocks are not replicated, so losing an
    executor fails the job rather than silently recomputing into a
    corrupt key assignment — the correct failure mode for key
    generation. Blocks are reclaimed when the frame is GC'd.
    """
    spark = dim.sparkSession
    n = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [F.col(c) for c in order_by]
    ranged = (
        dim.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in sizes:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets or [(0, 0)], ["__pid", "__off"])
    local = ranged.withColumn(
        "__rn", F.row_number().over(Window.partitionBy("__pid").orderBy(*cols))
    )
    # long, not int: the scale variant exists precisely for dims past
    # 2^31 rows, where an int key would wrap into collisions
    out = local.join(F.broadcast(off_df), "__pid").withColumn(
        "surrogate_key", (F.col("__off") + F.col("__rn")).cast("long")
    )
    return out.select(*dim.columns, "surrogate_key")
