"""Advanced relational queries: correlated-subquery decorrelation
(J8), session/rolling windows (engine extensions past the reference's
ranking-only window surface, SURVEY.md §2.7), skew-salted aggregation
and approx-distinct (§2.6 scale notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import approx_distinct, decimal_sum, salted_sum
from ..operators.asof import asof_join
from ..session import load_tables


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, register_views=False)["events"]


# --- J8 correlated_max: scalar-subquery predicate, decorrelated --------------
def q_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference shape: ``event_time > (SELECT MAX(event_time) FROM dim
    WHERE ref = staging.ref)`` (``section_58.py:349-353``). Decorrelated
    to pre-aggregate + join — the only plan that scales (a correlated
    scalar subquery is a per-row lookup)."""
    events = _events(spark, sf_dir)
    dim = (
        events.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(F.max("ts").alias("__max_ts"))
    )
    staged = events.filter(F.col("event_id") % 2 == 1)
    out = staged.join(dim, "user_id").filter(F.col("ts") > F.col("__max_ts"))
    return out.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))


ORACLE_CORRELATED_MAX = """
SELECT o.event_id, o.user_id, epoch_us(o.ts) AS ts_us
FROM events o
WHERE o.event_id % 2 = 1
  AND o.ts > (SELECT MAX(i.ts) FROM events i
              WHERE i.event_id % 2 = 0 AND i.user_id = o.user_id)
"""


# --- session_agg: gap-based sessions (F.session_window) ----------------------
_GAP_MIN = 30


def q_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    out = events.groupBy(
        F.session_window("ts", f"{_GAP_MIN} minutes").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        "user_id",
        "n_events",
    )


# gaps-and-islands replication; session boundary when the gap is >= the
# window (Spark sessions are half-open [start, last+gap))
ORACLE_SESSION_AGG = f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT epoch_us(min(ts)) AS session_start_us, user_id, count(*) AS n_events
FROM g GROUP BY user_id, session_id
"""


# --- salted_group_sum: skew-resistant two-stage aggregation ------------------
# NOT registered as a driver row since round 5: the driver window caps
# at 50 queries and this row's ANSWER is a plain GROUP BY duplicate —
# its value is the salted plan, which tests/test_macros_salting.py
# pins (salted_sum == plain sum row-for-row). Its slot went to
# corpus_funnel (queries/text.py), the flagship LLM-pipeline row.
def q_salted_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    return salted_sum(
        events,
        ["event_type"],
        F.col("value"),
        salt=F.col("event_id"),
        salt_mod=16,
        alias="sum_value",
    )


# salting never changes the answer — the oracle is the plain GROUP BY
ORACLE_SALTED_GROUP_SUM = """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


# --- approx_distinct: HLL++ scale variant, oracle-checked --------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketches differ per engine, so the raw approx count can't
    hash-match DuckDB. Instead emit (key, exact count, |approx-exact|/
    exact < 0.05) — the sketch still executes on the Spark side, and
    the boolean is literally TRUE in the oracle, making the whole frame
    hash-matchable. The sketch runs at rsd=0.02 against the 5%
    envelope: HLL++ is deterministic for fixed data (hash-based, no
    query-time randomness), and the measured max error across
    sf0.001/0.01/0.1 is 0.67% — >7x headroom (rsd=0.05 measured 6.7%
    at sf0.1, too close to the envelope)."""
    events = _events(spark, sf_dir)
    both = approx_distinct(events, ["event_type"], "user_id", rsd=0.02)
    exact = F.col("exact_user_id").cast("double")
    approx = F.col("approx_user_id").cast("double")
    return both.select(
        "event_type",
        F.col("exact_user_id").alias("exact_distinct"),
        (F.abs(approx - exact) / exact < F.lit(0.05)).alias("within_5pct"),
    )


ORACLE_APPROX_DISTINCT = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_distinct,
       TRUE AS within_5pct
FROM events GROUP BY event_type
"""


# --- A7 column_profile: per-column ELT profiling ----------------------------
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling battery (A7: the reference computes active/inactive
    nunique counts for metadata, ``geoplace_swa.py:141-148``) — one
    pass, one row per profiled column: rows/nulls/distinct/min/max."""
    orders = load_tables(spark, sf_dir, register_views=False)["orders"]

    def profile(col: str) -> DataFrame:
        c = F.col(col)
        return orders.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("row_count"),
            F.sum(c.isNull().cast("long")).alias("null_count"),
            F.countDistinct(c).alias("distinct_count"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )

    return profile("o_orderstatus").unionByName(profile("o_orderpriority"))


ORACLE_COLUMN_PROFILE = """
SELECT 'o_orderstatus' AS column_name, count(*) AS row_count,
       CAST(SUM(CAST(o_orderstatus IS NULL AS BIGINT)) AS BIGINT) AS null_count,
       count(DISTINCT o_orderstatus) AS distinct_count,
       CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
       CAST(max(o_orderstatus) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       CAST(SUM(CAST(o_orderpriority IS NULL AS BIGINT)) AS BIGINT),
       count(DISTINCT o_orderpriority),
       CAST(min(o_orderpriority) AS VARCHAR),
       CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
"""


# --- asof_join: latest-state-at-time enrichment ------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe = odd events, state = even events; each probe picks up the
    most recent state event_type at-or-before its timestamp per user.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    events = _events(spark, sf_dir)
    probe = events.filter(F.col("event_id") % 2 == 1)
    state = events.filter(F.col("event_id") % 2 == 0)
    # tie-break the state side to one row per (user_id, ts) BEFORE the
    # as-of: DuckDB's ASOF picks an ARBITRARY row among equal
    # timestamps while our operator picks deterministically, so oracle
    # parity on tied state rows would be luck, not contract (round-9
    # review find) — the dedup makes both engines' inputs tie-free
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").asc())
    state = (
        state.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = asof_join(probe, state, "user_id", "ts", ["event_type"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "event_type_asof",
    )


ORACLE_ASOF_JOIN = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.event_type,
       r.event_type AS event_type_asof
FROM (SELECT * FROM events WHERE event_id % 2 = 1) l
ASOF LEFT JOIN (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
    FROM events WHERE event_id % 2 = 0
  ) WHERE rn = 1
) r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# --- time_rollup: multi-granularity (hypertable-style) aggregate -------------
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (day, hour): per-hour rows + per-day subtotals +
    grand total in one pass (partial aggregation reuses the same
    shuffle — the idiomatic continuous-aggregate shape)."""
    events = _events(spark, sf_dir)
    d = F.date_format("ts", "yyyy-MM-dd").alias("day")
    h = F.hour("ts").alias("hour")
    return events.rollup(d, h).agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum("value", 2, "sum_value"),
    )


ORACLE_TIME_ROLLUP = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(date_part('hour', ts) AS INT) AS hour,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (day, hour)
"""


# --- pivot_agg: pivot + unpivot round trip -----------------------------------
def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns, then melt back to long form —
    BOTH reshape operators load-bearing in one oracle hash. Catalyst
    compiles pivot to the conditional aggregation the oracle spells
    out (one shuffle); ``DataFrame.unpivot`` is a zero-shuffle Expand
    (round 12). The explicit NOT-NULL filter mirrors DuckDB's UNPIVOT
    null-exclusion (Spark's unpivot KEEPS null cells)."""
    lineitem = load_tables(spark, sf_dir, register_views=False)["lineitem"]
    wide = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["qty_f", "qty_o"], "linestatus", "qty"
    ).filter(F.col("qty").isNotNull())


ORACLE_PIVOT_AGG = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CASE WHEN l_linestatus = 'F'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
         CAST(SUM(CASE WHEN l_linestatus = 'O'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, linestatus, qty
FROM wide UNPIVOT (qty FOR linestatus IN (qty_f, qty_o))
"""


# --- lag_delta: LAG/LEAD deltas + moving-frame rolling average ---------------
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window family, one shuffle: LAG/LEAD offsets and the 3-row
    rolling average share the identical (user_id, ts, event_id)
    ordering, so Catalyst evaluates them in a single Window node.
    (Absorbed the former ``rolling_avg`` registry entry in round 3 —
    same partitioning, same frame ordering, zero extra shuffles.)"""
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    frame = w.rowsBetween(-2, 0)
    rolling_sum = F.sum(F.col("value").cast("decimal(18,2)")).over(frame).cast("double")
    rolling_n = F.count(F.lit(1)).over(frame)
    return events.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
        (rolling_sum / rolling_n).alias("rolling_avg_3"),
    )


ORACLE_LAG_DELTA = """
SELECT event_id, user_id,
       value - lag(value) OVER w AS value_delta,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
       lead(event_type) OVER w AS next_event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
         / COUNT(*) OVER f AS rolling_avg_3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       f AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "pivot_agg": (q_pivot_agg, ORACLE_PIVOT_AGG),
    "lag_delta": (q_lag_delta, ORACLE_LAG_DELTA),
    "asof_join": (q_asof_join, ORACLE_ASOF_JOIN),
    "time_rollup": (q_time_rollup, ORACLE_TIME_ROLLUP),
    "column_profile": (q_column_profile, ORACLE_COLUMN_PROFILE),
    "correlated_max": (q_correlated_max, ORACLE_CORRELATED_MAX),
    "session_agg": (q_session_agg, ORACLE_SESSION_AGG),
    "approx_distinct": (q_approx_distinct, ORACLE_APPROX_DISTINCT),
}
