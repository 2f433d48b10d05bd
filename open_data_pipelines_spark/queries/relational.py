"""Relational operator queries (SURVEY.md §2.4-2.8) on the harness
star schema, each paired with its DuckDB oracle SQL.

Determinism rules used throughout (see operators/aggregates.py):
- double sums go through DECIMAL and back (order-independent);
- timestamps/dates surface as formatted strings (identical rendering
  in both engines);
- every window carries a total order (explicit tiebreakers) — the
  reference's DISTINCT ON relies on engine-incidental row order
  (``in_progress_list_england.sql:7``), which we make deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import (
    conditional_count,
    conditional_sum,
    decimal_avg,
    decimal_sum,
    minmax_normalize,
    percent_rank_over,
)
from ..operators.dedup import top1_per_key
from ..operators.joins import anti_join, cast_key_join
from ..plans.impact import IMPACT_ORACLE_SQL, impact_scores
from ..plans.wellbeing import WELLBEING_OVERVIEW_ORACLE_SQL, wellbeing_overview
from ..functions.numeric import round_half_up
from ..session import pick_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return pick_tables(spark, sf_dir, *names)


# --- W1 distinct_on: one row per order, latest line (total order) ----------
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # sort keys must cover every surfaced column — (shipdate, linenumber)
    # alone is not unique in this data, and partial orders break ties
    # engine-dependently (SURVEY.md §7 watch list)
    out = top1_per_key(
        lineitem,
        ["l_orderkey"],
        [
            F.col("l_shipdate").desc(),
            F.col("l_linenumber").desc(),
            F.col("l_partkey").desc(),
            F.col("l_quantity").desc(),
        ],
        spread=True,  # wide-scan candidate: see top1_per_key (r15)
    )
    return out.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


ORACLE_DISTINCT_ON = """
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_shipdate DESC, l_linenumber DESC,
                                        l_partkey DESC, l_quantity DESC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --- J1/A1 join_count: inner equi-join + count per key ---------------------
def q_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partial-aggregation pushdown (round 12): the naive
    # join-then-groupBy shuffles every JOINED row (|lineitem| rows at
    # the join, |lineitem| again at the agg — billions at 100 TB).
    # Counting lineitem per key FIRST rides map-side combine, so the
    # only wide shuffle carries ~|distinct l_partkey| partial counts.
    # No explicit broadcast hint on part: it grows with SF, and a
    # forced hint would bypass the size threshold and hit the
    # broadcast hard limits at cluster scale — after the pre-agg both
    # sides are key-sized, so the threshold/AQE picks broadcast while
    # part fits and a co-partitioned join once it doesn't. The second
    # groupBy keeps the rewrite faithful when part carries duplicate
    # keys (count(*) multiplies per matching part row) and shuffles
    # only the key-sized frame. Same result set as the oracle's
    # join-then-count, proven by the driver hash at every SF.
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    per_key = lineitem.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.count(F.lit(1)).alias("__lcount")
    )
    return (
        per_key.join(part.select("p_partkey"), "p_partkey", "inner")
        .groupBy("p_partkey")
        .agg(F.sum("__lcount").alias("link_count"))
    )


ORACLE_JOIN_COUNT = """
SELECT p.p_partkey, count(*) AS link_count
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
GROUP BY p.p_partkey
"""


# --- J2/J3/J7 left_enrich: chained left joins, one CAST key, broadcast dims
def q_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, nation, region = _t(spark, sf_dir, "orders", "customer", "nation", "region")
    out = cast_key_join(orders, F.broadcast(customer), "o_custkey", "c_custkey", "int", "left")
    out = out.join(F.broadcast(nation), out["c_nationkey"] == nation["n_nationkey"], "left")
    out = out.join(F.broadcast(region), out["n_regionkey"] == region["r_regionkey"], "left")
    return out.select(
        "o_orderkey",
        "c_name",
        F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
        F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
        "o_totalprice",
    )


ORACLE_LEFT_ENRICH = """
SELECT o.o_orderkey, c.c_name,
       COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
       COALESCE(r.r_name, 'UNKNOWN') AS region_name,
       o.o_totalprice
FROM orders o
LEFT JOIN customer c ON CAST(o.o_custkey AS INT) = CAST(c.c_custkey AS INT)
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# --- J4 anti_join: NOT IN exclusion ----------------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    out = anti_join(orders, returned, orders["o_orderkey"] == returned["l_orderkey"])
    return out.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


ORACLE_ANTI_JOIN = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_returnflag = 'R' AND l.l_orderkey = o.o_orderkey)
"""


# J5 note (round 13): the former `semi_join_test` driver row
# (overlap_count of P-status orders vs F-status lineitems — the
# reference's "no permit in both lists" dbt data test) was retired to
# free a driver-window slot for `corpus_diff`: its left_semi + count
# shape duplicates `anti_join`'s existence-join semantics (same
# BroadcastHashJoin existence plan, inverted keep side), and
# `operators.joins.overlap_count` stays pytest-covered
# (tests/test_operators.py) and the dbt-style empty-overlap data test
# is exercised by tests/test_dbt_tests_simhash.py.


# --- U1 union_all: tagged union of two lists --------------------------------
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    in_prog = orders.filter(F.col("o_orderstatus") == "O").withColumn(
        "list_type", F.lit("in_progress")
    )
    completed = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "list_type", F.lit("completed")
    )
    return in_prog.unionByName(completed).select(
        "o_orderkey", "o_orderstatus", "list_type", "o_totalprice"
    )


ORACLE_UNION_ALL = """
SELECT o_orderkey, o_orderstatus, 'in_progress' AS list_type, o_totalprice
FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, o_orderstatus, 'completed' AS list_type, o_totalprice
FROM orders WHERE o_orderstatus = 'F'
"""


# --- F1/F2 filter_in_list: IN-list + NOT NULL predicates --------------------
def q_filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    # analog of the 35-value London authority IN-list + NOT NULL guards
    out = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    return out.select(
        "o_orderkey", "o_orderpriority", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
    )


ORACLE_FILTER_IN_LIST = """
SELECT o_orderkey, o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
"""


# --- A2 group_sum: multi-key GROUP BY + SUM ---------------------------------
def q_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        decimal_sum("l_quantity", 2, "sum_qty"),
        decimal_sum("l_extendedprice", 2, "sum_price"),
        F.count(F.lit(1)).alias("row_count"),
    )


ORACLE_GROUP_SUM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS row_count
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- A3/A6 cond_agg: SUM(CASE)/COUNT(CASE)/COUNT(DISTINCT) ------------------
def q_cond_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        conditional_sum(
            F.col("l_quantity") > 25,
            F.col("l_extendedprice").cast("decimal(18,2)"),
            "big_qty_price",
        ).cast("double").alias("big_qty_price"),
        conditional_count(F.col("l_discount") > 0.05, "discounted_count"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


ORACLE_COND_AGG = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     ELSE 0 END) AS DOUBLE) AS big_qty_price,
       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS discounted_count,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_returnflag
"""


# --- A4/W5 agg_battery: COUNT(DISTINCT) + AVG/MAX/MIN/SUM + final sort ------
def q_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            decimal_sum("o_totalprice", 2, "sum_price"),
            decimal_avg("o_totalprice", 6, "avg_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy(F.col("sum_price").desc())
    )


ORACLE_AGG_BATTERY = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) / count(o_totalprice) AS avg_price,
       max(o_totalprice) AS max_price,
       min(o_totalprice) AS min_price
FROM orders GROUP BY o_orderpriority ORDER BY sum_price DESC
"""


# --- W3 minmax_norm ---------------------------------------------------------
def q_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    grouped = orders.groupBy("o_custkey").agg(decimal_sum("o_totalprice", 2, "total_spend"))
    return minmax_normalize(grouped, "total_spend", "spend_score").select(
        "o_custkey", "total_spend", "spend_score"
    )


ORACLE_MINMAX_NORM = """
WITH grouped AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
), extremes AS (
  SELECT min(total_spend) AS mn, max(total_spend) AS mx FROM grouped
)
SELECT g.o_custkey, g.total_spend,
       CASE WHEN (e.mx - e.mn) = 0 THEN 50.0
            ELSE 1.0 + (100.0 - 1.0) * (g.total_spend - e.mn) / (e.mx - e.mn) END
         AS spend_score
FROM grouped g CROSS JOIN extremes e
"""


# --- A5+W4 pct_rank_grouped: PERCENT_RANK over grouped aggregate ------------
# Round 15: scope-union fold (the wellbeing/corpus_diff precedent) —
# scope='segment' keeps the original 5-row window-over-aggregate;
# scope='running' adds a per-order cumulative spend by market segment
# computed with the SKEW-IMMUNE two-pass prefix sum
# (operators/aggregates.running_sum_scaled), giving the operator
# driver-oracle evidence at real row counts (orders-sized, not
# segment-sized). The oracle mirrors it as a plain decimal window
# running sum — the two forms are value-identical under a total order
# (o_orderkey is unique), which is exactly the operator's contract.
def q_pct_rank_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-over-aggregate (A5) plus the W4 0-100 percentile scaling
    (the wellbeing convention), unioned with the distributed running
    sum over raw orders; the single-partition window stays on
    <=segment cardinality — the documented safe use of
    percent_rank_over."""
    from ..operators.aggregates import running_sum_scaled

    orders, customer = _t(spark, sf_dir, "orders", "customer")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "inner"
    )
    grouped = joined.groupBy("c_mktsegment").agg(
        decimal_sum("o_totalprice", 2, "segment_total")
    )
    order = [F.col("segment_total").asc(), F.col("c_mktsegment").asc()]
    seg = percent_rank_over(grouped, order, "segment_rank")
    seg = percent_rank_over(seg, order, "segment_rank_pct", 100.0)
    seg = seg.select(
        F.lit("segment").alias("scope"),
        "c_mktsegment",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("segment_total").alias("val"),
        "segment_rank",
        "segment_rank_pct",
        F.lit(None).cast("double").alias("run_spend"),
    )
    run = running_sum_scaled(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        ["o_orderkey"],
        F.col("o_totalprice"),
        "run_spend",
        scale=2,
    ).select(
        F.lit("running").alias("scope"),
        "c_mktsegment",
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("val"),
        F.lit(None).cast("double").alias("segment_rank"),
        F.lit(None).cast("double").alias("segment_rank_pct"),
        "run_spend",
    )
    return seg.unionByName(run)


ORACLE_PCT_RANK_GROUPED = """
WITH grouped AS (
  SELECT c.c_mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
)
SELECT 'segment' AS scope, c_mktsegment,
       CAST(NULL AS BIGINT) AS o_orderkey,
       segment_total AS val,
       percent_rank() OVER (ORDER BY segment_total ASC, c_mktsegment ASC) AS segment_rank,
       percent_rank() OVER (ORDER BY segment_total ASC, c_mktsegment ASC) * 100.0
         AS segment_rank_pct,
       CAST(NULL AS DOUBLE) AS run_spend
FROM grouped
UNION ALL
SELECT 'running' AS scope, c.c_mktsegment, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS val,
       CAST(NULL AS DOUBLE) AS segment_rank,
       CAST(NULL AS DOUBLE) AS segment_rank_pct,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY c.c_mktsegment ORDER BY o.o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --- A8/X7 wellbeing_formula: derived metric in agg --------------------------
def q_wellbeing_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROUND(2.10 * duration_days * SUM(households), 2) analog:
    # 2.10 * (priority ordinal as "duration") * sum(quantity) per flag
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    grouped = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        decimal_sum("l_quantity", 2, "sum_qty")
    )
    # round_half_up, not F.round: the engines' native rounds disagree
    # on .xx5 boundaries (functions/numeric.py). Safe today only
    # because harness quantities are integer-valued — the explicit
    # floor-based form stays exact if that ever changes (round-9
    # review find); the oracle mirrors the same formula.
    out = grouped.withColumn(
        "wellbeing_impact",
        round_half_up(F.lit(2.10) * F.lit(7) * F.col("sum_qty"), 2),
    )
    return out.select("l_returnflag", "l_linestatus", "sum_qty", "wellbeing_impact")


ORACLE_WELLBEING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       (floor(2.10 * 7 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 100.0 + 0.5) / 100.0)
         AS wellbeing_impact
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- X1 impact_score: the flagship pipeline ---------------------------------
QUERIES = {
    "distinct_on": (q_distinct_on, ORACLE_DISTINCT_ON),
    "join_count": (q_join_count, ORACLE_JOIN_COUNT),
    "left_enrich": (q_left_enrich, ORACLE_LEFT_ENRICH),
    "anti_join": (q_anti_join, ORACLE_ANTI_JOIN),
    "union_all": (q_union_all, ORACLE_UNION_ALL),
    "filter_in_list": (q_filter_in_list, ORACLE_FILTER_IN_LIST),
    "group_sum": (q_group_sum, ORACLE_GROUP_SUM),
    "cond_agg": (q_cond_agg, ORACLE_COND_AGG),
    "agg_battery": (q_agg_battery, ORACLE_AGG_BATTERY),
    "minmax_norm": (q_minmax_norm, ORACLE_MINMAX_NORM),
    "pct_rank_grouped": (q_pct_rank_grouped, ORACLE_PCT_RANK_GROUPED),
    "wellbeing_formula": (q_wellbeing_formula, ORACLE_WELLBEING),
    "impact_score": (impact_scores, IMPACT_ORACLE_SQL),
    # Both reference instantiations of the wellbeing DAG in one frame
    # (emergency_wellbeing.sql + major_wellbeing.sql), keyed by `scope`
    # — one registry row covers the twin models within the driver's
    # 50-row correctness window.
    "wellbeing_pipeline": (wellbeing_overview, WELLBEING_OVERVIEW_ORACLE_SQL),
}
