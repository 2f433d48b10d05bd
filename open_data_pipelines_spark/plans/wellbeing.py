"""Wellbeing-impact pipeline — the reference's second analytics DAG
(``dbt .../models/wellbeing_overview/*``), end to end on the harness
star schema:

  stg_emergency_works    emergency-category permits, deduped, with
                         planar work coordinates and a duration in
                         days (``stg_emergency_works_by_authority.sql``:
                         DISTINCT ON dedup :10,58-59, ST_Centroid
                         coords :24-38, duration math :40-48)
  int_postcodes          postcode points + household counts
                         (``int_postcodes.sql:44-50``)
  int_works_postcodes    ±radius bbox prefilter AND exact containment
                         (``int_emergency_works_postcodes_by_authority
                         .sql:32-38``)
  wellbeing              ROUND(2.10 * duration_days * SUM(households), 2)
                         per work, rolled up per authority
                         (``emergency_wellbeing.sql:18-26,44``)

Analog mapping: orders = permits (1-URGENT/2-HIGH = the emergency
categories), latest lineitem shipdate = actual end (duration),
customers = postcodes with synthesized planar coords and household
counts, nation = highway authority. The £2.10/household/day constant
and 500m->25u buffer radius mirror the reference's parameters.

Everything is exact-by-construction for the oracle: integer coords,
integer day differences, decimal-routed sums, floor-based rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..operators.aggregates import decimal_sum
from ..operators.dedup import top1_per_key
from ..operators.joins import range_join_within_gridded
from ..session import load_tables

POUNDS_PER_HOUSEHOLD_DAY = 2.10  # emergency_wellbeing.sql:23-26
RADIUS = 25.0  # 500 m analog on the synthesized grid

# The reference instantiates the wellbeing DAG twice and the twins differ
# ONLY by the work-category predicate (stg_emergency_works_by_authority
# .sql:53 `work_category_ref IN ('immediate_urgent','immediate_emergency')`
# vs stg_major_works_by_authority.sql:53 `work_category_ref = 'major'`).
# Analog on the harness star schema: order priorities play the category.
SCOPE_CATEGORIES: dict[str, tuple[str, ...]] = {
    "emergency": ("1-URGENT", "2-HIGH"),
    "major": ("3-MEDIUM",),
}


def stg_works(
    orders: DataFrame,
    lineitem: DataFrame,
    categories: tuple[str, ...] | None = None,
    scope_expr=None,
) -> DataFrame:
    """Permits with coords + duration days
    (stg_{emergency,major}_works_by_authority.sql). Exactly one of:

    - ``categories`` — keep permits in those categories (one twin);
    - ``scope_expr`` — a Column labeling each permit's scope (NULL =
      out of every scope, dropped); the label rides the output as
      ``scope`` so the overview runs the whole DAG once for all twins.

    The coordinate/duration analog formulas live ONLY here — both
    call forms share them, so they cannot drift apart.
    """
    if (categories is None) == (scope_expr is None):
        raise ValueError("pass exactly one of categories / scope_expr")
    latest_line = top1_per_key(
        lineitem.select("l_orderkey", "l_shipdate", "l_linenumber", "l_quantity"),
        ["l_orderkey"],
        [
            F.col("l_shipdate").desc(),
            F.col("l_linenumber").desc(),
            F.col("l_quantity").desc(),
        ],
        # wide-scan candidate feeding real per-key reduction: the
        # narrow-scan spread measured 4.2 -> 1.4 s on this DAG (r15)
        spread=True,
    ).select("l_orderkey", F.col("l_shipdate").alias("end_ts"))

    if categories is not None:
        scoped = orders.filter(F.col("o_orderpriority").isin(*categories))
        scope_cols: list = []
    else:
        scoped = orders.withColumn("scope", scope_expr).filter(
            F.col("scope").isNotNull()
        )
        scope_cols = ["scope"]
    scoped = scoped.filter(F.col("o_orderdate").isNotNull())
    out = scoped.join(latest_line, scoped["o_orderkey"] == latest_line["l_orderkey"], "inner")
    return out.select(
        *scope_cols,
        "o_orderkey",
        "o_custkey",
        ((F.col("o_orderkey") * 37) % 500).alias("wx"),
        ((F.col("o_orderkey") * 91) % 500).alias("wy"),
        F.greatest(F.datediff(F.col("end_ts"), F.col("o_orderdate")), F.lit(1)).alias(
            "duration_days"
        ),
    )


def int_postcodes(customer: DataFrame) -> DataFrame:
    """Postcode points with household counts (COALESCE-to-0 path is
    exercised by the modulo: some 'postcodes' carry 0 households)."""
    return customer.select(
        F.col("c_custkey").alias("postcode_id"),
        F.col("c_nationkey"),
        ((F.col("c_custkey") * 53) % 500).alias("px"),
        ((F.col("c_custkey") * 17) % 500).alias("py"),
        (F.col("c_custkey") % 7).alias("households"),
    )


def stg_emergency_works(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Emergency instantiation (stg_emergency_works_by_authority.sql)."""
    return stg_works(orders, lineitem, SCOPE_CATEGORIES["emergency"])


def _wellbeing_rollup(
    t: dict, works: DataFrame, group_prefix: tuple[str, ...] = ()
) -> DataFrame:
    """Shared downstream of both twins: range join to postcodes,
    per-work cost, per-authority rollup. ``group_prefix`` threads an
    optional discriminator column (``scope``) through both
    aggregations, so the overview runs the expensive stages ONCE."""
    postcodes = int_postcodes(t["customer"])

    # J6: bbox prefilter + exact distance, grid-partitioned (scale path)
    pairs = range_join_within_gridded(works, postcodes, "wx", "wy", "px", "py", RADIUS)

    # o_custkey rides the group keys (functionally dependent on
    # o_orderkey) — avoids re-joining the orders table afterwards just
    # to recover it
    per_work = pairs.groupBy(*group_prefix, "o_orderkey", "o_custkey", "duration_days").agg(
        F.count(F.lit(1)).alias("n_postcodes"),
        F.sum("households").alias("total_households"),
    )
    per_work = per_work.withColumn(
        "wellbeing_cost",
        round_half_up(
            F.lit(POUNDS_PER_HOUSEHOLD_DAY)
            * F.col("duration_days").cast("double")
            * F.col("total_households").cast("double"),
            2,
        ),
    )

    # roll up per authority (nation of the permit's customer)
    enriched = per_work.join(
        F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    ).join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"), "left")

    return enriched.groupBy(
        *group_prefix, F.coalesce("n_name", F.lit("UNKNOWN")).alias("authority")
    ).agg(
        F.count(F.lit(1)).alias("n_works"),
        F.sum("total_households").alias("total_households"),
        decimal_sum("wellbeing_cost", 2, "wellbeing_total_impact"),
    )


def wellbeing_impact(
    spark: SparkSession, sf_dir: str, scope: str = "emergency"
) -> DataFrame:
    t = load_tables(spark, sf_dir, register_views=False)
    works = stg_works(t["orders"], t["lineitem"], SCOPE_CATEGORIES[scope])
    return _wellbeing_rollup(t, works)


def major_wellbeing_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Major-works twin (major_wellbeing.sql:1-44) — same DAG, category
    predicate `work_category_ref = 'major'` re-expressed as the single
    '3-MEDIUM' priority on the analog schema."""
    return wellbeing_impact(spark, sf_dir, scope="major")


def wellbeing_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both reference instantiations of the wellbeing DAG — emergency
    (emergency_wellbeing.sql) and major (major_wellbeing.sql) — keyed
    by a `scope` discriminator, mirroring the two tables the
    reference's wellbeing_overview model family materializes.

    Single-pass plan: the scopes are DISJOINT category predicates, so
    instead of running the DAG per scope and unioning (two lineitem
    dedups, two range joins), the scope is assigned as a CASE column
    on the one orders scan and threads through the shared rollup as an
    extra group key — value-identical to the union-of-twins form
    (pinned by test) at half the work."""
    t = load_tables(spark, sf_dir, register_views=False)
    scope_expr = F.lit(None).cast("string")
    for scope, cats in reversed(SCOPE_CATEGORIES.items()):
        scope_expr = F.when(
            F.col("o_orderpriority").isin(*cats), F.lit(scope)
        ).otherwise(scope_expr)
    works = stg_works(t["orders"], t["lineitem"], scope_expr=scope_expr)
    return _wellbeing_rollup(t, works, group_prefix=("scope",))


def _oracle_sql(categories: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{c}'" for c in categories)
    return f"""
WITH latest_line AS (
  SELECT l_orderkey, l_shipdate AS end_ts FROM (
    SELECT l_orderkey, l_shipdate, row_number() OVER (
      PARTITION BY l_orderkey
      ORDER BY l_shipdate DESC, l_linenumber DESC, l_quantity DESC) AS rn
    FROM lineitem) WHERE rn = 1
),
works AS (
  SELECT o.o_orderkey, o.o_custkey,
         (o.o_orderkey * 37) % 500 AS wx,
         (o.o_orderkey * 91) % 500 AS wy,
         greatest(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(ll.end_ts AS DATE)), 1) AS duration_days
  FROM orders o JOIN latest_line ll ON o.o_orderkey = ll.l_orderkey
  WHERE o.o_orderpriority IN ({in_list}) AND o.o_orderdate IS NOT NULL
),
postcodes AS (
  SELECT c_custkey AS postcode_id, c_nationkey,
         (c_custkey * 53) % 500 AS px,
         (c_custkey * 17) % 500 AS py,
         c_custkey % 7 AS households
  FROM customer
),
pairs AS (
  SELECT w.o_orderkey, w.o_custkey, w.duration_days, p.households
  FROM works w JOIN postcodes p
    ON w.wx >= p.px - {RADIUS} AND w.wx <= p.px + {RADIUS}
   AND w.wy >= p.py - {RADIUS} AND w.wy <= p.py + {RADIUS}
   AND (w.wx - p.px) * (w.wx - p.px) + (w.wy - p.py) * (w.wy - p.py)
         <= {RADIUS * RADIUS}
),
per_work AS (
  SELECT o_orderkey, o_custkey, duration_days,
         count(*) AS n_postcodes,
         CAST(SUM(households) AS BIGINT) AS total_households
  FROM pairs GROUP BY o_orderkey, o_custkey, duration_days
),
costed AS (
  SELECT *,
         CAST(floor(({POUNDS_PER_HOUSEHOLD_DAY} * CAST(duration_days AS DOUBLE)
                     * CAST(total_households AS DOUBLE)) * 100.0 + 0.5) / 100.0
              AS DOUBLE) AS wellbeing_cost
  FROM per_work
),
enriched AS (
  SELECT c2.*, c.c_nationkey, n.n_name
  FROM costed c2
  LEFT JOIN customer c ON c2.o_custkey = c.c_custkey
  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT COALESCE(n_name, 'UNKNOWN') AS authority,
       count(*) AS n_works,
       CAST(SUM(total_households) AS BIGINT) AS total_households,
       CAST(SUM(CAST(wellbeing_cost AS DECIMAL(18,2))) AS DOUBLE)
         AS wellbeing_total_impact
FROM enriched GROUP BY COALESCE(n_name, 'UNKNOWN')
"""


WELLBEING_ORACLE_SQL = _oracle_sql(SCOPE_CATEGORIES["emergency"])
MAJOR_WELLBEING_ORACLE_SQL = _oracle_sql(SCOPE_CATEGORIES["major"])

WELLBEING_OVERVIEW_ORACLE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{scope}' AS scope, * FROM ({_oracle_sql(cats)})"
    for scope, cats in SCOPE_CATEGORIES.items()
)
