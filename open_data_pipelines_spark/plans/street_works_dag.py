"""The flagship analytics DAG, dbt-model-shaped (SURVEY.md §3.3).

Mirrors the reference's model graph on the harness star schema:

    latest_line (staging, ephemeral)      [stg_* models]
    in_progress_list / completed_list     [in_progress/completed_list_*]
    permit_lists (union)                  [usrn_permit_details union]
    impact_scores (final, tested)         [impact_scores_*]
    no_overlap_check (singular test)      [assert_no_duplicate_permits_...]

with the reference's test surface: unique + not_null schema tests on
the final models and the zero-row singular overlap test
(``models/england_overview/test_in_progress_list_england.yml``,
``data_tests/assert_no_duplicate_permits_between_progress_and_completed_england.sql``).

The reference instantiates this model family TWICE — england_overview
and london_overview — with the London branch adding (a) a 35-authority
literal IN-list filter
(``models/london_overview/in_progress_list_london.sql:42-78``) and
(b) a CORRELATED exclusion subquery: a permit is excluded only when a
completed WORK_STOP event exists for the same permit in the SAME
authority (``:79-85``), with its own unique/not_null schema tests
(``test_in_progress_list.yml``). ``build_dag(scope="london")``
materializes that second instantiation on the harness schema:
authority = the customer's nation (orders -> customer -> broadcast
nation dim), the borough IN-list becomes a literal nation allowlist,
and the exclusion anti-join correlates on (order key, authority)
exactly like the reference's ``p.highway_authority =
permit_table.highway_authority`` predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import top1_per_key
from ..operators.joins import anti_join
from ..session import load_tables
from .dag import Dag, assert_empty, assert_not_null, assert_unique
from .impact import impact_scores

#: the harness stand-in for the reference's 35-borough literal
#: IN-list (``in_progress_list_london.sql:42-78``) — a fixed authority
#: allowlist the scoped DAG filters on. Nation names play the
#: highway-authority role on the star schema (same dim-table shape:
#: small, broadcastable, joined through the fact's customer key).
LONDON_AUTHORITIES = [
    "NATION_1",
    "NATION_3",
    "NATION_5",
    "NATION_7",
    "NATION_9",
    "NATION_11",
    "NATION_13",
    "NATION_17",
    "NATION_21",
]


def build_dag(sf_dir: str, scope: str = "england") -> Dag:
    """The model family at one authority scope.

    ``scope="england"`` is the unscoped branch (all authorities);
    ``scope="london"`` filters every list model to
    :data:`LONDON_AUTHORITIES` and switches the in-progress exclusion
    to the reference's correlated per-authority form. Model names are
    suffixed ``_london`` in that scope, mirroring dbt's second
    instantiation of the same SQL under new aliases.
    """
    if scope not in ("england", "london"):
        raise ValueError(f"unknown scope {scope!r}")
    london = scope == "london"
    suffix = "_london" if london else ""
    dag = Dag()

    def tables(spark):
        return load_tables(spark, sf_dir, register_views=False)

    def with_authority(spark, orders):
        """orders + authority (customer's nation name): the harness
        analog of the permit table's highway_authority column. The
        nation dim is tiny — Catalyst broadcasts both joins."""
        t = tables(spark)
        cust = t["customer"].select("c_custkey", "c_nationkey")
        nat = t["nation"].select("n_nationkey", F.col("n_name").alias("authority"))
        return (
            orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
            .drop("c_custkey", "c_nationkey", "n_nationkey")
        )

    @dag.model(f"latest_line{suffix}", keep=False)
    def latest_line(spark):
        lineitem = tables(spark)["lineitem"]
        return top1_per_key(
            lineitem,
            ["l_orderkey"],
            [
                F.col("l_shipdate").desc(),
                F.col("l_linenumber").desc(),
                F.col("l_quantity").desc(),
                F.col("l_returnflag").desc(),
            ],
        )

    in_progress_tests = [
        lambda df: assert_unique(df, "o_orderkey"),
        lambda df: assert_not_null(df, "o_orderkey"),
    ]
    if london:
        # test_in_progress_list.yml adds not_null on the second
        # carried column (uprn_count there; authority here)
        in_progress_tests.append(lambda df: assert_not_null(df, "authority"))

    @dag.model(f"in_progress_list{suffix}", tests=in_progress_tests)
    def in_progress_list(spark):
        t = tables(spark)
        orders = t["orders"]
        open_orders = orders.filter(F.col("o_orderstatus") == "O")
        if not london:
            returned = (
                t["lineitem"]
                .filter(F.col("l_returnflag") == "R")
                .select("l_orderkey")
                .distinct()
            )
            return anti_join(
                open_orders,
                returned,
                open_orders["o_orderkey"] == returned["l_orderkey"],
            ).withColumn("list_type", F.lit("in_progress"))
        # London branch: authority IN-list + the correlated exclusion —
        # an order is excluded only when a returned line exists for the
        # same order in the SAME authority (the reference's
        # `p.highway_authority = permit_table.highway_authority`
        # correlation, decorrelated into a two-key anti-join; the
        # returned side carries authority through the same dim joins)
        scoped = with_authority(spark, open_orders).filter(
            F.col("authority").isin(LONDON_AUTHORITIES)
        )
        returned = (
            with_authority(
                spark,
                t["lineitem"]
                .filter(F.col("l_returnflag") == "R")
                .select("l_orderkey")
                .join(orders.select("o_orderkey", "o_custkey"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .select("l_orderkey", "o_custkey"),
            )
            .select(
                F.col("l_orderkey").alias("r_orderkey"),
                F.col("authority").alias("r_authority"),
            )
            .distinct()
        )
        return anti_join(
            scoped,
            returned,
            (scoped["o_orderkey"] == returned["r_orderkey"])
            & (scoped["authority"] == returned["r_authority"]),
        ).withColumn("list_type", F.lit("in_progress"))

    @dag.model(
        f"completed_list{suffix}",
        tests=[lambda df: assert_unique(df, "o_orderkey")],
    )
    def completed_list(spark):
        done = tables(spark)["orders"].filter(F.col("o_orderstatus") == "F")
        if london:
            done = with_authority(spark, done).filter(
                F.col("authority").isin(LONDON_AUTHORITIES)
            )
        return done.withColumn("list_type", F.lit("completed"))

    @dag.model(
        f"permit_lists{suffix}",
        deps=[f"in_progress_list{suffix}", f"completed_list{suffix}"],
        keep=False,
    )
    def permit_lists(spark):
        return spark.table(f"in_progress_list{suffix}").unionByName(
            spark.table(f"completed_list{suffix}")
        )

    @dag.model(
        f"no_overlap_check{suffix}",
        deps=[f"in_progress_list{suffix}", f"completed_list{suffix}"],
        keep=False,
        tests=[lambda df: assert_empty(df, "permit in both in-progress and completed")],
    )
    def no_overlap_check(spark):
        return spark.table(f"in_progress_list{suffix}").join(
            spark.table(f"completed_list{suffix}"), "o_orderkey", "inner"
        )

    @dag.model(
        f"impact_scores{suffix}",
        deps=[f"permit_lists{suffix}"],
        tests=[
            lambda df: assert_unique(df, "nation"),
            lambda df: assert_not_null(df, "impact_score", "total_impact_level"),
        ],
    )
    def impact_model(spark):
        scores = impact_scores(spark, sf_dir)
        if london:
            # the reference's impact_scores_london restricts the same
            # final model to the borough list; the result is
            # per-authority (nation) grain, so filtering the tiny
            # output frame is plan-identical to filtering upstream
            scores = scores.filter(F.col("nation").isin(LONDON_AUTHORITIES))
        return scores

    return dag
