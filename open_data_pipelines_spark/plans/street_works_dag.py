"""The flagship analytics DAG, dbt-model-shaped (SURVEY.md §3.3).

Mirrors the reference's model graph on the harness star schema:

    latest_line (staging, ephemeral)      [stg_* models]
    in_progress_list / completed_list     [in_progress/completed_list_england]
    permit_lists (union)                  [usrn_permit_details union]
    impact_scores (final, tested)         [impact_scores_england]
    no_overlap_check (singular test)      [assert_no_duplicate_permits_...]

with the reference's test surface: unique + not_null schema tests on
the final models and the zero-row singular overlap test
(``models/england_overview/test_in_progress_list_england.yml``,
``data_tests/assert_no_duplicate_permits_between_progress_and_completed_england.sql``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import top1_per_key
from ..operators.joins import anti_join
from ..session import load_tables
from .dag import Dag, assert_empty, assert_not_null, assert_unique
from .impact import impact_scores


def build_dag(sf_dir: str) -> Dag:
    dag = Dag()

    def tables(spark):
        return load_tables(spark, sf_dir, register_views=False)

    @dag.model("latest_line", keep=False)
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

    @dag.model(
        "in_progress_list",
        tests=[
            lambda df: assert_unique(df, "o_orderkey"),
            lambda df: assert_not_null(df, "o_orderkey"),
        ],
    )
    def in_progress_list(spark):
        t = tables(spark)
        returned = (
            t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
        )
        orders = t["orders"]
        return anti_join(
            orders.filter(F.col("o_orderstatus") == "O"),
            returned,
            orders["o_orderkey"] == returned["l_orderkey"],
        ).withColumn("list_type", F.lit("in_progress"))

    @dag.model(
        "completed_list",
        tests=[lambda df: assert_unique(df, "o_orderkey")],
    )
    def completed_list(spark):
        return (
            tables(spark)["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .withColumn("list_type", F.lit("completed"))
        )

    @dag.model("permit_lists", deps=["in_progress_list", "completed_list"], keep=False)
    def permit_lists(spark):
        return spark.table("in_progress_list").unionByName(spark.table("completed_list"))

    @dag.model(
        "no_overlap_check",
        deps=["in_progress_list", "completed_list"],
        keep=False,
        tests=[lambda df: assert_empty(df, "permit in both in-progress and completed")],
    )
    def no_overlap_check(spark):
        return spark.table("in_progress_list").join(
            spark.table("completed_list"), "o_orderkey", "inner"
        )

    @dag.model(
        "impact_scores",
        deps=["permit_lists"],
        tests=[
            lambda df: assert_unique(df, "nation"),
            lambda df: assert_not_null(df, "impact_score", "total_impact_level"),
        ],
    )
    def impact_model(spark):
        return impact_scores(spark, sf_dir)

    return dag
