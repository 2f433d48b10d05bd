"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``open_data_pipelines_spark.queries.registry()``: each
registered operator provides a (spark, sf_dir) -> DataFrame callable
and, where SQL-expressible, a DuckDB oracle SQL string. See SURVEY.md
§2 for the operator-by-operator mapping to the reference repo.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_data_pipelines_spark.queries import registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (impact-score pipeline, SURVEY.md §7 phase 0) at sf0.001."""
    from open_data_pipelines_spark.plans.impact import impact_scores

    return impact_scores(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in registry().items() if oracle is not None}
