from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.plans.dag import (
    Dag,
    ModelTestFailure,
    assert_empty,
    assert_not_null,
    assert_unique,
)
from open_data_pipelines_spark.plans.street_works_dag import build_dag
from open_data_pipelines_spark.sinks.metadata import MetadataLogger
from open_data_pipelines_spark.sinks.writers import (
    truncate_staging,
    write_month_partition,
    write_with_retry,
)
from tests.conftest import SF_SMOKE


def test_month_partition_overwrite_idempotent(spark, tmp_path):
    path = str(tmp_path / "facts")
    df1 = spark.createDataFrame(
        [(1, 2024, 1, "a"), (2, 2024, 2, "b")], ["id", "year", "month", "v"]
    )
    write_month_partition(df1, path)
    # reload month 1 with different content; month 2 must survive (I2)
    df2 = spark.createDataFrame([(9, 2024, 1, "a2")], ["id", "year", "month", "v"])
    write_month_partition(df2, path)
    got = {(r["year"], r["month"]): r["id"] for r in spark.read.parquet(path).collect()}
    assert got == {(2024, 1): 9, (2024, 2): 2}
    # partition pruning still sees the surviving month
    assert spark.read.parquet(path).filter("month = 2").count() == 1


def test_truncate_staging(spark, tmp_path):
    path = str(tmp_path / "staging")
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    df.write.parquet(path)
    truncate_staging(spark, path, df.schema)
    out = spark.read.parquet(path)
    assert out.count() == 0 and out.schema == df.schema


def test_write_with_retry_backoff():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("lease expired")

    write_with_retry(flaky, attempts=3, base_delay_s=0.0)
    assert len(calls) == 3

    with pytest.raises(RuntimeError):
        write_with_retry(lambda: (_ for _ in ()).throw(RuntimeError("boom")),
                         attempts=2, base_delay_s=0.0,
                         retryable=lambda e: "lease" in str(e))


def test_metadata_logger_success_and_failure(spark, tmp_path):
    path = str(tmp_path / "processing_logs")
    with MetadataLogger(spark, path, data_source="street_manager", batch="2024-01") as m:
        m.rows_processed = 42
    with pytest.raises(ValueError):
        with MetadataLogger(spark, path, data_source="street_manager"):
            raise ValueError("x" * 5000)
    logs = spark.read.parquet(path).collect()
    assert len(logs) == 2
    by_status = {r["status"]: r for r in logs}
    assert by_status["SUCCESS"]["rows_processed"] == 42
    assert by_status["SUCCESS"]["additional_info"] == '{"batch": "2024-01"}'
    assert by_status["FAILED"]["error_message"] is not None
    assert len(by_status["FAILED"]["error_message"]) == 1000  # truncation
    assert all(r["duration_seconds"] >= 0 for r in logs)


def test_dag_topo_order_and_cleanup(spark):
    dag = build_dag(SF_SMOKE)
    order = dag.order()
    assert order.index("in_progress_list") < order.index("permit_lists")
    assert order.index("permit_lists") < order.index("impact_scores")
    out = dag.run(spark)
    assert out["impact_scores"].count() > 0
    # ephemeral models dropped (clean_up post-hook), kept models remain
    views = {t.name for t in spark.catalog.listTables()}
    assert "latest_line" not in views and "permit_lists" not in views
    assert "in_progress_list" in views


def test_dag_assertion_failures(spark):
    dag = Dag()

    @dag.model("dup", tests=[lambda df: assert_unique(df, "k")])
    def dup(s):
        return s.createDataFrame([(1,), (1,)], ["k"])

    with pytest.raises(ModelTestFailure):
        dag.run(spark)

    dag2 = Dag()

    @dag2.model("nn", tests=[lambda df: assert_not_null(df, "k")])
    def nn(s):
        return s.createDataFrame([(None,)], "k INT")

    with pytest.raises(ModelTestFailure):
        dag2.run(spark)

    assert_empty(spark.createDataFrame([], "k INT"))  # passes
