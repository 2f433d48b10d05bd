from __future__ import annotations

import os

from open_data_pipelines_spark.plans.dag import Dag


def test_incremental_model_merges_on_unique_key(spark):
    batches = [
        [(1, "a1"), (2, "b1")],
        [(2, "b2"), (3, "c1")],  # updates key 2, adds key 3
    ]
    state = {"i": 0}

    def run_batch(i):
        dag = Dag()

        @dag.model("inc_model", materialize="incremental", unique_key="k")
        def inc_model(s):
            return s.createDataFrame(batches[i], ["k", "v"])

        return dag.run(spark)["inc_model"]

    try:
        out1 = {r["k"]: r["v"] for r in run_batch(0).collect()}
        assert out1 == {1: "a1", 2: "b1"}
        out2 = {r["k"]: r["v"] for r in run_batch(1).collect()}
        assert out2 == {1: "a1", 2: "b2", 3: "c1"}  # 2 replaced, 1 kept, 3 added
        # idempotent re-run of the same batch
        out3 = {r["k"]: r["v"] for r in run_batch(1).collect()}
        assert out3 == out2
    finally:
        spark.sql("DROP TABLE IF EXISTS inc_model")


def test_incremental_model_survives_orphaned_location(spark):
    """An interrupted run can orphan ``spark-warehouse/<name>/`` with no
    catalog entry; the materializer must clear it rather than die with
    LOCATION_ALREADY_EXISTS (the round-5 red-test scenario)."""
    name = "inc_orphan_model"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(warehouse, name)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-orphan.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    try:
        dag = Dag()

        @dag.model(name, materialize="incremental", unique_key="k")
        def inc_orphan_model(s):
            return s.createDataFrame([(1, "a")], ["k", "v"])

        out = {r["k"]: r["v"] for r in dag.run(spark)[name].collect()}
        assert out == {1: "a"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_incremental_model_in_non_default_database(spark):
    """Advice r6: the orphan guard and existence check must resolve
    against the session's CURRENT database. With current db != default,
    an orphaned ``<db>.db/<name>/`` directory must be cleared (not a
    same-named default-db table's location), and the merge must land in
    the current db."""
    db, name = "dag_alt_db", "inc_alt_model"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    spark.sql(f"DROP TABLE IF EXISTS default.{name}")
    db_location = spark.catalog.getDatabase(db).locationUri.removeprefix("file:")
    orphan = os.path.join(db_location, name)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "wb") as f:
        f.write(b"junk")
    # a same-named default-db table that must NOT be touched
    spark.createDataFrame([(99, "keep")], ["k", "v"]).write.mode("overwrite").saveAsTable(
        f"default.{name}"
    )
    spark.catalog.setCurrentDatabase(db)
    try:
        dag = Dag()

        @dag.model(name, materialize="incremental", unique_key="k")
        def inc_alt_model(s):
            return s.createDataFrame([(1, "a")], ["k", "v"])

        out = {r["k"]: r["v"] for r in dag.run(spark)[name].collect()}
        assert out == {1: "a"}
        assert spark.catalog.tableExists(f"{db}.{name}")
        default_rows = {r["k"]: r["v"] for r in spark.table(f"default.{name}").collect()}
        assert default_rows == {99: "keep"}
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
        spark.sql(f"DROP TABLE IF EXISTS default.{name}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_table_model_survives_orphaned_location(spark):
    name = "tbl_orphan_model"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(warehouse, name)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "wb") as f:
        f.write(b"junk")
    try:
        dag = Dag()

        @dag.model(name, materialize="table")
        def tbl_orphan_model(s):
            return s.createDataFrame([(1, "a")], ["k", "v"])

        out = {r["k"]: r["v"] for r in dag.run(spark)[name].collect()}
        assert out == {1: "a"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_incremental_adopts_orphaned_staging_table(spark):
    """Round-9 review find: the incremental merge used to overwrite
    the accumulated table in place — a mid-write failure destroyed the
    history. It now commits to <name>__staging then DROP+RENAME; the
    only non-durable instant is between those two statements, and a
    run that finds the main table gone but a committed staging table
    present must ADOPT the staging copy instead of rebuilding from
    one batch."""
    name = "inc_staging_model"
    batches = [
        [(1, "a1"), (2, "b1")],
        [(2, "b2"), (3, "c1")],
    ]

    def run_batch(i):
        dag = Dag()

        @dag.model(name, materialize="incremental", unique_key="k")
        def inc_staging_model(s):
            return s.createDataFrame(batches[i], ["k", "v"])

        return dag.run(spark)[name]

    try:
        run_batch(0)
        run_batch(1)
        # simulate the crash window: the merged result is committed in
        # staging, the main table already dropped
        spark.sql(f"ALTER TABLE {name} RENAME TO {name}__staging")
        out = {r["k"]: r["v"] for r in run_batch(1).collect()}
        # history survived: key 1 comes from batch 0, which only the
        # adopted staging copy carries
        assert out == {1: "a1", 2: "b2", 3: "c1"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}__staging")
