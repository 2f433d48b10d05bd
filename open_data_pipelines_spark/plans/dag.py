"""dbt-style transform DAG (SURVEY.md §2.2 K8, §3.3, §5).

The reference materializes an ordered SQL DAG via dbt
(``dbt_project.yml:36-56``): each model is CREATE TABLE AS SELECT with
``ref()`` dependencies, pre/post hooks (``clean_up.sql:3-9`` drops
intermediates), plus schema tests (unique / not_null) and singular
data tests (anti-join must return zero rows).

Here a model is ``name -> fn(spark) -> DataFrame`` with declared deps;
the runner topo-sorts, materializes each model as a temp view (or a
table for ``materialize='table'``), runs attached assertions, and
drops intermediates afterwards (the clean_up post-hook). Catalyst
optimizes each model exactly as DuckDB did for dbt (SURVEY.md §3.3).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class ModelTestFailure(AssertionError):
    pass


# --- reference-style assertion tests (SURVEY.md §5) --------------------------
def assert_unique(df: DataFrame, *cols: str) -> None:
    dup = df.groupBy(*cols).count().filter(F.col("count") > 1).count()
    if dup:
        raise ModelTestFailure(f"unique({cols}) violated: {dup} duplicated keys")


def assert_not_null(df: DataFrame, *cols: str) -> None:
    for c in cols:
        n = df.filter(F.col(c).isNull()).count()
        if n:
            raise ModelTestFailure(f"not_null({c}) violated: {n} nulls")


def assert_empty(df: DataFrame, description: str = "singular test") -> None:
    """Singular data test: query must return zero rows (e.g. the
    no-permit-in-both-lists anti-join)."""
    n = df.count()
    if n:
        raise ModelTestFailure(f"{description}: expected 0 rows, got {n}")


def assert_accepted_values(df: DataFrame, col: str, values: Sequence[str]) -> None:
    """dbt ``accepted_values`` test: every non-null value in the
    allowlist."""
    bad = df.filter(F.col(col).isNotNull() & ~F.col(col).isin(*values))
    n = bad.count()
    if n:
        sample = [r[0] for r in bad.select(col).distinct().limit(5).collect()]
        raise ModelTestFailure(f"accepted_values({col}) violated: {n} rows, e.g. {sample}")


def assert_relationship(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> None:
    """dbt ``relationships`` test: referential integrity — every
    non-null child key exists in the parent (left_anti must be empty)."""
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(parent, child[child_col] == parent[parent_col], "left_anti")
        .count()
    )
    if orphans:
        raise ModelTestFailure(
            f"relationship {child_col} -> {parent_col} violated: {orphans} orphans"
        )


def _clear_orphan_location(spark: SparkSession, table_name: str) -> None:
    """Remove a leftover warehouse directory for a table the catalog
    does not know about (e.g. an interrupted previous run orphaned
    ``spark-warehouse/<name>/``). Without this, ``saveAsTable`` on a
    fresh catalog dies with LOCATION_ALREADY_EXISTS — the reference's
    ``CREATE OR REPLACE TABLE`` (``src/databases/motherduck.py:69-71``)
    is immune by construction, so the engine must be too.

    Uses the Hadoop FileSystem API so it works on any warehouse
    (local disk, HDFS, S3A), not just local mode. The location is
    derived from the CURRENT database's catalog locationUri — not
    string-built from the warehouse dir — so with a non-default
    current database the guard deletes the directory ``saveAsTable``
    would actually write (``<db>.db/<name>``), never a same-named
    default-db table's data.
    """
    try:
        db_location = spark.catalog.getDatabase(spark.catalog.currentDatabase()).locationUri
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(db_location, table_name.lower())
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            log.warning("clearing orphaned table location %s", path.toString())
            fs.delete(path, True)
    except Exception:  # pragma: no cover - best effort; write surfaces real errors
        log.exception("failed to clear orphan location for %s", table_name)


@dataclass
class Model:
    name: str
    fn: Callable[[SparkSession], DataFrame]
    deps: Sequence[str] = ()
    materialize: str = "view"  # 'view' | 'table' | 'incremental'
    tests: Sequence[Callable[[DataFrame], None]] = ()
    keep: bool = True  # False -> dropped in cleanup (dbt post_hook)
    unique_key: str | None = None  # incremental: replaces matching rows


@dataclass
class Dag:
    models: dict[str, Model] = field(default_factory=dict)

    def model(
        self,
        name: str,
        deps: Sequence[str] = (),
        materialize: str = "view",
        tests: Sequence[Callable[[DataFrame], None]] = (),
        keep: bool = True,
        unique_key: str | None = None,
    ):
        """Decorator: ``@dag.model("m1", deps=["m0"])``."""

        def wrap(fn: Callable[[SparkSession], DataFrame]):
            self.models[name] = Model(name, fn, deps, materialize, tests, keep, unique_key)
            return fn

        return wrap

    def order(self) -> list[str]:
        ts = TopologicalSorter({m.name: set(m.deps) for m in self.models.values()})
        return list(ts.static_order())

    def run(self, spark: SparkSession, cleanup: bool = True) -> dict[str, DataFrame]:
        """Materialize in dependency order; run tests; drop non-keep
        views at the end (the reference's clean_up post-hook)."""
        out: dict[str, DataFrame] = {}
        for name in self.order():
            m = self.models[name]
            log.info("model %s (deps=%s)", name, list(m.deps))
            df = m.fn(spark)
            if m.materialize == "table":
                # resolve against the CURRENT database — saveAsTable
                # does, so the existence check and the orphan guard
                # must agree with it (advice r6)
                qualified = f"{spark.catalog.currentDatabase()}.{name}"
                if not spark.catalog.tableExists(qualified):
                    _clear_orphan_location(spark, name)
                df.write.mode("overwrite").saveAsTable(qualified)
                df = spark.table(qualified)
            elif m.materialize == "incremental":
                # dbt incremental semantics: first run = full build;
                # later runs merge the new batch into the existing table
                # (delete-on-unique-key + insert, as a join-rewrite —
                # no Delta dependency). The db-qualified name bypasses
                # any same-named TEMP VIEW (which unqualified
                # spark.table/tableExists would silently resolve to).
                db = spark.catalog.currentDatabase()
                qualified = f"{db}.{name}"
                staging = f"{name}__staging"
                qstaging = f"{db}.{staging}"
                if not spark.catalog.tableExists(qualified) and spark.catalog.tableExists(qstaging):
                    # crash recovery: a prior run committed the staging
                    # table but died between DROP and RENAME — adopt it
                    # instead of rebuilding from one batch (losing the
                    # accumulated history)
                    spark.sql(f"ALTER TABLE {qstaging} RENAME TO {name}")
                if spark.catalog.tableExists(qualified):
                    existing = spark.table(qualified)
                    if m.unique_key:
                        keys = df.select(m.unique_key).distinct()
                        existing = existing.join(
                            keys,
                            existing[m.unique_key] == keys[m.unique_key],
                            "left_anti",
                        )
                    # allowMissingColumns: later batches may add
                    # columns (schema evolution — old rows get NULLs)
                    merged = existing.unionByName(df, allowMissingColumns=True)
                    # staging-table swap, not an in-place overwrite: a
                    # direct overwrite drops the accumulated table
                    # before the rewrite commits, so a mid-write
                    # failure destroyed months of incremental history
                    # (round-9 review find). Writing to a sibling
                    # table also removes the self-read that previously
                    # forced an eager localCheckpoint of the whole
                    # merge. The only non-durable instant is between
                    # DROP and RENAME, and the recovery branch above
                    # heals exactly that window.
                    merged.write.mode("overwrite").option(
                        "overwriteSchema", "true"
                    ).saveAsTable(qstaging)
                    spark.sql(f"DROP TABLE {qualified}")
                    spark.sql(f"ALTER TABLE {qstaging} RENAME TO {name}")
                else:
                    # fresh catalog: survive an orphaned location left
                    # by an interrupted previous run
                    _clear_orphan_location(spark, name)
                    df.write.mode("overwrite").saveAsTable(qualified)
                df = spark.table(qualified)
            elif m.materialize == "view":
                df.createOrReplaceTempView(name)
            out[name] = df
            for test in m.tests:
                test(df)
        if cleanup:
            for name in self.order():
                m = self.models[name]
                if not m.keep and m.materialize == "view":
                    spark.catalog.dropTempView(name)
        return out
