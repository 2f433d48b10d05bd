"""Driver-built dimension frames (engine-internal helper).

Operators that ship a small driver-side table into a plan — trained
model tables, PSL rule tables, URL blocklists, union-find label
frames, eval benchmarks — used ``createDataFrame(sc.parallelize(rows,
k))``: an opaque ``LogicalRDD`` whose pickled Python rows are decoded
by a PYTHON WORKER on every executing consumer. Round-15 event logs
measured ~0.17-0.22 s per consuming segment for these
PythonRDD+ParallelCollectionRDD stages — nine of them per corpus-
funnel pass (~1.9 s), each in its own single-task job (guide §4: the
JVM<->Python boundary is pure overhead for a static table; guide §5:
the driver should ship bytes once).

:func:`dim_frame` keeps the rows driver-side instead, as an
Arrow-converted **LocalRelation**:

- a ``BroadcastExchange`` over ``LocalTableScan`` collects the rows
  on the driver with NO job at all — the nine probe stages disappear
  from the funnel pass outright;
- non-broadcast consumers scan JVM ``InternalRow``s with no Python
  worker;
- unlike ``LogicalRDD`` (whose size statistic is the unknown-size
  default, so it NEVER auto-broadcasts without an explicit hint),
  a ``LocalRelation`` carries accurate size stats — the planner can
  pick the broadcast side by itself.

The one environment where the RDD form is load-bearing stays on it:
under ``SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1`` (the explain-audit /
debugging kill switch, ``caching.py``) reuse checkpoints no-op and a
deep composition re-embeds every shared subtree once per consumer.
A LocalRelation's driver-held rows would then ride each re-embedded
copy through Catalyst's whole-plan passes (`sameResult` data
comparisons, driver-side `ConvertToLocalRelation` evaluation per
copy) — the round-13 hazard class the RDD opacity was introduced
for. The flag therefore selects the representation only; the VALUES
are identical either way, and audit-mode plans are byte-identical to
the pre-round-15 shape.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dim_frame(
    spark: SparkSession,
    rows: Sequence,
    schema: str | T.StructType,
    slices: int = 1,
) -> DataFrame:
    """A small driver-built table as a plan-friendly DataFrame.

    Production: Arrow-converted LocalRelation (no Python worker, no
    job per broadcast build, accurate size stats). Under
    ``SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1``: the opaque
    ``parallelize(rows, slices)`` LogicalRDD the audit mode relies on.
    ``slices`` only applies to that fallback (dim-sized frames get 1;
    callers with genuinely large label sets size it up).
    """
    rows = list(rows)
    # The LocalRelation path depends on Arrow conversion being on
    # (session.py sets it): with Arrow off, createDataFrame(pandas)
    # silently degrades to a parallelize over defaultParallelism
    # slices — strictly WORSE than the explicit bounded-slice RDD
    # form below (round-16 advice). Route such sessions to the RDD
    # form so the representation is at least the pre-round-15 shape.
    arrow_on = (
        str(
            spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        ).lower()
        == "true"
    )
    if os.environ.get("SPARK_GRAFT_NO_INTERNAL_CHECKPOINT") or not arrow_on:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, max(1, slices)), schema
        )
    struct = (
        schema
        if isinstance(schema, T.StructType)
        # public resolution of a DDL string without private parsers:
        # an empty createDataFrame is driver-only (no job, no rows)
        else spark.createDataFrame([], schema).schema
    )
    import pandas as pd

    # object dtype end-to-end: None stays NULL (a numeric dtype would
    # coerce it to NaN) and Arrow casts each column to the declared
    # Spark type — value fidelity pinned by tests/test_dimframe.py
    pdf = pd.DataFrame(rows, columns=struct.fieldNames(), dtype=object)
    return spark.createDataFrame(pdf, schema=struct)
