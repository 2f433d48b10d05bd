"""open_data_pipelines_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the query and data-processing
capabilities of CHRISCARLON/open-data-pipelines (an ELT system for UK
open data: streamed ingest -> stringly-typed bronze -> typed silver ->
dbt-style SQL analytics DAG), built Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst + Tungsten physical
  execution (no hand-scheduled micro-batching).
- Partitioned tables (year/month columns) replace the reference's
  table-per-month layout; partition pruning replaces Jinja table
  selection.
- Built-in JVM expressions in the hot path; Arrow-batched pandas UDFs
  only where built-ins cannot express the semantics.

Layout:
    session     SparkSession factory tuned for local[32] and cluster use
    schemas     DDL-template dict -> StructType helpers, validation
    functions   scalar expression packs (cleaning, hashing, dates,
                spatial-on-planar-coords, text)
    operators   relational + incremental operators (dedup, joins,
                aggregates, SCD2, similarity, multimodal)
    sources     ingest connectors (CSV/JSON/ZIP/GTFS/spreadsheet)
    sinks       writers + run-metadata logging
    plans       dbt-style ordered transform DAG with assertion tests
    streaming   Structured Streaming equivalents (windows, stateful)
"""

__version__ = "0.1.0"
