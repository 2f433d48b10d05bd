"""Corrupt-record quarantine for CSV/JSON ingest.

The reference's malformed-row policy is drop-and-forget (row-length
filter, ``nhs_english_prescriptions.py:177,194-197``); mapped here as
DROPMALFORMED in :mod:`.csv_source`. At warehouse scale silent drops
are an audit hole: a feed that suddenly loses 40% of its rows to a
quoting change looks identical to a smaller feed. This module is the
production upgrade: PERMISSIVE capture of the raw malformed line into
``_corrupt_record``, split into a typed clean frame and a quarantine
frame (raw line + source file + ingest time), with the reject COUNT
going to the run-metadata log (K7) so drops page somebody.

One scan serves both outputs (the split is two filters on the same
cached read — Spark disallows selecting only the corrupt column from
a raw file scan, and the cache also prevents re-parsing); the
quarantine side appends to its own parquet so bad lines can be
re-driven after a parser fix — the replayable-dead-letter pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from one PERMISSIVE scan.

    ``clean`` carries ``schema`` exactly; ``quarantine`` is
    (corrupt_record, source_file, quarantined_at). The scan is cached:
    both frames are filters over it, and Spark refuses corrupt-only
    projections on an uncached raw scan. The cache is NOT
    self-releasing (the CacheManager pins it — ``caching.py``): run
    your actions on both frames then release via
    ``spark.catalog.clearCache()``, or use :func:`quarantined_ingest`,
    which owns the lifecycle and unpersists when done.
    """
    clean, quarantine, _ = _read_with_quarantine(spark, path, schema, fmt, options)
    return clean, quarantine


def _read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, quarantine, cached-scan) — the third element is the
    handle an owning caller must ``unpersist()``."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    # provenance columns must be stamped BEFORE the cache: evaluated
    # over the cached relation, input_file_name() is empty
    df = (
        reader.format(fmt)
        .load(path)
        .withColumn("__source_file", F.input_file_name())
        .withColumn("__quarantined_at", F.current_timestamp())
        .cache()
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("corrupt_record"),
        F.col("__source_file").alias("source_file"),
        F.col("__quarantined_at").alias("quarantined_at"),
    )
    return clean, quarantine, df


def quarantined_ingest(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_path: str,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
    log_path: str | None = None,
    table_name: str = "",
) -> tuple[DataFrame, int]:
    """Ingest with dead-lettering: returns (clean frame, reject
    count); rejects append to ``quarantine_path`` and, when
    ``log_path`` is given, the count lands in the K7 run-metadata log
    (one ``processor_type='quarantine'`` row with the reject count as
    ``rows_processed``)."""
    _, quarantine, cached = _read_with_quarantine(spark, path, schema, fmt, options)
    try:
        n_bad = quarantine.count()
        if n_bad:
            quarantine.write.mode("append").parquet(quarantine_path)
    finally:
        # the corrupt side is fully consumed above, so release the
        # cached PERMISSIVE scan instead of pinning one per ingested
        # feed for the session lifetime (round-9 review find)
        cached.unpersist()
    # the RETURNED clean frame is its own DROPMALFORMED scan — same
    # row set (corrupt-NULL rows == rows DROPMALFORMED keeps), but
    # with no corrupt column in the plan it cannot trip Spark's
    # corrupt-records-only restriction (a count() over the PERMISSIVE
    # clean filter prunes down to exactly that) and needs no cache
    reader = spark.read.schema(schema).option("mode", "DROPMALFORMED")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    clean = reader.format(fmt).load(path)
    if log_path is not None:
        from ..sinks.metadata import MetadataLogger

        with MetadataLogger(
            spark,
            log_path,
            table_name=table_name or path,
            processor_type="quarantine",
            quarantine_path=quarantine_path,
        ) as m:
            m.rows_processed = n_bad
    return clean, n_bad
