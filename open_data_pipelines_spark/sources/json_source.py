"""JSON ingest + nested-struct flattening (S1/S2).

The reference streams a ZIP of per-event JSON files and flattens each
dict recursively to dotted keys, then strips the ``object_data.``
prefix (``flatten_json`` at ``src/data_processors/street_manager.py:72-93``,
``rename_columns`` at ``:15-28``).

Spark-first: the distributed equivalent is ``spark.read.json`` (or
``from_json`` on a string column) producing *struct* columns, then a
schema-driven flatten — pure projection, no shuffle, fully pruned by
Catalyst (selecting ``a.b`` reads only that leaf from the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_struct_columns(df: DataFrame, sep: str = ".", strip_prefix: str = "") -> DataFrame:
    """Recursively flatten struct columns to ``parent<sep>child`` leaves.

    Equivalent of the reference's recursive dict flatten, but as a
    single SELECT the optimizer can prune into the scan.
    """
    cols: list[Column] = []

    def walk(field: T.StructField, path: str) -> None:
        if isinstance(field.dataType, T.StructType):
            for sub in field.dataType.fields:
                walk(sub, f"{path}.{sub.name}")
        else:
            name = path.replace(".", sep) if sep != "." else path
            if strip_prefix and name.startswith(strip_prefix):
                name = name[len(strip_prefix):]
            cols.append(F.col(path).alias(name))

    for f in df.schema.fields:
        walk(f, f.name)
    return df.select(*cols)


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strip_prefix: str = "object_data.",
) -> DataFrame:
    """Distributed read of a landing dir of JSON event files with a
    declared schema (never inferSchema in prod), flattened (S1+S2)."""
    raw = spark.read.schema(schema).json(path)
    return flatten_struct_columns(raw, sep="_", strip_prefix=strip_prefix.replace(".", "_"))


def parse_json_column(
    df: DataFrame, col: str, schema: T.StructType | str, sep: str = "_"
) -> DataFrame:
    """``from_json`` a string column into a struct then flatten —
    the in-flight variant for already-loaded string payloads."""
    return flatten_struct_columns(df.withColumn(col, F.from_json(F.col(col), schema)), sep=sep)
