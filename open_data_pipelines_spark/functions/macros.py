"""Catalog 'macro' helpers (SURVEY.md §2.11, F3).

The reference's Jinja macros run introspective queries at compile time:
``get_tables_25()`` / ``get_tables_24()`` enumerate month tables via a
regex over information_schema (``macros/get_tables_25.sql:1-19``,
``table_name SIMILAR TO '\\d{2}_2025'``) and
``get_highway_authorities()`` collects a distinct value list
(``macros/get_highway_authorities.sql:1-18``). Spark equivalents are
driver-side catalog/collect calls producing the same compile-time
artifacts (a table list / an IN-list).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def get_tables(spark: SparkSession, pattern: str, database: str | None = None) -> list[str]:
    """Month-table enumeration: regex over the catalog (F3).

    ``get_tables(spark, r"\\d{2}_2025")`` mirrors the reference macro.
    """
    rx = re.compile(pattern)
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return sorted(t.name for t in tables if rx.fullmatch(t.name))


def union_tables(spark: SparkSession, names: list[str]) -> DataFrame:
    """The macros' use-site: UNION ALL over the enumerated tables
    (the engine-native replacement is ONE table partitioned by month —
    this helper exists for catalog-compat with table-per-month data)."""
    if not names:
        raise ValueError("no tables to union")
    out = spark.table(names[0])
    for n in names[1:]:
        out = out.unionByName(spark.table(n))
    return out


def get_value_list(df: DataFrame, col: str) -> list[str]:
    """Distinct-value IN-list macro (get_highway_authorities): a
    deliberate driver-side collect of a SMALL dimension column."""
    return sorted(r[0] for r in df.select(F.col(col)).distinct().collect() if r[0] is not None)
