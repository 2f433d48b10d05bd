"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[str, tuple[callable, str | None]]``
mapping a SURVEY.md §2 operator name to
``(fn(spark, sf_dir) -> DataFrame, duckdb_oracle_sql_or_None)``.
``registry()`` merges them; ``__spark_entry__.py`` is a thin shim over
it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> dict[str, tuple[QueryFn, str | None]]:
    from . import (
        advanced,
        media,
        relational,
        scalar,
        scd2,
        similarity,
        spatial,
        streaming_q,
        text,
    )

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        relational,
        scalar,
        scd2,
        spatial,
        text,
        media,
        similarity,
        streaming_q,
        advanced,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(mod.QUERIES)
    return merged
