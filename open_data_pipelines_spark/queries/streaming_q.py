"""Event-time windowed aggregation (SURVEY.md §2.10 extension).

The reference has no continuous streaming (its "streaming" is bounded
-memory chunked HTTP ingest); tumbling/sliding windows over the
``events`` table are our idiomatic-Spark extension, marked as such.
This module checks the *semantics* in batch mode via ``F.window``
(byte-equal to the epoch-bucket algebra DuckDB runs); the actual
``readStream`` pipeline lives in ``streaming/windows.py`` and is
pytest-covered with file-source micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import decimal_sum
from ..session import load_tables


def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    win = events.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum("value", 2, "sum_value"),
    )
    return win.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


ORACLE_WINDOW_TUMBLING = """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h window, 30 min slide) — each event lands in
    two windows; DuckDB oracle replicates via a 2-row offset join."""
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    win = events.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return win.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "event_type",
        "n_events",
    )


ORACLE_WINDOW_SLIDING = """
WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(k)),
assigned AS (
  SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts)) - k * 1800000000
           AS window_start_us,
         event_type
  FROM events CROSS JOIN offsets
)
SELECT window_start_us, event_type, count(*) AS n_events
FROM assigned GROUP BY 1, 2
"""


QUERIES = {
    "window_tumbling": (q_window_tumbling, ORACLE_WINDOW_TUMBLING),
    "window_sliding": (q_window_sliding, ORACLE_WINDOW_SLIDING),
}
