"""Event-time windowed aggregation (SURVEY.md §2.10 extension).

The reference has no continuous streaming (its "streaming" is bounded
-memory chunked HTTP ingest); tumbling/sliding windows over the
``events`` table are our idiomatic-Spark extension, marked as such.
This module checks the *semantics* in batch mode via ``F.window``
(byte-equal to the epoch-bucket algebra DuckDB runs); the actual
``readStream`` pipeline lives in ``streaming/windows.py`` and is
pytest-covered with file-source micro-batches.

Round 3: the former separate ``window_sliding`` registry entry is
folded into ``window_tumbling`` as a labeled union (``kind`` column)
so both window families keep a driver CORRECTNESS row inside the
driver's 50-query check window. Each family is still an independent
groupBy with its own shuffle — the union is a zero-shuffle concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import decimal_sum
from ..session import load_tables


def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1 h) and sliding (1 h window / 30 min slide) event-time
    windows in one frame, discriminated by ``kind``. Sliding rows carry
    NULL ``sum_value`` (count-only family, as before the merge)."""
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    tumbling = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", 2, "sum_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sliding = (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("sliding").alias("kind"),
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    return tumbling.unionByName(sliding)


# sliding replicated in the oracle via a 2-row offset cross join (each
# event lands in exactly two 30-min-slide windows of a 1 h span)
ORACLE_WINDOW_TUMBLING = """
SELECT 'tumbling' AS kind,
       epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 2, 3
UNION ALL
SELECT 'sliding', window_start_us, event_type, count(*),
       CAST(NULL AS DOUBLE)
FROM (
  SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts)) - k * 1800000000
           AS window_start_us,
         event_type
  FROM events CROSS JOIN (SELECT * FROM (VALUES (0), (1)) AS t(k))
)
GROUP BY 2, 3
"""


QUERIES = {
    "window_tumbling": (q_window_tumbling, ORACLE_WINDOW_TUMBLING),
}
