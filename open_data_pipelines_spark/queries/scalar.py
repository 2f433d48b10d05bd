"""Scalar-function operator queries (SURVEY.md §2.3, §2.9 X2-X7) with
DuckDB oracles. Each demonstrates a cleaning/expression capability on
the harness tables; dirty inputs are synthesized deterministically
from clean columns (identically in both engines) where the harness
data is too clean to exercise the edge."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    clean_org_name,
    normalize_column_names,
    normalize_null_tokens,
    safe_cast,
)
from ..functions.hashing import record_hash
from ..functions.numeric import round_half_up
from ..session import pick_tables
from ..sources.json_source import parse_json_column


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return pick_tables(spark, sf_dir, *names)


# --- P4/P5/X5 safe_cast: TRY_CAST null-on-failure coercion ------------------
def q_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        safe_cast("o_orderpriority", "int").alias("priority_as_int"),  # always NULL
        safe_cast(F.substring("o_orderpriority", 1, 1), "bigint").alias("priority_num"),
        safe_cast("o_orderstatus", "double").alias("status_as_double"),  # always NULL
        safe_cast(F.concat(F.lit("20"), F.col("o_orderstatus")), "bigint").alias(
            "fabricated_num"  # NULL unless status is numeric — exercises mixed outcomes
        ),
        F.col("o_totalprice").cast("string").try_cast("double").alias("roundtrip_price"),
    )


ORACLE_SAFE_CAST = """
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INT) AS priority_as_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_num,
       TRY_CAST(o_orderstatus AS DOUBLE) AS status_as_double,
       TRY_CAST('20' || o_orderstatus AS BIGINT) AS fabricated_num,
       TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS roundtrip_price
FROM orders
"""


# --- P8/X3 string_clean: suffix strip + lower/substr/concat + fixups --------
def q_string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    # synthesize org-style names: 'CUSTOMER#17 COUNTY COUNCIL' etc.
    dirty = F.concat(
        F.upper("c_name"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(" COUNTY COUNCIL"))
        .when(F.col("c_custkey") % 3 == 1, F.lit(" BOROUGH COUNCIL"))
        .otherwise(F.lit("")),
    )
    out = customer.withColumn("dirty_name", dirty)
    return out.select(
        "c_custkey",
        "dirty_name",
        clean_org_name("dirty_name").alias("clean_name"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(" - ", "c_name", "c_mktsegment").alias("display_name"),
    )


ORACLE_STRING_CLEAN = """
WITH dirty AS (
  SELECT *, upper(c_name) ||
         CASE WHEN c_custkey % 3 = 0 THEN ' COUNTY COUNCIL'
              WHEN c_custkey % 3 = 1 THEN ' BOROUGH COUNCIL'
              ELSE '' END AS dirty_name
  FROM customer
)
SELECT c_custkey, dirty_name,
       CASE WHEN lower(trim(
              replace(replace(replace(replace(replace(replace(upper(dirty_name),
                ' COUNTY COUNCIL', ''), ' BOROUGH COUNCIL', ''), ' CITY COUNCIL', ''),
                ' DISTRICT COUNCIL', ''), 'LONDON BOROUGH OF ', ''), 'COUNCIL OF THE ', '')
            )) = 'peter' THEN 'peterborough'
            WHEN lower(trim(
              replace(replace(replace(replace(replace(replace(upper(dirty_name),
                ' COUNTY COUNCIL', ''), ' BOROUGH COUNCIL', ''), ' CITY COUNCIL', ''),
                ' DISTRICT COUNCIL', ''), 'LONDON BOROUGH OF ', ''), 'COUNCIL OF THE ', '')
            )) = '&' THEN 'and'
            ELSE lower(trim(
              replace(replace(replace(replace(replace(replace(upper(dirty_name),
                ' COUNTY COUNCIL', ''), ' BOROUGH COUNCIL', ''), ' CITY COUNCIL', ''),
                ' DISTRICT COUNCIL', ''), 'LONDON BOROUGH OF ', ''), 'COUNCIL OF THE ', '')
            )) END AS clean_name,
       lower(c_mktsegment) AS segment_lower,
       substr(c_name, 1, 8) AS name_prefix,
       concat_ws(' - ', c_name, c_mktsegment) AS display_name
FROM dirty
"""


# --- X6/X7 date_math: EXTRACT, INTERVAL, last_day, sentinel, ROUND ----------
def q_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(d + F.expr("INTERVAL 7 DAYS"), "yyyy-MM-dd").alias("plus_week"),
        F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        (d < F.lit("9999-12-31").cast("timestamp")).alias("is_current"),
        round_half_up(F.col("o_totalprice") / F.lit(30.0), 2).alias("daily_rate"),
    )


ORACLE_DATE_MATH = """
SELECT o_orderkey,
       CAST(date_part('year', o_orderdate) AS INT) AS order_year,
       CAST(date_part('month', o_orderdate) AS INT) AS order_month,
       CAST(date_part('day', o_orderdate) AS INT) AS order_day,
       strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
       CAST(date_part('day', last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_in_month,
       o_orderdate < TIMESTAMP '9999-12-31' AS is_current,
       CAST(floor((o_totalprice / 30.0) * 100.0 + 0.5) / 100.0 AS DOUBLE) AS daily_rate
FROM orders
"""


# --- X4 record_hash: md5(concat_ws('|', ...)) with NULL-skip ----------------
def q_record_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    # nullif makes some attrs NULL -> exercises concat_ws NULL-skip parity
    out = customer.withColumn("segment_or_null", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
    return out.select(
        "c_custkey",
        "segment_or_null",
        record_hash(
            F.col("c_name"), F.col("segment_or_null"), F.col("c_custkey"), F.col("c_nationkey")
        ).alias("record_hash"),
    )


ORACLE_RECORD_HASH = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS segment_or_null,
       md5(concat_ws('|', c_name, nullif(c_mktsegment, 'BUILDING'),
                     CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR)))
         AS record_hash
FROM customer
"""


# --- P3 null_normalize: junk tokens -> NULL ----------------------------------
def q_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    # synthesize the reference's dirty tokens deterministically
    dirty = (
        F.when(F.col("c_custkey") % 7 == 0, F.lit(""))
        .when(F.col("c_custkey") % 7 == 1, F.lit("nan"))
        .when(F.col("c_custkey") % 7 == 2, F.lit("None"))
        .when(F.col("c_custkey") % 7 == 3, F.lit(" "))
        .when(F.col("c_custkey") % 7 == 4, F.lit("null"))
        .otherwise(F.col("c_mktsegment"))
    )
    out = customer.withColumn("dirty_segment", dirty)
    return out.select(
        "c_custkey",
        "dirty_segment",
        normalize_null_tokens("dirty_segment").alias("clean_segment"),
        normalize_null_tokens("dirty_segment").isNull().alias("was_junk"),
    )


ORACLE_NULL_NORMALIZE = """
WITH dirty AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN ''
              WHEN c_custkey % 7 = 1 THEN 'nan'
              WHEN c_custkey % 7 = 2 THEN 'None'
              WHEN c_custkey % 7 = 3 THEN ' '
              WHEN c_custkey % 7 = 4 THEN 'null'
              ELSE c_mktsegment END AS dirty_segment
  FROM customer
)
SELECT c_custkey, dirty_segment,
       CASE WHEN dirty_segment IN ('', 'nan', 'NaN', 'None', 'null', ' ')
            THEN NULL ELSE dirty_segment END AS clean_segment,
       (CASE WHEN dirty_segment IN ('', 'nan', 'NaN', 'None', 'null', ' ')
             THEN NULL ELSE dirty_segment END) IS NULL AS was_junk
FROM dirty
"""


# --- P10 audit_ts (deterministic variant for the oracle) ---------------------
def q_audit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # production op is functions.cleaning.audit_timestamp (current_timestamp,
    # nondeterministic); the oracle-checked variant pins the clock.
    (supplier,) = _t(spark, sf_dir, "supplier")
    pinned = F.lit("2026-01-01 00:00:00")
    return supplier.select(
        "s_suppkey",
        "s_name",
        pinned.alias("date_time_processed"),
        F.concat(F.lit("Cleanup completed at "), pinned).alias("status_message"),
    )


ORACLE_AUDIT_TS = """
SELECT s_suppkey, s_name,
       '2026-01-01 00:00:00' AS date_time_processed,
       'Cleanup completed at ' || '2026-01-01 00:00:00' AS status_message
FROM supplier
"""


# --- S2 flatten_json: from_json -> struct -> flattened leaves ----------------
def q_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    flat = parse_json_column(
        events.select("event_id", "event_type", "props"), "props", "k BIGINT", sep="_"
    )
    return flat.select("event_id", "event_type", F.col("props_k").alias("k"))


ORACLE_FLATTEN_JSON = """
SELECT event_id, event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


# --- P1/P2 project_rename: column-name normalization -------------------------
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    ugly = part.select(
        F.col("p_partkey").alias("Part Key"),
        F.col("p_retailprice").alias("Retail-Price (USD)"),
        F.col("p_type").alias("Type/Category"),
    )
    return normalize_column_names(ugly)


ORACLE_PROJECT_RENAME = """
SELECT p_partkey AS part_key,
       p_retailprice AS retail_price_usd,
       p_type AS type_category
FROM part
"""


QUERIES = {
    "safe_cast": (q_safe_cast, ORACLE_SAFE_CAST),
    "string_clean": (q_string_clean, ORACLE_STRING_CLEAN),
    "date_math": (q_date_math, ORACLE_DATE_MATH),
    "record_hash": (q_record_hash, ORACLE_RECORD_HASH),
    "null_normalize": (q_null_normalize, ORACLE_NULL_NORMALIZE),
    "audit_ts": (q_audit_ts, ORACLE_AUDIT_TS),
    "flatten_json": (q_flatten_json, ORACLE_FLATTEN_JSON),
    "project_rename": (q_project_rename, ORACLE_PROJECT_RENAME),
}
