"""Planar spatial queries (SURVEY.md §2.9 X8-X10, §2.5 J6, §2.4 F4).

The harness tables carry no geometry, so planar coordinates are
synthesized deterministically from keys (same arithmetic in both
engines) — integer coordinates keep every distance test exact. The
WKT round-trip (make POINT -> regexp-parse -> centroid) mirrors the
reference's geometry-as-WKT-string model (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.spatial import (
    linestring_centroid_x,
    linestring_centroid_y,
    wkt_coords,
    wkt_point,
    wkt_point_x,
    wkt_point_y,
)
from ..operators.joins import range_join_within_auto
from ..session import pick_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return pick_tables(spark, sf_dir, *names)


# --- X8/X10 centroid_xy: WKT construct -> parse -> centroids (both families) -
def q_centroid_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two WKT centroid families in one labeled frame (round-3 merge of
    the former ``linestring_centroid`` entry — both stay independently
    computed; the union is a zero-shuffle concat):

    - ``kind='brand_points'``: POINT construct -> regex parse ->
      per-brand mean centroid (grouped; X8/X10 round trip).
    - ``kind='linestring'``: per-row vertex-mean centroid of synthesized
      3-vertex LINESTRINGs (ST_Centroid analog; the reference computes
      centroids of permit work-location linestrings,
      ``stg_emergency_works_by_authority.sql:24-38``).
    """
    part, supplier = _t(spark, sf_dir, "part", "supplier")
    pts = part.select(
        "p_partkey",
        "p_brand",
        wkt_point((F.col("p_partkey") * 37) % 1000, (F.col("p_partkey") * 91) % 1000).alias(
            "geometry"
        ),
    )
    parsed = pts.select(
        "p_brand",
        wkt_point_x("geometry").alias("x"),
        wkt_point_y("geometry").alias("y"),
        F.element_at(wkt_coords("geometry"), 1).try_cast("double").alias("x_via_coords"),
    )
    brand = parsed.groupBy("p_brand").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("centroid_x"),
        (F.sum("y") / F.count(F.lit(1))).alias("centroid_y"),
        F.sum((F.col("x") == F.col("x_via_coords")).cast("long")).alias("parse_agree"),
        F.count(F.lit(1)).alias("n_points"),
    ).select(
        F.lit("brand_points").alias("kind"),
        F.col("p_brand").alias("gkey"),
        F.lit(None).cast("string").alias("geometry"),
        "centroid_x",
        "centroid_y",
        "parse_agree",
        "n_points",
    )

    k = F.col("s_suppkey")
    geom = F.format_string(
        "LINESTRING (%s %s, %s %s, %s %s)",
        (k * 11 % 100).cast("string"),
        (k * 13 % 100).cast("string"),
        (k * 17 % 100).cast("string"),
        (k * 19 % 100).cast("string"),
        (k * 23 % 100).cast("string"),
        (k * 29 % 100).cast("string"),
    )
    lines = supplier.select("s_suppkey", geom.alias("geometry")).select(
        F.lit("linestring").alias("kind"),
        F.col("s_suppkey").cast("string").alias("gkey"),
        "geometry",
        linestring_centroid_x("geometry").alias("centroid_x"),
        linestring_centroid_y("geometry").alias("centroid_y"),
        F.lit(None).cast("long").alias("parse_agree"),
        (F.size(wkt_coords("geometry")) / F.lit(2)).cast("long").alias("n_points"),
    )
    return brand.unionByName(lines)


_PAIR_X = r"([-+]?\d+(?:\.\d+)?) [-+]?\d+(?:\.\d+)?"
_PAIR_Y = r"[-+]?\d+(?:\.\d+)? ([-+]?\d+(?:\.\d+)?)"
ORACLE_CENTROID_XY = f"""
WITH pts AS (
  SELECT p_brand,
         'POINT (' || CAST((p_partkey * 37) % 1000 AS VARCHAR) || ' '
                   || CAST((p_partkey * 91) % 1000 AS VARCHAR) || ')' AS geometry
  FROM part
), parsed AS (
  SELECT p_brand,
         TRY_CAST(regexp_extract(geometry, 'POINT \\(([-+]?\\d+(?:\\.\\d+)?) ', 1) AS DOUBLE) AS x,
         TRY_CAST(regexp_extract(geometry, 'POINT \\([-+]?\\d+(?:\\.\\d+)? ([-+]?\\d+(?:\\.\\d+)?)\\)', 1) AS DOUBLE) AS y,
         TRY_CAST(regexp_extract_all(geometry, '([-+]?\\d+(?:\\.\\d+)?)', 1)[1] AS DOUBLE) AS x_via_coords
  FROM pts
), lines AS (
  SELECT s_suppkey,
         'LINESTRING (' || CAST(s_suppkey * 11 % 100 AS VARCHAR) || ' '
           || CAST(s_suppkey * 13 % 100 AS VARCHAR) || ', '
           || CAST(s_suppkey * 17 % 100 AS VARCHAR) || ' '
           || CAST(s_suppkey * 19 % 100 AS VARCHAR) || ', '
           || CAST(s_suppkey * 23 % 100 AS VARCHAR) || ' '
           || CAST(s_suppkey * 29 % 100 AS VARCHAR) || ')' AS geometry
  FROM supplier
)
SELECT 'brand_points' AS kind,
       p_brand AS gkey,
       CAST(NULL AS VARCHAR) AS geometry,
       SUM(x) / count(*) AS centroid_x,
       SUM(y) / count(*) AS centroid_y,
       CAST(SUM(CAST(x = x_via_coords AS BIGINT)) AS BIGINT) AS parse_agree,
       count(*) AS n_points
FROM parsed GROUP BY p_brand
UNION ALL
SELECT 'linestring',
       CAST(s_suppkey AS VARCHAR),
       geometry,
       list_reduce(list_transform(regexp_extract_all(geometry, '{_PAIR_X}', 1),
                                  t -> CAST(t AS DOUBLE)), (a, x) -> a + x)
         / len(regexp_extract_all(geometry, '{_PAIR_X}', 1)),
       list_reduce(list_transform(regexp_extract_all(geometry, '{_PAIR_Y}', 1),
                                  t -> CAST(t AS DOUBLE)), (a, x) -> a + x)
         / len(regexp_extract_all(geometry, '{_PAIR_Y}', 1)),
       CAST(NULL AS BIGINT),
       CAST(len(regexp_extract_all(geometry, '([-+]?\\d+(?:\\.\\d+)?)', 1)) // 2 AS BIGINT)
FROM lines
"""


# --- J6/F4/X9 range_join_bbox: grid-partitioned planar range join -----------
def q_range_join_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    works = customer.select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % 500).alias("wx"),
        ((F.col("c_custkey") * 91) % 500).alias("wy"),
    )
    sites = supplier.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53) % 500).alias("sx"),
        ((F.col("s_suppkey") * 17) % 500).alias("sy"),
    )
    # auto strategy: supplier is a small dim at bench scale -> broadcast
    # bbox join; flips to the gridded equi-join when stats outgrow the
    # broadcast threshold (two-large-sides case). Crossover in STRESS.md.
    pairs = range_join_within_auto(works, sites, "wx", "wy", "sx", "sy", 25.0)
    dx = F.col("wx") - F.col("sx")
    dy = F.col("wy") - F.col("sy")
    return pairs.select(
        "c_custkey", "s_suppkey", (dx * dx + dy * dy).alias("dist_sq")
    )


ORACLE_RANGE_JOIN_BBOX = """
WITH works AS (
  SELECT c_custkey, (c_custkey * 37) % 500 AS wx, (c_custkey * 91) % 500 AS wy
  FROM customer
), sites AS (
  SELECT s_suppkey, (s_suppkey * 53) % 500 AS sx, (s_suppkey * 17) % 500 AS sy
  FROM supplier
)
SELECT w.c_custkey, s.s_suppkey,
       (w.wx - s.sx) * (w.wx - s.sx) + (w.wy - s.sy) * (w.wy - s.sy) AS dist_sq
FROM works w JOIN sites s
  ON w.wx >= s.sx - 25 AND w.wx <= s.sx + 25
 AND w.wy >= s.sy - 25 AND w.wy <= s.sy + 25
 AND (w.wx - s.sx) * (w.wx - s.sx) + (w.wy - s.sy) * (w.wy - s.sy) <= 625
"""


QUERIES = {
    "centroid_xy": (q_centroid_xy, ORACLE_CENTROID_XY),
    "range_join_bbox": (q_range_join_bbox, ORACLE_RANGE_JOIN_BBOX),
}
