"""GeoPackage ingest (S6) — import-gated driver-side conversion.

The reference iterates GeoPackage features with fiona, converts via
shapely to WKT strings and batch-inserts (``os_open_usrn.py:84-202``,
``built_up_areas.py:80-289`` including invalid-geometry repair with
``buffer(0)``, ``code_point.py:90-289``). Spark has no native
GeoPackage reader, so the strategy is:

1. driver-side convert ``.gpkg`` -> parquet rows of
   (attributes..., geometry WKT) with fiona/pyogrio when available
   (import-gated — not in this container);
2. distributed everything-after: ``spark.read.parquet`` on the
   converted file; all geometry math is the expression layer in
   ``functions/spatial.py`` (planar WKT — no geo lib needed).

``load_geoparquet`` is the always-available path for pre-converted
data and the one exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class GeoEngineUnavailable(RuntimeError):
    pass


def gpkg_to_parquet(gpkg_path: str, out_parquet: str, layer: str | None = None) -> str:
    """Convert a GeoPackage layer to parquet with a WKT geometry column.

    Requires fiona + shapely (not installed here) — raises
    GeoEngineUnavailable so pipelines can skip or substitute
    pre-converted parquet.
    """
    try:
        import fiona  # noqa: F401
        import shapely  # noqa: F401
    except ImportError as ex:
        raise GeoEngineUnavailable(
            "fiona/shapely not installed — pre-convert the GeoPackage to "
            "parquet (geometry as WKT) and use load_geoparquet instead"
        ) from ex

    import pandas as pd
    from shapely.geometry import shape
    from shapely import wkt as shapely_wkt

    rows = []
    with fiona.open(gpkg_path, layer=layer) as src:  # pragma: no cover
        for feat in src:
            geom = shape(feat["geometry"])
            if not geom.is_valid:
                geom = geom.buffer(0)  # invalid-geometry repair
            rows.append({**feat["properties"], "geometry": shapely_wkt.dumps(geom)})
    pd.DataFrame(rows).to_parquet(out_parquet, index=False)
    return out_parquet


def load_geoparquet(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Distributed read of converted (attributes + WKT geometry) data."""
    return spark.read.parquet(parquet_path)
