"""GeoPackage ingest (S6) — driver-side conversion to geo-parquet.

The reference iterates GeoPackage features with fiona, converts via
shapely to WKT strings and batch-inserts (``os_open_usrn.py:84-202``,
``built_up_areas.py:80-289`` including invalid-geometry repair with
``buffer(0)``, ``code_point.py:90-289``). Spark has no native
GeoPackage reader, so the strategy is:

1. driver-side convert ``.gpkg`` -> parquet rows of
   (attributes..., geometry WKT). Preferred engine is fiona+shapely
   when importable; otherwise the NATIVE fallback reads the GeoPackage
   directly — a GeoPackage is a SQLite database (stdlib ``sqlite3``)
   whose geometry BLOBs are a fixed "GP" header + standard WKB, both
   parsed here in pure python for 2D POINT/LINESTRING/POLYGON (+MULTI)
   geometries. Exotic cases (Z/M, curves, invalid geometries needing
   repair) still require the gated engines.
2. distributed everything-after: ``spark.read.parquet`` on the
   converted file; all geometry math is the expression layer in
   ``functions/spatial.py`` (planar WKT — no geo lib needed).

``load_geoparquet`` is the always-available path for pre-converted
data.
"""

from __future__ import annotations

import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession


class GeoEngineUnavailable(RuntimeError):
    pass


# --- native WKB -> WKT (2D, standard byte layout) ----------------------------
_WKB_TYPES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
              4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON"}


def _fmt(v: float) -> str:
    s = format(v, ".17g")
    return s[:-2] if s.endswith(".0") else s


def _read_points(buf: bytes, pos: int, n: int, fmt: str) -> tuple[str, int]:
    coords = struct.unpack_from(f"{fmt}{2 * n}d", buf, pos)
    txt = ", ".join(
        f"{_fmt(coords[i])} {_fmt(coords[i + 1])}" for i in range(0, 2 * n, 2)
    )
    return txt, pos + 16 * n


def _wkb_body(buf: bytes, pos: int) -> tuple[str, int]:
    endian = buf[pos]
    fmt = "<" if endian == 1 else ">"
    gtype = struct.unpack_from(f"{fmt}I", buf, pos + 1)[0]
    pos += 5
    if gtype not in _WKB_TYPES:
        raise GeoEngineUnavailable(
            f"WKB geometry type {gtype} needs fiona/shapely (Z/M or curve variant?)"
        )
    kind = _WKB_TYPES[gtype]
    if kind == "POINT":
        txt, pos = _read_points(buf, pos, 1, fmt)
        return f"POINT ({txt})", pos
    if kind == "LINESTRING":
        (n,) = struct.unpack_from(f"{fmt}I", buf, pos)
        txt, pos = _read_points(buf, pos + 4, n, fmt)
        return f"LINESTRING ({txt})", pos
    if kind == "POLYGON":
        (nrings,) = struct.unpack_from(f"{fmt}I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{fmt}I", buf, pos)
            txt, pos = _read_points(buf, pos + 4, n, fmt)
            rings.append(f"({txt})")
        return f"POLYGON ({', '.join(rings)})", pos
    # MULTI*: count + nested full WKB geometries
    (nparts,) = struct.unpack_from(f"{fmt}I", buf, pos)
    pos += 4
    parts = []
    for _ in range(nparts):
        part, pos = _wkb_body(buf, pos)
        # strip the inner type tag: MULTIPOINT ((x y), ...) style
        parts.append(part[part.index("(") :])
    return f"{kind} ({', '.join(parts)})", pos


def gpkg_wkb_to_wkt(blob: bytes) -> str:
    """GeoPackage geometry BLOB (GP header + WKB) -> WKT string."""
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    envelope_code = (flags >> 1) & 0b111
    env_bytes = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(envelope_code)
    if env_bytes is None:
        raise ValueError(f"invalid GeoPackage envelope code {envelope_code}")
    wkt, _ = _wkb_body(blob, 8 + env_bytes)
    return wkt


def gpkg_layers(gpkg_path: str) -> list[str]:
    """Feature layers declared in ``gpkg_contents`` (stdlib sqlite3)."""
    with sqlite3.connect(gpkg_path) as con:
        try:
            rows = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            ).fetchall()
        except sqlite3.OperationalError as ex:
            raise ValueError(f"{gpkg_path} is not a GeoPackage: {ex}") from ex
    return [r[0] for r in rows]


def gpkg_to_parquet_native(
    gpkg_path: str, out_parquet: str, layer: str | None = None
) -> str:
    """Pure-stdlib GeoPackage -> parquet (attributes + WKT geometry).

    Reads the layer's geometry column name from
    ``gpkg_geometry_columns`` and converts each GP-header WKB blob with
    :func:`gpkg_wkb_to_wkt`.
    """
    import os

    import pandas as pd

    if not os.path.exists(gpkg_path):
        # sqlite3.connect would silently create an empty db here
        raise FileNotFoundError(gpkg_path)
    with sqlite3.connect(gpkg_path) as con:
        if layer is None:
            layers = gpkg_layers(gpkg_path)
            if not layers:
                raise ValueError(f"no feature layers in {gpkg_path}")
            layer = layers[0]
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        if row is None:
            raise ValueError(f"layer {layer!r} has no registered geometry column")
        geom_col = row[0]
        cur = con.execute(f'SELECT * FROM "{layer}"')  # noqa: S608 - layer from gpkg metadata
        cols = [d[0] for d in cur.description]
        records = []
        for values in cur:
            rec = dict(zip(cols, values))
            blob = rec.pop(geom_col)
            rec["geometry"] = gpkg_wkb_to_wkt(blob) if blob is not None else None
            records.append(rec)
    pd.DataFrame(records).to_parquet(out_parquet, index=False)
    return out_parquet


def gpkg_to_parquet(gpkg_path: str, out_parquet: str, layer: str | None = None) -> str:
    """Convert a GeoPackage layer to parquet with a WKT geometry column.

    fiona+shapely when importable (full format coverage + invalid-
    geometry repair); otherwise the native sqlite3/WKB reader.
    """
    try:
        import fiona  # noqa: F401
        import shapely  # noqa: F401
    except ImportError:
        return gpkg_to_parquet_native(gpkg_path, out_parquet, layer)

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
