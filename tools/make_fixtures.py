"""Generate the checked-in binary smoke fixtures under tests/fixtures/.

Deterministic, stdlib-only — re-run to regenerate:

    python tools/make_fixtures.py

- ``mini.gpkg``: a real GeoPackage (SQLite + gpkg_contents +
  gpkg_geometry_columns + one feature layer) with POINT / LINESTRING /
  POLYGON geometries as GP-header WKB blobs, exercising the native
  sqlite3 reader in ``sources/geopackage.py`` and (when fiona exists)
  the gated engine path.
- ``mini.ods``: a real OpenDocument spreadsheet (ZIP with mimetype,
  manifest, content.xml) with a header row + 3 data rows, readable by
  the gated odfpy engine and structurally validated without it.

No encrypted ``.xls`` fixture: authoring VelvetSweatshop encryption
requires the very libraries this container lacks (msoffcrypto decrypts
only; xlwt is absent), so the S9 real-engine test takes its fixture
from ``$SPARK_GRAFT_XLS_FIXTURE`` when an environment can provide one.
"""

from __future__ import annotations

import sqlite3
import struct
import zipfile
from pathlib import Path

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def gp_blob(wkb: bytes, srs_id: int = 27700) -> bytes:
    """Wrap standard WKB in a GeoPackage binary header (no envelope)."""
    return b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", srs_id) + wkb


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def wkb_linestring(coords: list[tuple[float, float]]) -> bytes:
    body = struct.pack("<BII", 1, 2, len(coords))
    for x, y in coords:
        body += struct.pack("<dd", x, y)
    return body


def wkb_polygon(ring: list[tuple[float, float]]) -> bytes:
    body = struct.pack("<BIII", 1, 3, 1, len(ring))
    for x, y in ring:
        body += struct.pack("<dd", x, y)
    return body


def make_gpkg(path: Path) -> None:
    path.unlink(missing_ok=True)
    con = sqlite3.connect(path)
    con.executescript(
        """
        PRAGMA application_id = 0x47504B47;  -- 'GPKG'
        CREATE TABLE gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
          definition TEXT NOT NULL, description TEXT);
        INSERT INTO gpkg_spatial_ref_sys VALUES
          ('OSGB36 / British National Grid', 27700, 'EPSG', 27700, 'undefined', NULL);
        CREATE TABLE gpkg_contents (
          table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME DEFAULT '2024-01-01T00:00:00.000Z',
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
          srs_id INTEGER);
        INSERT INTO gpkg_contents VALUES
          ('open_usrns', 'features', 'open_usrns', 'mini USRN layer',
           '2024-01-01T00:00:00.000Z', 530000, 180000, 532100, 180300, 27700);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL,
          CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
        INSERT INTO gpkg_geometry_columns VALUES
          ('open_usrns', 'geom', 'GEOMETRY', 27700, 0, 0);
        CREATE TABLE open_usrns (
          fid INTEGER PRIMARY KEY AUTOINCREMENT,
          usrn INTEGER NOT NULL, street_type TEXT, geom BLOB);
        """
    )
    rows = [
        (1, 8400001, "Designated Street Name", gp_blob(wkb_point(530100.0, 180200.0))),
        (
            2,
            8400002,
            "Officially Described Street",
            gp_blob(wkb_linestring([(531000.0, 180000.0), (531500.5, 180100.25), (532000.0, 180300.0)])),
        ),
        (
            3,
            8400003,
            "Unofficial Street Name",
            gp_blob(
                wkb_polygon(
                    [
                        (530000.0, 180000.0),
                        (530100.0, 180000.0),
                        (530100.0, 180100.0),
                        (530000.0, 180000.0),
                    ]
                )
            ),
        ),
        (4, 8400004, "No Geometry", None),
    ]
    con.executemany("INSERT INTO open_usrns VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()


ODS_CONTENT = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  office:version="1.2">
  <office:body><office:spreadsheet>
    <table:table table:name="Sheet1">
      <table:table-row>
        <table:table-cell office:value-type="string"><text:p>local_authority</text:p></table:table-cell>
        <table:table-cell office:value-type="string"><text:p>road_length_km</text:p></table:table-cell>
      </table:table-row>
      <table:table-row>
        <table:table-cell office:value-type="string"><text:p>Camden</text:p></table:table-cell>
        <table:table-cell office:value-type="float" office:value="312.5"><text:p>312.5</text:p></table:table-cell>
      </table:table-row>
      <table:table-row>
        <table:table-cell office:value-type="string"><text:p>Hackney</text:p></table:table-cell>
        <table:table-cell office:value-type="float" office:value="298"><text:p>298</text:p></table:table-cell>
      </table:table-row>
      <table:table-row>
        <table:table-cell office:value-type="string"><text:p>Islington</text:p></table:table-cell>
        <table:table-cell office:value-type="float" office:value="254.75"><text:p>254.75</text:p></table:table-cell>
      </table:table-row>
    </table:table>
  </office:spreadsheet></office:body>
</office:document-content>
"""

ODS_MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
  <manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>
  <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
  <manifest:file-entry manifest:full-path="styles.xml" manifest:media-type="text/xml"/>
</manifest:manifest>
"""

ODS_STYLES = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-styles xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" office:version="1.2"/>
"""


def make_ods(path: Path, content: str | None = None) -> None:
    path.unlink(missing_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        # the mimetype member must be FIRST and STORED per the ODF spec
        z.writestr(
            zipfile.ZipInfo("mimetype", (2024, 1, 1, 0, 0, 0)),
            "application/vnd.oasis.opendocument.spreadsheet",
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr(
            zipfile.ZipInfo("content.xml", (2024, 1, 1, 0, 0, 0)),
            ODS_CONTENT if content is None else content,
        )
        z.writestr(zipfile.ZipInfo("styles.xml", (2024, 1, 1, 0, 0, 0)), ODS_STYLES)
        z.writestr(
            zipfile.ZipInfo("META-INF/manifest.xml", (2024, 1, 1, 0, 0, 0)), ODS_MANIFEST
        )


# DFT-shaped variant: the real road-stats ODS carries 6 preamble rows
# (title, source notes, blank separators) before the header row
# (reference dft_road_stats.py:41-62, header_row default 6)
_DFT_PREAMBLE = "\n".join(
    f"""      <table:table-row>
        <table:table-cell office:value-type="string"><text:p>{t}</text:p></table:table-cell>
      </table:table-row>"""
    for t in (
        "RDL0202: Road lengths (fixture)",
        "Department for Transport statistics",
        "Source: fixture generator",
        "Notes: row layout mirrors the published ODS",
        "",
        "Units: kilometres",
    )
)
ODS_DFT_CONTENT = ODS_CONTENT.replace(
    "      <table:table-row>\n"
    '        <table:table-cell office:value-type="string"><text:p>local_authority</text:p></table:table-cell>',
    _DFT_PREAMBLE
    + "\n      <table:table-row>\n"
    '        <table:table-cell office:value-type="string"><text:p>local_authority</text:p></table:table-cell>',
)


def make_dft_ods(path: Path) -> None:
    # parametrized, not a module-global swap: the old try/finally
    # restore was non-reentrant and left the module poisoned for later
    # make_ods calls if the restore ever mishappened (round-9 review)
    make_ods(path, content=ODS_DFT_CONTENT)


def main() -> None:
    FIXTURES.mkdir(parents=True, exist_ok=True)
    make_gpkg(FIXTURES / "mini.gpkg")
    make_ods(FIXTURES / "mini.ods")
    make_dft_ods(FIXTURES / "dft_shape.ods")
    print(f"wrote {FIXTURES / 'mini.gpkg'}, {FIXTURES / 'mini.ods'}, {FIXTURES / 'dft_shape.ods'}")


if __name__ == "__main__":
    main()
