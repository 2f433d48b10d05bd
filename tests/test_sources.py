"""Source connector tests with local fixtures (offline — opener/fetch
injected, file:// URLs)."""

from __future__ import annotations

import datetime as dt
import io
import zipfile
from pathlib import Path

import pytest

from open_data_pipelines_spark.schemas import SchemaValidationError
from open_data_pipelines_spark.sources.csv_source import read_csv_bronze, read_csv_header
from open_data_pipelines_spark.sources.discovery import (
    filter_ckan_resources,
    last_month,
    latest_month_link,
    monthly_links,
    month_table_name,
    resolve_redirect,
    scrape_links,
    select_product,
)
from open_data_pipelines_spark.sources.gtfs import GTFS_TABLES, load_gtfs_bundle
from open_data_pipelines_spark.sources.json_source import flatten_struct_columns, read_json_events
from open_data_pipelines_spark.sources.spreadsheet import (
    SpreadsheetEngineUnavailable,
    from_pandas_bronze,
    read_ods,
)
from open_data_pipelines_spark.sources.zip_source import extract_zip, fetch_and_extract


@pytest.fixture()
def landing(tmp_path):
    return str(tmp_path / "landing")


def _make_zip(path: Path, members: dict[str, str]) -> str:
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return str(path)


def test_extract_zip_glob_and_stream(tmp_path, landing):
    z = _make_zip(
        tmp_path / "bundle.zip",
        {"Data/NSPL_x.csv": "a,b\n1,2\n", "Docs/readme.txt": "no", "Data/other.csv": "a,b\n3,4\n"},
    )
    got = extract_zip(z, landing, member_glob="Data/*.csv")
    assert [Path(p).name for p in got] == ["NSPL_x.csv", "other.csv"]
    assert Path(got[0]).read_text() == "a,b\n1,2\n"


def test_extract_zip_flatten_collision_disambiguates(tmp_path, landing):
    z = _make_zip(
        tmp_path / "coll.zip",
        {"2024/data.csv": "a\n1\n", "2025/data.csv": "a\n2\n"},
    )
    got = extract_zip(z, landing, member_glob="*.csv")
    assert len(got) == len(set(got)) == 2  # no silent overwrite
    contents = sorted(Path(p).read_text() for p in got)
    assert contents == ["a\n1\n", "a\n2\n"]


def test_fetch_and_extract_file_url(tmp_path, landing):
    z = _make_zip(tmp_path / "dl.zip", {"events.json": "{}"})
    got = fetch_and_extract(f"file://{z}", landing, "*.json")
    assert len(got) == 1 and Path(got[0]).name == "events.json"


def test_read_csv_bronze_all_string_and_validation(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("﻿A,B,C\n1,x,\n2,y,3\nbad_row_with,too,many,fields\n")
    assert read_csv_header(str(p)) == ["A", "B", "C"]

    df = read_csv_bronze(spark, str(p), ["A", "B", "C"])
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    assert df.count() == 3  # extra-field row truncated to schema width

    with pytest.raises(SchemaValidationError):
        read_csv_bronze(spark, str(p), ["A", "B", "WRONG"])

    # lenient variant proceeds
    df2 = read_csv_bronze(spark, str(p), ["A", "B"], strict=False)
    assert df2.columns == ["A", "B"]


def test_gtfs_bundle(spark, tmp_path, landing):
    members = {
        "agency.txt": "agency_id,agency_name,agency_url,agency_timezone,agency_lang,agency_phone,agency_noc\n1,Bus Co,http://x,Europe/London,en,0,BC\n",
        "routes.txt": "route_id,agency_id,route_short_name,route_long_name,route_type\nr1,1,1A,One A,3\n",
        "ignored.txt": "not,a,gtfs,table\n",
    }
    z = _make_zip(tmp_path / "gtfs.zip", members)
    out = load_gtfs_bundle(spark, z, landing, register_views=True)
    assert set(out) == {"agency", "routes"}
    assert out["agency"].count() == 1
    assert spark.table("gtfs_routes").collect()[0]["route_short_name"] == "1A"
    assert set(GTFS_TABLES) >= set(out)


def test_json_events_flatten(spark, tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    (d / "e1.json").write_text(
        '{"event_reference": 1, "event_type": "PERMIT_GRANTED",'
        ' "object_data": {"permit_reference_number": "P1", "work_category": "Major"}}'
    )
    (d / "e2.json").write_text(
        '{"event_reference": 2, "event_type": "WORK_START",'
        ' "object_data": {"permit_reference_number": "P2", "work_category": "Minor"}}'
    )
    schema = (
        "event_reference BIGINT, event_type STRING, "
        "object_data STRUCT<permit_reference_number: STRING, work_category: STRING>"
    )
    from pyspark.sql.types import StructType

    df = read_json_events(spark, str(d), StructType.fromDDL(schema))
    assert set(df.columns) == {"event_reference", "event_type", "permit_reference_number", "work_category"}
    got = {r["event_reference"]: r["permit_reference_number"] for r in df.collect()}
    assert got == {1: "P1", 2: "P2"}


def test_discovery_dated_links():
    assert last_month(dt.date(2026, 1, 15)) == (2025, 12)
    assert latest_month_link("https://host/data", dt.date(2026, 8, 13)) == "https://host/data/2026/07.zip"
    assert monthly_links("u", (2025, 11), (2026, 2)) == [
        "u/2025/11.zip", "u/2025/12.zip", "u/2026/01.zip", "u/2026/02.zip",
    ]
    assert month_table_name(2025, 7) == "07_2025"


def test_discovery_ckan_filter():
    package = {
        "result": {
            "resources": [
                {"name": "EPD_SNOMED_202501", "format": "CSV", "url": "u1"},
                {"name": "EPD_SNOMED_202503", "format": "CSV", "url": "u3"},
                {"name": "EPD_SNOMED_202502", "format": "ZIP", "url": "u2"},
                {"name": "OTHER_202504", "format": "CSV", "url": "u4"},
            ]
        }
    }
    got = filter_ckan_resources(package, max_items=1)
    assert [r["url"] for r in got] == ["u3"]
    ranged = filter_ckan_resources(package, date_range=("202501", "202501"))
    assert [r["url"] for r in ranged] == ["u1"]


def test_discovery_scrape_and_redirect():
    html = """
    <a class="download-item__download-link" href="/files/swa.xls">SWA</a>
    <a href="/docs/road_stats.ods">ods</a>
    <a class="other" href="/x.zip">zip</a>
    """
    assert scrape_links(html, css_class="download-item__download-link") == ["/files/swa.xls"]
    assert scrape_links(html, href_pattern=r"\.ods$") == ["/docs/road_stats.ods"]
    assert resolve_redirect("u", fetch=lambda u: u + "/final") == "u/final"
    assert select_product([{"id": "A"}, {"id": "B", "format": "zip"}], "B")["format"] == "zip"


def test_spreadsheet_gating_and_pandas_bridge(spark):
    import pandas as pd

    # neither path is gated anymore (native stdlib parsers); a missing
    # file is a plain filesystem error on both
    from open_data_pipelines_spark.sources.spreadsheet import read_encrypted_xls

    with pytest.raises(FileNotFoundError):
        read_ods("/nonexistent.ods")
    with pytest.raises(FileNotFoundError):
        read_encrypted_xls("/nonexistent.xls")

    pdf = pd.DataFrame({"a": [1, None], "b": ["x", "y"]})
    df = from_pandas_bronze(spark, pdf)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = {r["b"]: r["a"] for r in df.collect()}
    assert rows["y"] is None and rows["x"] == "1.0"


def test_flatten_struct_nested(spark):
    df = spark.createDataFrame(
        [(1, ("a", (2, 3)))],
        "id INT, s STRUCT<x: STRING, inner: STRUCT<p: INT, q: INT>>",
    )
    flat = flatten_struct_columns(df, sep="_")
    assert set(flat.columns) == {"id", "s_x", "s_inner_p", "s_inner_q"}


def test_read_csv_bronze_reordered_header_aligns_by_name(spark, tmp_path):
    """Round-9 review find: Spark maps an explicit schema to CSV
    fields POSITIONALLY, so a file whose header carries the expected
    columns in a different order passed set validation and silently
    misaligned every column (stop_lat landing in stop_lon). The read
    must align by the file's own header and return template order."""
    p = tmp_path / "reordered.csv"
    p.write_text("B,C,A\nx,9,1\ny,8,2\n")
    df = read_csv_bronze(spark, str(p), ["A", "B", "C"])
    assert df.columns == ["A", "B", "C"]
    rows = sorted((r["A"], r["B"], r["C"]) for r in df.collect())
    assert rows == [("1", "x", "9"), ("2", "y", "8")]


def test_scrape_links_resolves_relative_hrefs():
    """Relative hrefs must resolve against the scraped page before the
    download step (urlopen('/x.xls') is 'unknown url type')."""
    html = '<a href="/files/swa.xls">SWA</a><a href="https://cdn.example/a.zip">z</a>'
    assert scrape_links(html, base_url="https://host.example/page") == [
        "https://host.example/files/swa.xls",
        "https://cdn.example/a.zip",
    ]
    # without base_url the raw hrefs pass through (back-compat)
    assert scrape_links(html)[0] == "/files/swa.xls"


def test_from_pandas_bronze_all_null_column(spark):
    """A sparse spreadsheet column with a header but no data is
    all-None after the NaN mapping; inference crashed on it — the
    explicit all-string schema must carry it as a NULL string column."""
    import pandas as pd

    pdf = pd.DataFrame({"a": ["x", "y"], "empty": [None, None]})
    df = from_pandas_bronze(spark, pdf)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert [r["empty"] for r in df.collect()] == [None, None]
