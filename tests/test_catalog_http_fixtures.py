"""Every catalog row resolves a concrete download URL OFFLINE from a
recorded HTTP fixture (VERDICT r4 task #9, carried from r3 #6).

``tests/fixtures/http/`` holds one trimmed recording per
network-touching row (gov.uk attachment markup, CKAN package_show,
OS Downloads API JSON, redirect targets — see its README). The
``fetch`` injectable replays the recording and asserts the pipeline
asked for exactly the configured ``base_url`` — so a catalog edit
that silently changes what a row fetches fails here, offline, not in
production. static / latest_month_link rows resolve with no payload;
asserting them in the same parametrized test keeps the 19/19 claim
in one place.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from open_data_pipelines_spark.sources.catalog import CATALOG, resolve_url

FIXTURES = Path(__file__).parent / "fixtures" / "http"

# row -> (payload file or None, expected resolved URL or suffix check)
RECORDINGS: dict[str, tuple[str | None, str]] = {
    "street_manager": (
        None,
        "https://opendata.manage-roadworks.service.gov.uk/permit/2025/06.zip",
    ),
    "section_58": (
        None,
        "https://opendata.manage-roadworks.service.gov.uk/section_58/2025/06.zip",
    ),
    "geoplace_swa": (
        "geoplace_swa.html",
        "https://www.geoplace.co.uk/documents/10181/150063/SWA_CODE.xls",
    ),
    "os_open_usrn": (
        "os_open_usrn.redirect.txt",
        "https://omseprd1stdstgeoce.blob.core.windows.net/downloads/OpenUSRN/"
        "osopenusrn_202508_gpkg.zip?sv=2023-11-03&sig=RECORDED",
    ),
    "os_usrn_uprn": (
        "os_usrn_uprn.json",
        "https://api.os.uk/downloads/v1/products/LIDS/downloads"
        "?area=GB&format=CSV&redirect",
    ),
    "bduk_premises_sept_2024": (
        "bduk_premises_sept_2024.html",
        "https://assets.publishing.service.gov.uk/media/"
        "66e9a7c3f5fc57066b64d1f2/"
        "bduk_premises_in_plans_england_wales_september_2024.ods",
    ),
    "bduk_premises_jul_2025": (
        "bduk_premises_jul_2025.html",
        "https://assets.publishing.service.gov.uk/media/"
        "6878d31da1f9b66c4e0de9c1/"
        "bduk_premises_in_plans_england_wales_july_2025.ods",
    ),
    "bduk_premises_sept_2025": (
        "bduk_premises_sept_2025.html",
        "https://assets.publishing.service.gov.uk/media/"
        "68bf02d1c3a7fe1d09a3b772/"
        "bduk_premises_in_plans_england_wales_september_2025.ods",
    ),
    "cadent_gas_underground_pipes": (None, "=cadent"),  # static: base_url itself
    "built_up_areas": (
        "built_up_areas.redirect.txt",
        "https://omseprd1stdstgeoce.blob.core.windows.net/downloads/BuiltUpAreas/"
        "os_open_built_up_areas_gpkg.zip?sv=2023-11-03&sig=RECORDED",
    ),
    "code_point": (
        "code_point.redirect.txt",
        "https://omseprd1stdstgeoce.blob.core.windows.net/downloads/CodePointOpen/"
        "codepo_gpkg_gb.zip?sv=2023-11-03&sig=RECORDED",
    ),
    "dft_road_stats": (
        "dft_road_stats.html",
        "https://assets.publishing.service.gov.uk/media/"
        "664c9f4a993111924d9d3f5b/rdl0202.ods",
    ),
    "naptan_data": (None, "=naptan"),
    "bods_timetables": (None, "=bods"),
    "postcode_p001": (None, "=static"),
    "postcode_p002": (None, "=static"),
    "national_statistic_postcode_lookup": (None, "=static"),
    "ons_uprn_directory": (
        "ons_uprn_directory.html",
        "https://www.arcgis.com/sharing/rest/content/items/"
        "8f3b3f4e9f0a4f0bb34d0a4c9f2e7c11/data/ONSUD_JUL_2025.zip",
    ),
    "nhs_english_prescribing_data": (
        "nhs_english_prescribing_data.json",
        "https://opendata.nhsbsa.net/datastore/dump/EPD_202506.csv",
    ),
}


def test_every_catalog_row_has_a_recording():
    assert RECORDINGS.keys() == CATALOG.keys()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_row_resolves_offline(name):
    cfg = CATALOG[name]
    payload_file, expected = RECORDINGS[name]

    asked: list[str] = []

    def fetch(url: str) -> str:
        asked.append(url)
        assert url == cfg.base_url, f"{name} fetched {url}, config says {cfg.base_url}"
        return (FIXTURES / payload_file).read_text()

    kwargs: dict = {}
    if cfg.discovery == "latest_month_link":
        kwargs = {"year": 2025, "month": 6}
    elif payload_file is not None:
        kwargs = {"fetch": fetch}

    resolved = resolve_url(cfg, **kwargs)

    if expected.startswith("="):
        # static rows: the recording IS the config URL
        assert resolved == cfg.base_url
    else:
        assert resolved == expected
    if payload_file is not None:
        assert asked == [cfg.base_url]
    # a resolved URL must be immediately downloadable
    assert resolved.startswith("https://")


def test_ckan_recording_picks_newest_csv_only():
    """The NHS recording carries a decoy PARQUET resource and
    out-of-order months; resolution must pick the newest CSV."""
    payload = json.loads((FIXTURES / "nhs_english_prescribing_data.json").read_text())
    got = resolve_url(CATALOG["nhs_english_prescribing_data"], catalogue=payload)
    assert got.endswith("EPD_202506.csv")


def test_os_product_recording_picks_csv_format():
    payload = json.loads((FIXTURES / "os_usrn_uprn.json").read_text())
    got = resolve_url(CATALOG["os_usrn_uprn"], catalogue=payload)
    assert "format=CSV" in got


def test_scrape_recordings_ignore_decoy_links():
    """dft page carries a CSV decoy; the .ods pattern must skip it."""
    cfg = CATALOG["dft_road_stats"]
    got = resolve_url(cfg, fetch=lambda u: (FIXTURES / "dft_road_stats.html").read_text())
    assert got.endswith("rdl0202.ods")
