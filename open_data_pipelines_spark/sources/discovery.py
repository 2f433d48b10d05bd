"""URL discovery utilities (S11-S16) — driver-side, offline-testable.

The reference's link discovery spans: dated link math
(``src/data_sources/street_manager.py:65-95``, ``section_58.py:71-101``),
CKAN ``package_show`` resource filtering
(``nhs_english_prescriptions.py:65-148``), OS Downloads API product
selection (``os_usrn_uprn.py:56-83``), HTML scraping
(``geoplace_swa.py:59-80``, ``dft_road_stats.py:57-131``), and redirect
resolution (``built_up_areas.py:54-56``). None of this is a Spark
concern — they stay plain driver-side functions, with HTTP injected
(``fetch=``) so tests use recorded fixtures and no code here ever
hard-codes credentials or private endpoints.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re
from collections.abc import Callable
from html.parser import HTMLParser


# --- S11: dated link math ----------------------------------------------------
def last_month(today: dt.date | None = None) -> tuple[int, int]:
    d = today or dt.date.today()
    year, month = (d.year, d.month - 1) if d.month > 1 else (d.year - 1, 12)
    return year, month


def monthly_links(
    base_url: str, start: tuple[int, int], end: tuple[int, int], suffix: str = ".zip"
) -> list[str]:
    """``{base}/{YYYY}/{MM}{suffix}`` for every month in [start, end]."""
    (y0, m0), (y1, m1) = start, end
    links = []
    y, m = y0, m0
    while (y, m) <= (y1, m1):
        links.append(f"{base_url}/{y}/{m:02d}{suffix}")
        y, m = (y, m + 1) if m < 12 else (y + 1, 1)
    return links


def latest_month_link(base_url: str, today: dt.date | None = None, suffix: str = ".zip") -> str:
    y, m = last_month(today)
    return f"{base_url}/{y}/{m:02d}{suffix}"


def month_table_name(year: int, month: int) -> str:
    """Reference naming ``{MM}_{YYYY}`` (street_manager.py:139-169) —
    retained for catalog-compat helpers; the engine itself partitions
    one table by (year, month) instead."""
    calendar.monthrange(year, month)  # validates month
    return f"{month:02d}_{year}"


# --- S12: CKAN resource filtering -------------------------------------------
def filter_ckan_resources(
    package: dict,
    name_prefix: str = "EPD_SNOMED_",
    fmt: str = "CSV",
    max_items: int | None = None,
    date_range: tuple[str, str] | None = None,
) -> list[dict]:
    """Select matching resources from a CKAN ``package_show`` payload,
    newest first (period parsed from the resource name suffix)."""
    out = []
    for res in package.get("result", {}).get("resources", []):
        name = res.get("name", "")
        if not name.startswith(name_prefix) or res.get("format", "").upper() != fmt:
            continue
        m = re.search(r"(\d{6})$", name)
        period = m.group(1) if m else ""
        if date_range and not (date_range[0] <= period <= date_range[1]):
            continue
        out.append({**res, "period": period})
    out.sort(key=lambda r: r["period"], reverse=True)
    return out[:max_items] if max_items else out


# --- S13: product-list selection --------------------------------------------
def select_product(products: list[dict], product_id: str, fmt: str | None = None) -> dict:
    for p in products:
        if p.get("id") == product_id and (fmt is None or p.get("format") == fmt):
            return p
    raise KeyError(f"product {product_id!r} not found")


# --- S14: HTML link scraping (stdlib parser — no bs4 dependency) -------------
class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.links: list[tuple[str, str]] = []  # (href, css classes)
        self._href: str | None = None
        self._cls = ""
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            d = dict(attrs)
            self._href, self._cls, self._text = d.get("href"), d.get("class", ""), []

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self.links.append((self._href, self._cls))
            self._href = None


def scrape_links(
    html: str,
    href_pattern: str | None = None,
    css_class: str | None = None,
    base_url: str | None = None,
) -> list[str]:
    """All <a href> values, optionally filtered by regex and/or class
    (the reference selects ``a.download-item__download-link`` and
    gov.uk ``.ods``/ZIP attachment links). ``base_url`` resolves
    site-relative hrefs (``/documents/x.xls``) against the scraped
    page — absolute hrefs pass through unchanged — so a scraped link
    is always downloadable (round-9 review find: a relative href fed
    straight to urlopen raises 'unknown url type')."""
    from urllib.parse import urljoin

    p = _LinkCollector()
    p.feed(html)
    out = []
    for href, cls in p.links:
        if css_class and css_class not in cls.split():
            continue
        if href_pattern and not re.search(href_pattern, href):
            continue
        out.append(urljoin(base_url, href) if base_url else href)
    return out


# --- S15: redirect resolution ------------------------------------------------
def resolve_redirect(url: str, fetch: Callable[[str], str]) -> str:
    """Final URL after redirects; ``fetch`` returns the resolved URL
    (injected — e.g. ``lambda u: requests.head(u, allow_redirects=True).url``)."""
    return fetch(url)
