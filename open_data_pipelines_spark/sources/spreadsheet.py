"""Spreadsheet ingest (S7/S8/S9).

The reference reads ODS sheets (``pd.read_excel(engine="odf")`` with
per-file sheet/header config, ``dft_road_stats.py:40-75,109-168``) and
msoffcrypto-encrypted legacy XLS (default key ``VelvetSweatshop``,
``geoplace_swa.py:39-105``). Spreadsheets are inherently driver-side
single files; the Spark hand-off is ``spark.createDataFrame(pdf)``
(Arrow path), all-string bronze.

ODS (S7/S8) has a NATIVE parser — an ODS file is a ZIP whose
``content.xml`` is OASIS OpenDocument spreadsheet markup, fully
readable with stdlib ``zipfile`` + ``ElementTree`` (same move as the
GeoPackage native path, :mod:`.geopackage`) — so the real ingest path
runs without odfpy; when odfpy IS installed pandas' engine is
preferred for its fuller format coverage. Encrypted XLS (S9) likewise
has a NATIVE path (:mod:`.xls_native`): stdlib CFB container +
MS-OFFCRYPTO RC4 decrypt + BIFF8 cell parser — msoffcrypto/xlrd are
preferred when installed, the native reader otherwise, so the real
decrypt path always executes in-container.
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ENCRYPTED_XLS_DEFAULT_KEY = "VelvetSweatshop"  # geoplace_swa.py:52 behavior

_NS = {
    "office": "urn:oasis:names:tc:opendocument:xmlns:office:1.0",
    "table": "urn:oasis:names:tc:opendocument:xmlns:table:1.0",
    "text": "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
}


class SpreadsheetEngineUnavailable(RuntimeError):
    pass


class SpreadsheetFormatError(ValueError):
    """The file is not a parseable spreadsheet of the claimed type."""


def _require(module: str):
    try:
        return __import__(module)
    except ImportError as ex:  # pragma: no cover - environment-dependent
        raise SpreadsheetEngineUnavailable(
            f"{module} not installed in this environment; inject a pre-parsed "
            "pandas DataFrame via from_pandas_bronze instead"
        ) from ex


def _cell_value(cell: ElementTree.Element):
    """Typed cell value per the OASIS value-type attributes; text
    paragraphs joined with newline for multi-p string cells."""
    vt = cell.get(f"{{{_NS['office']}}}value-type")
    if vt in ("float", "percentage", "currency"):
        return float(cell.get(f"{{{_NS['office']}}}value"))
    if vt == "boolean":
        return cell.get(f"{{{_NS['office']}}}boolean-value") == "true"
    if vt == "date":
        return cell.get(f"{{{_NS['office']}}}date-value")
    paras = ["".join(p.itertext()) for p in cell.findall("text:p", _NS)]
    return "\n".join(paras) if paras else None


# sanity caps: a trailing empty cell/row carries repeat counts up to the
# full sheet extent (1,048,576) — expanding those would OOM for nothing
_MAX_REPEAT = 16_384


def _sheet_rows(sheet: ElementTree.Element) -> list[list]:
    rows: list[list] = []
    for trow in sheet.findall("table:table-row", _NS):
        cells: list = []
        for cell in trow.findall("*", _NS):
            tag = cell.tag.rsplit("}", 1)[-1]
            if tag not in ("table-cell", "covered-table-cell"):
                continue
            value = None if tag == "covered-table-cell" else _cell_value(cell)
            rep = int(cell.get(f"{{{_NS['table']}}}number-columns-repeated", 1))
            if value is None and rep > _MAX_REPEAT:
                rep = 1  # trailing filler: one empty stands in, trimmed below
            cells.extend([value] * rep)
        while cells and cells[-1] is None:
            cells.pop()
        rep = int(trow.get(f"{{{_NS['table']}}}number-rows-repeated", 1))
        if not cells and rep > _MAX_REPEAT:
            rep = 1
        rows.extend([list(cells) for _ in range(rep)])
    while rows and not rows[-1]:
        rows.pop()
    return rows


def read_ods_native(
    path: str, sheet_name: str | int = 0, header_row: int = 0
) -> pd.DataFrame:
    """Dependency-free ODS sheet -> pandas (S7): stdlib ZIP +
    ElementTree over ``content.xml``, with ``pd.read_excel(header=N)``
    semantics — row N becomes the columns, data follows. Handles
    column/row repeat compression, covered (merged) cells, and typed
    float/bool/date values."""
    try:
        with zipfile.ZipFile(path) as zf:
            content = zf.read("content.xml")
    except (zipfile.BadZipFile, KeyError) as ex:
        raise SpreadsheetFormatError(f"{path} is not an ODS spreadsheet: {ex}") from ex
    root = ElementTree.fromstring(content)
    sheets = root.findall(".//office:spreadsheet/table:table", _NS)
    if not sheets:
        raise SpreadsheetFormatError(f"{path} has no spreadsheet tables")
    if isinstance(sheet_name, int):
        try:
            sheet = sheets[sheet_name]
        except IndexError:
            raise SpreadsheetFormatError(
                f"{path} has {len(sheets)} sheets, asked for index {sheet_name}"
            ) from None
    else:
        by_name = {s.get(f"{{{_NS['table']}}}name"): s for s in sheets}
        if sheet_name not in by_name:
            raise SpreadsheetFormatError(
                f"sheet {sheet_name!r} not in {sorted(by_name)}"
            )
        sheet = by_name[sheet_name]
    rows = _sheet_rows(sheet)
    if header_row >= len(rows):
        raise SpreadsheetFormatError(
            f"header_row {header_row} beyond the {len(rows)} rows in {path}"
        )
    header = [h if h is not None else f"Unnamed: {i}" for i, h in enumerate(rows[header_row])]
    width = len(header)
    data = [r[:width] + [None] * (width - len(r)) for r in rows[header_row + 1 :]]
    return pd.DataFrame(data, columns=header)


def read_ods(path: str, sheet_name: str | int = 0, header_row: int = 0) -> pd.DataFrame:
    """ODS sheet -> pandas (S7): pandas' odf engine when installed
    (fuller format coverage), the native stdlib parser otherwise."""
    try:
        _require("odf")
    except SpreadsheetEngineUnavailable:
        return read_ods_native(path, sheet_name, header_row)
    return pd.read_excel(path, engine="odf", sheet_name=sheet_name, header=header_row)


def read_encrypted_xls(
    path: str, password: str = ENCRYPTED_XLS_DEFAULT_KEY, header_row: int = 1
) -> pd.DataFrame:
    """Decrypt legacy XLS then parse (S9; ``geoplace_swa.py:39-105``).
    Uses msoffcrypto + xlrd when installed (fuller BIFF coverage);
    otherwise the native stdlib CFB + RC4 + BIFF8 reader."""
    try:
        msoffcrypto = _require("msoffcrypto")
        _require("xlrd")
    except SpreadsheetEngineUnavailable:
        from .xls_native import read_encrypted_xls_native

        return read_encrypted_xls_native(path, password, header_row=header_row)
    decrypted = io.BytesIO()
    with open(path, "rb") as fh:
        f = msoffcrypto.OfficeFile(fh)
        f.load_key(password=password)
        f.decrypt(decrypted)
    decrypted.seek(0)
    return pd.read_excel(decrypted, engine="xlrd", header=header_row)


def from_pandas_bronze(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas -> all-string Spark bronze (P5: ``df.astype(str)`` with
    NaN -> NULL, ``bduk_premises.py:261``). Arrow-batched transfer.

    The schema is declared explicitly (every column StringType —
    that IS the bronze contract) rather than inferred: a sparse
    spreadsheet column with a header but no data is all-None after the
    NaN mapping, and schema inference fails on it ('Some of types
    cannot be determined') — round-9 review find."""
    from pyspark.sql import types as T

    str_pdf = pdf.astype(str).where(pdf.notna(), None)
    schema = T.StructType(
        [T.StructField(str(c), T.StringType()) for c in str_pdf.columns]
    )
    return spark.createDataFrame(str_pdf, schema=schema)


def load_ods_bundle(
    spark: SparkSession,
    zip_path: str,
    landing_dir: str,
    sheet_name: str | int = 0,
    header_row: int = 0,
) -> dict[str, DataFrame]:
    """ZIP-of-ODS -> one all-string bronze frame per member, keyed by
    member basename (S8; the reference loads each extracted ODS into
    its own ``{prefix}_{basename}`` table, ``dft_road_stats.py:
    257-383``). Runs natively via :func:`read_ods_native` when odfpy
    is absent."""
    from .zip_source import extract_zip

    members = extract_zip(zip_path, landing_dir, "*.ods")
    return {
        Path(m).stem: load_spreadsheet_bronze(spark, m, sheet_name, header_row)
        for m in sorted(members)
    }


def load_spreadsheet_bronze(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    header_row: int = 0,
    password: str | None = None,
) -> DataFrame:
    """Dispatch on extension: .ods -> ODS engine, .xls -> encrypted
    legacy path. Returns all-string bronze."""
    suffix = Path(path).suffix.lower()
    if suffix == ".ods":
        pdf = read_ods(path, sheet_name, header_row)
    elif suffix == ".xls":
        pdf = read_encrypted_xls(path, password or ENCRYPTED_XLS_DEFAULT_KEY, header_row)
    else:
        raise ValueError(f"unsupported spreadsheet type: {suffix}")
    return from_pandas_bronze(spark, pdf)
