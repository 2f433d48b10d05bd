"""Spreadsheet ingest bridge (S7/S8/S9) — pandas-backed, import-gated.

The reference reads ODS sheets (``pd.read_excel(engine="odf")`` with
per-file sheet/header config, ``dft_road_stats.py:40-75,109-168``) and
msoffcrypto-encrypted legacy XLS (default key ``VelvetSweatshop``,
``geoplace_swa.py:39-105``). Spreadsheets are inherently driver-side
single files; the Spark hand-off is ``spark.createDataFrame(pdf)``
(Arrow path), all-string bronze. The odf/xlrd/msoffcrypto libs are not
in this container, so engines are import-gated: missing engine raises
a clear SpreadsheetEngineUnavailable (pipelines can skip/stub), and a
pre-parsed pandas frame can always be injected for tests.
"""

from __future__ import annotations

import io
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ENCRYPTED_XLS_DEFAULT_KEY = "VelvetSweatshop"  # geoplace_swa.py:52 behavior


class SpreadsheetEngineUnavailable(RuntimeError):
    pass


def _require(module: str):
    try:
        return __import__(module)
    except ImportError as ex:  # pragma: no cover - environment-dependent
        raise SpreadsheetEngineUnavailable(
            f"{module} not installed in this environment; inject a pre-parsed "
            "pandas DataFrame via from_pandas_bronze instead"
        ) from ex


def read_ods(path: str, sheet_name: str | int = 0, header_row: int = 0) -> pd.DataFrame:
    """ODS sheet -> pandas (S7). Requires odfpy."""
    _require("odf")
    return pd.read_excel(path, engine="odf", sheet_name=sheet_name, header=header_row)


def read_encrypted_xls(
    path: str, password: str = ENCRYPTED_XLS_DEFAULT_KEY, header_row: int = 1
) -> pd.DataFrame:
    """Decrypt legacy XLS then parse (S9). Requires msoffcrypto + xlrd."""
    msoffcrypto = _require("msoffcrypto")
    _require("xlrd")
    decrypted = io.BytesIO()
    with open(path, "rb") as fh:
        f = msoffcrypto.OfficeFile(fh)
        f.load_key(password=password)
        f.decrypt(decrypted)
    decrypted.seek(0)
    return pd.read_excel(decrypted, engine="xlrd", header=header_row)


def from_pandas_bronze(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas -> all-string Spark bronze (P5: ``df.astype(str)`` with
    NaN -> NULL, ``bduk_premises.py:261``). Arrow-batched transfer."""
    str_pdf = pdf.astype(str).where(pdf.notna(), None)
    return spark.createDataFrame(str_pdf)


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
