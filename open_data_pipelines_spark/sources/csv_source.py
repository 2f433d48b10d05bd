"""All-string CSV bronze ingest with declared schemas (S3/S4, P7, P11).

The reference streams CSVs over HTTP in 1 MiB chunks with manual line
splitting and loads every column as VARCHAR ("All data is converted to
strings for simplicity", ``nhs_english_prescriptions.py:101-223``;
variants ``naptan.py:76-186``, ``cadent_underground.py:93-205``). Its
hand-rolled micro-batching disappears here: ``spark.read.csv`` is a
distributed, splittable scan and partition sizing replaces
``batch_size`` (SURVEY.md §4).

Kept semantics:
- stringly-typed bronze via an all-string schema (typed silver casts
  happen downstream with try_cast — ``functions/cleaning.py``);
- fail-fast header validation (P7) with the lenient Cadent variant;
- malformed-row policy: PERMISSIVE/DROPMALFORMED maps the reference's
  row-length filter (P11, ``nhs_english_prescriptions.py:177,194-197``);
- BOM stripping (P9, ``cadent_underground.py:150-152``) via charset
  option.
"""

from __future__ import annotations

import csv
import logging

from pyspark.sql import DataFrame, SparkSession

from ..schemas import all_string_template, validate_columns

log = logging.getLogger(__name__)


def read_csv_header(path_or_file: str, encoding: str = "utf-8-sig") -> list[str]:
    """Driver-side peek at the header row (one line IO — cheap)."""
    with open(path_or_file, encoding=encoding, newline="") as fh:
        return next(csv.reader(fh))


def read_csv_bronze(
    spark: SparkSession,
    path: str,
    expected_columns: list[str],
    strict: bool = True,
    drop_malformed: bool = True,
    header_file: str | None = None,
) -> DataFrame:
    """Distributed all-string CSV read with header validation.

    ``strict=False`` reproduces the lenient variant (log + proceed,
    ``cadent_underground.py:165-169``).
    """
    read_order = expected_columns
    reorder = False
    if header_file or "*" not in path:
        actual = read_csv_header(header_file or path)
        missing, extra = validate_columns(actual, expected_columns, strict=strict)
        if not strict and (missing or extra):
            log.warning("column mismatch (lenient): missing=%s extra=%s", missing, extra)
        if not missing and not extra:
            # Spark maps an explicit schema to CSV fields POSITIONALLY
            # (header names are ignored under enforceSchema), so a
            # reordered header passing the set check would silently
            # misalign every column (round-9 review find). Declare the
            # schema in the FILE's order, then select back to the
            # template order.
            read_order = actual
            reorder = actual != expected_columns

    df = (
        spark.read.schema(all_string_template(read_order))
        .option("header", True)
        .option("mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE")
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return df.select(*expected_columns) if reorder else df
