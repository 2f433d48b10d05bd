"""Projection / cleaning expression pack (SURVEY.md §2.3).

Reference behaviors reproduced (all as JVM-side Column expressions —
the reference does these row-by-row in pandas ``apply`` loops):

- P1 prefix strip / rename (``src/data_processors/street_manager.py:15-28``,
  ``post_code_p001.py:98-103``)
- P2 column-name normalization (``dft_road_stats.py:78-100``,
  ``geoplace_swa.py:71``)
- P3 null-token normalization ``["", "nan", "NaN", "None", "null", " "]``
  -> NULL (``naptan.py:58-61``, ``national_stat_postcode_lookup.py:30``)
- P4/P5/X5 safe numeric coercion (``pd.to_numeric(errors="coerce")``,
  ``national_stat_postcode_lookup.py:16-43``) -> ``try_cast`` (Spark 4
  is ANSI-on by default, so a plain cast would *raise*; try_cast keeps
  the reference's null-on-failure semantics)
- P8 domain string cleaning: org-suffix strip + hard-coded fixups
  (``geoplace_swa.py:14-36,72-92``)
- P10 audit timestamp (``geoplace_swa.py:94-97``)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame

from .exprmemo import memo_column
from pyspark.sql import functions as F

NULL_TOKENS = ("", "nan", "NaN", "None", "null", " ")


@memo_column
def normalize_null_tokens(col: Column | str, tokens: tuple[str, ...] = NULL_TOKENS) -> Column:
    """Literal junk strings -> NULL (P3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*tokens), F.lit(None)).otherwise(c)


@memo_column
def safe_cast(col: Column | str, to: str) -> Column:
    """Null-on-failure cast (P4/X5) — TRY_CAST semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(to)


def normalize_column_name(name: str) -> str:
    """Lowercase; spaces/``-``/``/`` -> ``_``; drop ``()``/quotes;
    collapse repeats; strip trailing ``_`` (P2)."""
    out = name.strip().lower()
    out = re.sub(r"[ \-/]+", "_", out)
    out = re.sub(r"[()'\"]", "", out)
    out = re.sub(r"_+", "_", out)
    return out.strip("_")


def normalize_column_names(df: DataFrame) -> DataFrame:
    return df.toDF(*[normalize_column_name(c) for c in df.columns])


def strip_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """``object_data.x`` -> ``x`` (P1)."""
    return df.toDF(*[c[len(prefix):] if c.startswith(prefix) else c for c in df.columns])


# P8: org-suffix tokens the reference strips from SWA account names
ORG_SUFFIX_TOKENS = (
    " COUNTY COUNCIL",
    " BOROUGH COUNCIL",
    " CITY COUNCIL",
    " DISTRICT COUNCIL",
    "LONDON BOROUGH OF ",
    "COUNCIL OF THE ",
)

# P8: hard-coded value fixups (reference has 8, e.g. peter->peterborough)
ORG_FIXUPS = {
    "peter": "peterborough",
    "&": "and",
}


def clean_org_name(
    col: Column | str,
    suffixes: tuple[str, ...] = ORG_SUFFIX_TOKENS,
    fixups: dict[str, str] | None = None,
) -> Column:
    """Strip org-suffix tokens, lowercase, apply exact-value fixups (P8)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.upper(c)
    for tok in suffixes:
        c = F.replace(c, F.lit(tok), F.lit(""))
    c = F.lower(F.trim(c))
    for bad, good in (fixups or ORG_FIXUPS).items():
        c = F.when(c == bad, F.lit(good)).otherwise(c)
    return c


def audit_timestamp(df: DataFrame, col: str = "date_time_processed") -> DataFrame:
    """Append processing-time audit column (P10)."""
    return df.withColumn(col, F.current_timestamp())


def null_timestamp_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P6: wholesale-null known-bad timestamp columns while keeping the
    declared type (NaPTAN CreationDateTime/ModificationDateTime,
    ``naptan.py:64-66``)."""
    for c in cols:
        df = df.withColumn(c, F.lit(None).cast("timestamp"))
    return df
