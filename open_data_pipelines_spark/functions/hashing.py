"""Hashing expressions (SURVEY.md §2.9 X4).

- :func:`record_hash` — SCD2 change-detection hash:
  ``md5(concat_ws('|', attrs...))``, byte-identical to the reference's
  ``md5(concat(col1, '|', col2, ...))`` (``src/data_sources/section_58.py:250-257``)
  *when attributes are non-null*; for nullable attributes we use
  concat_ws, whose skip-NULL behavior matches DuckDB's concat_ws —
  verified in the t2 oracle rather than assumed (SURVEY.md §7 edge
  list).
- :func:`stable_long_hash` — portable 60-bit hash from md5 (same value
  computable in DuckDB), used where cross-engine-checkable hashes are
  needed (MinHash). Spark's native xxhash64/hash are faster but
  engine-specific; operators accept a flag to switch.
"""

from __future__ import annotations

from pyspark.sql import Column

from .exprmemo import memo_column
from pyspark.sql import functions as F


@memo_column
def record_hash(*cols: Column | str, sep: str = "|") -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws(sep, *[c.cast("string") for c in cs]))


@memo_column
def stable_long_hash(col: Column | str, salt: str = "") -> Column:
    """Deterministic cross-engine 60-bit hash: first 15 hex chars of
    md5, parsed base-16. DuckDB equivalent:
    ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT`` (or from_hex).
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c.cast("string"))
    else:
        c = c.cast("string")
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


@memo_column
def fast_long_hash(col: Column | str, seed: int = 42) -> Column:
    """Scale-path hash: xxhash64 (JVM, codegen'd, no md5 string cost).

    Not cross-engine-portable; used when an oracle check isn't needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed))
