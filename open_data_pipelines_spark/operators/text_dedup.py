"""Near-duplicate detection: exact, MinHash+LSH, SimHash, n-gram
Jaccard (engine extensions for training-data pipelines; BASELINE.json
north-star).

Scale design (the point of each step):

- **exact**: one hash-groupBy on a fingerprint — cheapest possible,
  map-side combinable, no window.
- **MinHash+LSH**: shingle -> k minhashes -> band buckets ->
  *equi-join on (band, band_hash)* -> verify candidates with true
  Jaccard. The band equi-join is the scale move: candidate generation
  is a hash shuffle whose key cardinality grows with corpus size, so
  no all-pairs product ever materializes. k and bands tune
  recall/precision as usual (b bands of r rows ~ threshold (1/b)^(1/r)).
- **SimHash**: per-doc constant-width bit signature -> group by
  signature (or banded sub-signatures) -> verify. One scan + one
  shuffle.
- **n-gram Jaccard**: the exact verifier used by both, also exposed
  standalone.

Hashes default to the cross-engine-portable md5-based
:func:`stable_long_hash` so every step is DuckDB-oracle-checkable;
pass ``fast=True`` for xxhash64 (JVM-native, no md5 string cost) in
production runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fast_long_hash, stable_long_hash
from .text_analysis import doc_fingerprint, whitespace_tokens


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; empty array when fewer than n tokens."""
    toks = whitespace_tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingle_hash(s: Column, perm: int, fast: bool) -> Column:
    if fast:
        return F.xxhash64(s, F.lit(perm))
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{perm}|"), s)), 1, 15), 16, 10
    ).cast("long")


def minhash_signature(shingles: Column, k: int = 8, fast: bool = False) -> Column:
    """Array of k min-hashes (NULL-free; empty shingle set -> NULLs)."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s: _shingle_hash(s, j, fast))) for j in range(k)]
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> list[Column]:
    """One hash per band over ``rows`` consecutive signature slots."""
    out = []
    for b in range(bands):
        slots = [F.element_at(signature, b * rows + r + 1) for r in range(rows)]
        out.append(F.md5(F.concat_ws("|", *[s.cast("string") for s in slots])).alias(f"band_{b}"))
    return out


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per identical (normalized)
    text — hash-groupBy, no window, no sort."""
    keyed = df.withColumn("__fp", doc_fingerprint(text_col))
    keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(keep, ["__fp", id_col], "inner")
        .drop("__fp")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    fast: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band."""
    rows = k // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(word_shingles(text_col, n), k, fast).alias("__sig"),
    )
    banded = sig.select(
        id_col,
        F.posexplode(F.array(*[c for c in lsh_bands(F.col("__sig"), bands, rows)])).alias(
            "band_id", "band_hash"
        ),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    pairs = a.join(b, ["band_id", "band_hash"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for the given (id_a, id_b) pairs.

    Distinct-shingle explode + equi-join — intersection counting is a
    hash join on shingle strings, never an all-pairs scan.
    """
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, n))).alias("__s")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))

    a = sh.select(F.col(id_col).alias("id_a"), "__s")
    b = sh.select(F.col(id_col).alias("id_b"), "__s")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "__s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.coalesce("__inter", F.lit(0)).alias("intersection_size"),
            (
                F.coalesce("__inter", F.lit(0)).cast("double")
                / (F.col("__na") + F.col("__nb") - F.coalesce("__inter", F.lit(0))).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash(col: Column | str, bits: int = 16, fast: bool = False) -> Column:
    """Frequency-weighted SimHash over whitespace tokens.

    bit_i = 1 iff sum over tokens of (+1 if token-hash bit i set else
    -1) > 0. Pure array expressions — one pass, no shuffle.
    """
    toks = whitespace_tokens(col)
    hashes = F.transform(toks, lambda t: _shingle_hash(t, 0, fast))
    total = F.size(hashes)
    acc = F.lit(0).cast("long")
    for i in range(bits):
        ones = F.size(F.filter(hashes, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1))
        bit_set = (ones * 2 - total) > 0
        acc = acc + F.when(bit_set, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_dedup_candidates(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16, fast: bool = False
) -> DataFrame:
    """Pairs with identical SimHash — group-by signature, no product."""
    sig = df.select(F.col(id_col), simhash(text_col, bits, fast).alias("__sh"))
    a = sig.select(F.col(id_col).alias("id_a"), "__sh")
    b = sig.select(F.col(id_col).alias("id_b"), "__sh")
    return (
        a.join(b, "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("__sh").alias("simhash"))
    )
