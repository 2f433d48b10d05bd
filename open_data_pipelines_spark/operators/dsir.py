"""DSIR — Data Selection via Importance Resampling (engine extension
for training-data pipelines; the reference has no corpus operators —
SURVEY.md §2 extensions).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling"): select raw-corpus documents that look like a small
TARGET corpus by (1) representing every document as hashed n-gram
counts, (2) fitting bag-of-hashed-ngrams unigram distributions
``p`` (target) and ``q`` (raw) over the hash buckets, (3) scoring
each raw document with the log importance weight
``sum_g count(g) * log(p[bucket(g)] / q[bucket(g)])``, and
(4) sampling k documents WITHOUT replacement with probability
proportional to the weight — which is exactly the Gumbel top-k
trick: ``score = log_weight + Gumbel(0)``, take the k largest.

Spark-first shape (100 TB raw corpus, small target):

- Feature extraction is explode(unigrams + bigrams) → ``pmod(hash,
  B)`` → ``groupBy(id, bucket).count()`` — one map-side-combining
  shuffle keyed by (doc, bucket); n-gram text never shuffles, only
  (id, int, count) triples.
- Both fitted distributions are B-bucket aggregates (B ~ 10k);
  the log-ratio table is a B-row frame joined BROADCAST onto the
  features — the raw corpus is never shuffled again. Totals enter
  via 1-row broadcast crossJoin (the engine's scalar-agg pattern,
  ``operators/aggregates.py`` min-max norm).
- The Gumbel noise is deterministic: ``u = unit_hash(id, seed)``
  (cross-engine md5 hash, :mod:`.sampling`), ``g = -ln(-ln(u))`` —
  reproducible across runs, partitionings, and engines; the whole
  selection is therefore a pure function of (corpora, B, alpha,
  seed, k).
- Top-k by score compiles to TakeOrderedAndProject (per-partition
  heap + driver merge of k rows), not a global sort.

Smoothing: add-``alpha`` on both distributions over the SAME bucket
space, so empty buckets get a finite, symmetric prior and the
log-ratio is defined everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import lazy_checkpoint
from ..functions.hashing import fast_long_hash, stable_long_hash
from .sampling import unit_hash
from .text_analysis import tokens_or_empty
from .text_dedup import scale_out

#: tiny offset keeping u in (0, 1): -ln(-ln(0)) is -inf
_U_EPS = 0.5 / float(1 << 60)


def hashed_ngram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_buckets: int = 10_000,
    fast: bool = True,
) -> DataFrame:
    """Hashed unigram+bigram counts per document: ``(id, bucket,
    cnt)``. Tokens are lowercased whitespace words (the paper's word
    tokenizer); bigrams are space-joined adjacent pairs. Empty/blank
    documents produce no rows (their weight is 0 by definition —
    :func:`importance_weights` restores them)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    # the explode+hash is CPU-heavy per row: fan a narrow scan out
    # across cores first (no-op on an already-wide 100 TB scan)
    df = scale_out(df)
    toks = tokens_or_empty(text_col, lower=True)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    hasher = fast_long_hash if fast else stable_long_hash
    return (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(
            id_col,
            F.pmod(hasher(F.col("gram")), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_bucket_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket ``log(p_target / q_raw)`` with add-``alpha``
    smoothing over the full bucket space: ``(bucket, log_ratio)``,
    exactly ``n_buckets`` rows. Pure aggregates — output is
    B-bounded and broadcastable."""
    spark = target_feats.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))

    def side(feats: DataFrame, name: str, label: str) -> DataFrame:
        per_bucket = feats.groupBy("bucket").agg(F.sum("cnt").alias(name))
        # a featureless corpus sums to NULL: fail loud instead of
        # silently degenerating every log-ratio (and with it the
        # whole selection) to noise — coalesce short-circuits, so the
        # error fires only on the empty side (round-10 review find)
        total = per_bucket.agg(
            F.coalesce(
                F.sum(name),
                F.raise_error(
                    F.lit(
                        f"dsir: the {label} corpus produced no n-gram "
                        "features (empty or all-blank texts) — the "
                        "importance ratio is undefined"
                    )
                ).cast("long"),
            ).alias(f"{name}_total")
        )
        return (
            buckets.join(per_bucket, "bucket", "left")
            .withColumn(name, F.coalesce(name, F.lit(0)))
            .crossJoin(F.broadcast(total))
        )
    t = side(target_feats, "t_cnt", "target")
    r = side(raw_feats, "r_cnt", "raw")
    denom = F.lit(alpha) * F.lit(float(n_buckets))
    return t.join(r, "bucket").select(
        "bucket",
        (
            F.log((F.col("t_cnt") + F.lit(alpha)) / (F.col("t_cnt_total") + denom))
            - F.log((F.col("r_cnt") + F.lit(alpha)) / (F.col("r_cnt_total") + denom))
        ).alias("log_ratio"),
    )


def importance_weights(
    df: DataFrame,
    feats: DataFrame,
    log_ratio: DataFrame,
    id_col: str,
) -> DataFrame:
    """Per-document log importance weight: ``(id, log_weight)`` for
    EVERY document of ``df`` (feature-less docs get 0.0). The
    log-ratio table is broadcast — the feature frame is shuffled only
    by its own groupBy."""
    scored = (
        feats.join(F.broadcast(log_ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"))
    )


def gumbel_noise(id_col: str, seed: str = "dsir"):
    """Deterministic standard Gumbel from the cross-engine unit hash:
    ``-ln(-ln(u))``. DuckDB mirror: same expression over
    ``('0x' || substr(md5(seed || id), 1, 15))::BIGINT / 2^60``."""
    u = unit_hash(F.col(id_col), seed=seed) + F.lit(_U_EPS)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    seed: str = "dsir",
    fast: bool = True,
) -> DataFrame:
    """Select ``k`` raw documents by importance resampling toward the
    target distribution: the raw rows plus ``log_weight`` and the
    Gumbel-perturbed ``score``, the k largest scores (ties broken by
    id for determinism)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # reuse cache: the raw-corpus explode+hash+groupBy feeds BOTH the
    # distribution fit and the weight scoring — without it the most
    # expensive subtree runs twice per action (repo convention,
    # caching.py; round-10 review find)
    raw_feats = lazy_checkpoint(
        hashed_ngram_features(raw, text_col, id_col, n_buckets=n_buckets, fast=fast)
    )
    target_feats = hashed_ngram_features(
        target, text_col, id_col, n_buckets=n_buckets, fast=fast
    )
    lr = fit_bucket_log_ratio(target_feats, raw_feats, n_buckets=n_buckets, alpha=alpha)
    w = importance_weights(raw, raw_feats, lr, id_col)
    scored = raw.join(w, id_col).withColumn(
        "score", F.col("log_weight") + gumbel_noise(id_col, seed=seed)
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
