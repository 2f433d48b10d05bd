"""DSIR importance resampling: hand-computed smoothing math,
every-doc coverage, determinism across partitionings, selection
shifts toward the target distribution, DuckDB parity on the real
documents table."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.dsir import (
    dsir_select,
    fit_bucket_log_ratio,
    hashed_ngram_features,
    importance_weights,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

B = 64


def test_features_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x"), (3, ""), (4, "  ")], ["doc_id", "text"])
    feats = hashed_ngram_features(df, "text", "doc_id", n_buckets=B)
    per_doc = (
        feats.groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect()
    )
    got = {r["doc_id"]: r["n"] for r in per_doc}
    # doc 1: 3 unigrams + 2 bigrams; doc 2: 1 unigram; blank/empty: none
    assert got == {1: 5, 2: 1}


def test_log_ratio_smoothing_hand_computed(spark):
    # target: one gram in bucket space; raw: same gram twice.
    # With B buckets and alpha=1: t bucket has (1+1)/(1+B); r (2+1)/(2+B);
    # every other bucket 1/(1+B) vs 1/(2+B)
    t = spark.createDataFrame([(1, "zzz")], ["doc_id", "text"])
    r = spark.createDataFrame([(1, "zzz"), (2, "zzz")], ["doc_id", "text"])
    lr = fit_bucket_log_ratio(
        hashed_ngram_features(t, "text", "doc_id", n_buckets=B),
        hashed_ngram_features(r, "text", "doc_id", n_buckets=B),
        n_buckets=B,
    )
    rows = lr.collect()
    assert len(rows) == B
    hot = math.log((1 + 1) / (1 + B)) - math.log((2 + 1) / (2 + B))
    cold = math.log(1 / (1 + B)) - math.log(1 / (2 + B))
    vals = sorted(round(x["log_ratio"], 9) for x in rows)
    assert vals.count(round(hot, 9)) == 1
    assert vals.count(round(cold, 9)) == B - 1


def test_weights_cover_every_doc(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, ""), (3, "c")], ["doc_id", "text"])
    feats = hashed_ngram_features(docs, "text", "doc_id", n_buckets=B)
    lr = fit_bucket_log_ratio(feats, feats, n_buckets=B)
    w = importance_weights(docs, feats, lr, "doc_id")
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0.0  # feature-less doc
    # identical distributions -> zero log-ratio everywhere
    for v in got.values():
        assert v == pytest.approx(0.0, abs=1e-12)


def test_selection_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(10)]
        + [(i, "lorem ipsum dolor sit amet") for i in range(10, 20)],
        ["doc_id", "text"],
    )
    sel = dsir_select(raw, target, "text", "doc_id", k=8, n_buckets=512)
    ids = {r["doc_id"] for r in sel.collect()}
    assert len(ids) == 8
    # log-weight gap between the two groups dwarfs Gumbel noise
    assert ids <= set(range(10))


def test_deterministic_across_partitionings(spark):
    raw = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} common") for i in range(60)], ["doc_id", "text"]
    )
    target = spark.createDataFrame([(0, "w1 common w2")], ["doc_id", "text"])
    a = dsir_select(raw, target, "text", "doc_id", k=10, n_buckets=B).collect()
    b = dsir_select(
        raw.repartition(7), target.repartition(3), "text", "doc_id", k=10, n_buckets=B
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]


def test_duckdb_parity_real_documents(spark):
    """Full-pipeline parity on the harness corpus: target = English
    docs, raw = all docs, cross-engine md5 hashing (fast=False),
    weights and the selected id set must agree with a DuckDB
    replication to 1e-6."""
    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    target = docs.where(F.col("lang") == "en")
    sel = dsir_select(
        docs, target, "text", "doc_id", k=20, n_buckets=B, fast=False
    ).select("doc_id", F.round("log_weight", 6).alias("lw"))
    got = sorted((r["doc_id"], r["lw"]) for r in sel.collect())

    con = duckdb.connect()
    oracle = con.sql(
        rf"""
        WITH docs AS (SELECT * FROM '{SF_SMOKE}/documents.parquet'),
        toks AS (
          SELECT doc_id, lang,
                 CASE WHEN trim(text) = '' OR text IS NULL THEN []::VARCHAR[]
                      ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
          FROM docs
        ),
        grams AS (
          SELECT doc_id, lang,
                 unnest(list_concat(
                   t,
                   list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                 )) AS gram
          FROM toks
        ),
        feats AS (
          SELECT doc_id, lang,
                 (('0x' || substr(md5(gram), 1, 15))::BIGINT % {B}) AS bucket,
                 count(*) AS cnt
          FROM grams GROUP BY 1, 2, 3
        ),
        t_counts AS (
          SELECT bucket, sum(cnt) AS t_cnt FROM feats WHERE lang = 'en' GROUP BY 1
        ),
        r_counts AS (
          SELECT bucket, sum(cnt) AS r_cnt FROM feats GROUP BY 1
        ),
        totals AS (
          SELECT (SELECT sum(t_cnt) FROM t_counts) AS tt,
                 (SELECT sum(r_cnt) FROM r_counts) AS rt
        ),
        lr AS (
          SELECT r.bucket,
                 ln((coalesce(t.t_cnt, 0) + 1.0) / (totals.tt + {B})) -
                 ln((r.r_cnt + 1.0) / (totals.rt + {B})) AS log_ratio
          FROM r_counts r LEFT JOIN t_counts t USING (bucket), totals
        ),
        w AS (
          SELECT f.doc_id, sum(f.cnt * lr.log_ratio) AS log_weight
          FROM feats f JOIN lr USING (bucket) GROUP BY 1
        ),
        scored AS (
          SELECT d.doc_id,
                 coalesce(w.log_weight, 0.0) AS log_weight,
                 coalesce(w.log_weight, 0.0)
                   - ln(-ln(('0x' || substr(md5('dsir' || d.doc_id), 1, 15))::BIGINT / 2.0^60
                            + 0.5 / 2.0^60)) AS score
          FROM docs d LEFT JOIN w USING (doc_id)
        )
        SELECT doc_id, round(log_weight, 6) AS lw
        FROM scored ORDER BY score DESC, doc_id LIMIT 20
        """
    ).fetchall()
    assert got == sorted((r[0], r[1]) for r in oracle)


def test_empty_target_raises_instead_of_uniform_sampling(spark):
    """A featureless target must fail loud: silently-zero log ratios
    would turn the selection into pure Gumbel noise (round-10 review
    find)."""
    raw = spark.createDataFrame([(i, f"tok{i}") for i in range(20)], ["doc_id", "text"])
    target = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
    with pytest.raises(Exception, match="produced no n-gram features"):
        dsir_select(raw, target, "text", "doc_id", k=5, n_buckets=B).collect()
