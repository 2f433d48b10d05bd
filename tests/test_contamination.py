"""Benchmark decontamination: full-output DuckDB parity at n=3 (the
shingle macro the MinHash oracles already mirror), planted-
contamination behavior, the no-broadcast fallback, and the anti-join
filter."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from open_data_pipelines_spark.queries.text import _SHINGLES
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["documents"]


@pytest.fixture(scope="module")
def bench(docs):
    # eval set drawn from the corpus itself: guaranteed contamination
    return docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )


_SH = _SHINGLES.format(t="text")

_ORACLE = f"""
WITH doc_sh AS (
  SELECT doc_id, list_distinct({_SH}) AS sh FROM documents
),
bench_sh AS (
  SELECT DISTINCT doc_id AS bench_id, unnest(list_distinct({_SH})) AS s
  FROM documents WHERE doc_id % 37 = 0
),
doc_ex AS (SELECT doc_id, unnest(sh) AS s FROM doc_sh),
hits AS (
  SELECT d.doc_id,
         count(DISTINCT d.s) AS n_hit_shingles,
         count(DISTINCT b.bench_id) AS n_bench_docs_hit
  FROM doc_ex d JOIN bench_sh b USING (s)
  GROUP BY d.doc_id
)
SELECT ds.doc_id,
       len(ds.sh) AS n_shingles,
       coalesce(h.n_hit_shingles, 0) AS n_hit_shingles,
       coalesce(h.n_bench_docs_hit, 0) AS n_bench_docs_hit,
       CASE WHEN len(ds.sh) > 0
            THEN coalesce(h.n_hit_shingles, 0) / len(ds.sh)
            ELSE 0.0 END AS contamination_rate
FROM doc_sh ds LEFT JOIN hits h USING (doc_id)
"""


def _rows(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        (int(a), float(b), int(c), int(d), int(e))
        for a, b, c, d, e in zip(
            pdf["doc_id"],
            pdf["contamination_rate"],
            pdf["n_bench_docs_hit"],
            pdf["n_hit_shingles"],
            pdf["n_shingles"],
        )
    )


def test_full_output_matches_duckdb(docs, bench):
    got = ngram_contamination(docs, bench, n=3).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'")
    want = con.execute(_ORACLE).fetchdf()
    assert _rows(got) == _rows(want)


def test_planted_contamination_detected(docs, bench):
    rep = ngram_contamination(docs, bench, n=3)
    planted = rep.filter(F.col("doc_id") % 37 == 0).filter(F.col("n_shingles") > 0)
    # a doc IS its own benchmark item -> every shingle hits
    assert planted.filter(F.col("contamination_rate") < 1.0).count() == 0
    assert planted.filter(F.col("n_bench_docs_hit") < 1).count() == 0


def test_no_broadcast_same_result(docs, bench):
    a = ngram_contamination(docs, bench, n=3).toPandas()
    b = ngram_contamination(docs, bench, n=3, broadcast_bench=False).toPandas()
    assert _rows(a) == _rows(b)


def test_decontaminate_drops_exactly_flagged(docs, bench):
    rep = ngram_contamination(docs, bench, n=3)
    flagged = {r[0] for r in rep.filter(F.col("contamination_rate") > 0).select("doc_id").collect()}
    kept = {r[0] for r in decontaminate(docs, bench, n=3).select("doc_id").collect()}
    everyone = {r[0] for r in docs.select("doc_id").collect()}
    assert kept == everyone - flagged


def test_plan_corpus_side_never_shuffles(docs, bench):
    """Mechanical form of the scale claim: the corpus probe is
    broadcast joins only — every shuffle Exchange in the plan belongs
    to the (small) benchmark-distinct / hits-aggregate side."""
    plan = (
        ngram_contamination(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert plan.count("BroadcastHashJoin") == 2  # probe + verdict join-back
    assert "SortMergeJoin" not in plan
    assert shuffles <= 3  # bench distinct + hits partial/final agg


def test_hashed_shingles_match_exact_path(spark, docs, bench):
    """hash_shingles=True (64-bit join keys, the small-broadcast scale
    form) produces the identical report and identical kept set as the
    exact string join on this corpus — collisions are a 2^-64 event,
    so any difference here is a bug, not bad luck."""
    exact = ngram_contamination(docs, bench, n=3).collect()
    hashed = ngram_contamination(docs, bench, n=3, hash_shingles=True).collect()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(exact) == key(hashed)

    kept_exact = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    kept_hashed = {
        r["doc_id"]
        for r in decontaminate(docs, bench, n=3, hash_shingles=True).collect()
    }
    assert kept_exact == kept_hashed
    # the planted bench rows themselves are contaminated and dropped
    assert not any(d % 37 == 0 for d in kept_hashed)
