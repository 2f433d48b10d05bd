"""corpus_report (rollup datasheet) vs a DuckDB ROLLUP mirror —
exact cross-engine parity in exact-distinct mode, plus plan-shape and
approx-mode envelope checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.report import corpus_report
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE

# the corpus_funnel oracle's own SQL mirrors (imported, not retyped —
# the engines cannot drift apart silently)
from open_data_pipelines_spark.queries.text import (  # noqa: E402
    _hits_sql,
    _N,
    _Q_MEAN,
    _Q_NT,
    _Q_PUNCT,
)

_ORACLE = f"""
WITH base AS (
  SELECT lang, source,
         {_Q_NT} AS tok,
         length(coalesce(text, '')) AS len,
         md5({_N}) AS fp,
         CAST(length(text) >= 100 AND length(text) <= 20000 AS DOUBLE) * 0.25
         + CAST({_Q_MEAN} >= 3.0 AND {_Q_MEAN} <= 12.0 AS DOUBLE) * 0.25
         + CAST({_Q_PUNCT} <= 0.2 AS DOUBLE) * 0.25
         + CAST({_hits_sql('en')} >= 1 AS DOUBLE) * 0.25 AS q
  FROM documents
)
SELECT lang, source, CAST(GROUPING(lang, source) AS INT) AS level,
       count(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       CAST(SUM(len) AS BIGINT) AS n_chars,
       count(DISTINCT fp) AS n_unique,
       quantile_cont(tok, 0.5) AS p50_tokens,
       quantile_cont(tok, 0.9) AS p90_tokens,
       CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_quality
FROM base GROUP BY ROLLUP (lang, source)
"""


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return sorted(map(tuple, df.itertuples(index=False)), key=repr)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"])
def test_matches_duckdb_rollup(spark, sf_dir):
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    got = corpus_report(docs, exact=True).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(_ORACLE).fetchdf()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)


def test_levels_and_consistency(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    rows = corpus_report(docs, exact=True).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    assert set(by_level) == {0, 1, 3}
    (total,) = by_level[3]
    assert total.n_docs == docs.count()
    assert sum(r.n_docs for r in by_level[1]) == total.n_docs
    assert sum(r.n_docs for r in by_level[0]) == total.n_docs
    # duplicate surplus is never negative, uniques never exceed docs
    for r in rows:
        assert 0 < r.n_unique <= r.n_docs


def test_one_shuffle_plan(spark):
    """The rollup computes all three levels in one aggregation: the
    plan must contain exactly one Exchange (plus nothing sort-merge)
    in approx mode — COUNT(DISTINCT) in exact mode legitimately adds
    the expand-based second phase."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    plan = (
        corpus_report(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 2
    assert "SortMergeJoin" not in plan


def test_approx_mode_envelope(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    exact = {
        (r.lang, r.source): r.n_unique
        for r in corpus_report(docs, exact=True).collect()
    }
    approx = {
        (r.lang, r.source): r.n_unique
        for r in corpus_report(docs).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(5, 0.15 * v), k  # ~3 sigma at rsd=0.05


def test_percentile_approx_envelope(spark):
    """Tight envelope only where ranks are dense (the global row);
    tiny cohorts can differ by a whole inter-value step between
    approx (an actual member) and exact (interpolated), so per-cohort
    the assertion is the weaker members-bounds one."""
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    exact = {
        (r.lang, r.source): (r.p50_tokens, r.p90_tokens)
        for r in corpus_report(docs, exact=True).collect()
    }
    approx = {
        (r.lang, r.source): (r.p50_tokens, r.p90_tokens)
        for r in corpus_report(docs).collect()
    }
    ge50, ge90 = exact[(None, None)]
    ga50, ga90 = approx[(None, None)]
    assert abs(ga50 - ge50) <= max(2.0, 0.05 * ge50)
    assert abs(ga90 - ge90) <= max(2.0, 0.05 * ge90)
    from open_data_pipelines_spark.operators.text_analysis import token_count_ws

    bounds = {
        (r.lang, r.source): (r.mn, r.mx)
        for r in docs.select("lang", "source", token_count_ws("text").alias("t"))
        .rollup("lang", "source")
        .agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
        .collect()
    }
    for k, (a50, a90) in approx.items():
        mn, mx = bounds[k]
        assert mn <= a50 <= mx and mn <= a90 <= mx, k
