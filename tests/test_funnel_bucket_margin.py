"""Round-12 funnel fold guards: the corpus_funnel driver row now
carries the URL gate and the CCNet head/middle/tail bucket stage
(exact percentile cutoffs). These tests pin the two facts the fold's
cross-engine hash parity rests on:

1. Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` are
   BIT-IDENTICAL on the funnel's actual per-language perplexity
   distribution (same doubles in -> same cutoff doubles out).
2. No document sits within float noise of a cutoff: the min relative
   |ppl - cut| boundary margin is >= 1e-7 (measured 1.3e-4 at
   sf0.001, 1.1e-4 at sf0.01, 3.6e-6 at sf0.1 — all orders of
   magnitude above the ~1e-9 cross-engine noise the LM parity test
   allows). Exact dedup running BEFORE the LM stage is load-bearing
   here: pre-reorder, planted exact copies carried ulp-identical
   perplexities that straddled the sf0.1 hi cut at |ppl-cut| ~ 1e-14.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_FINAL_MARKER = "SELECT doc_id, lang, quality, unnest"


def _ppl_probe_sql() -> str:
    """The funnel oracle's CTE chain re-targeted at the per-doc
    perplexity + cutoff frames (the final chunk SELECT swapped out)."""
    from open_data_pipelines_spark.queries.text import ORACLE_CORPUS_FUNNEL

    head = ORACLE_CORPUS_FUNNEL[: ORACLE_CORPUS_FUNNEL.rindex(_FINAL_MARKER)]
    return head + """
SELECT d.doc_id, d.lang, d.ppl, c.lo, c.hi
FROM ppl_doc d JOIN ppl_cuts c USING (lang)
"""


@pytest.fixture(scope="module")
def ppl_rows():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con.execute(_ppl_probe_sql()).fetchdf()


def test_boundary_margin_above_float_noise(ppl_rows):
    margins = []
    for _, r in ppl_rows.iterrows():
        for cut in (r.lo, r.hi):
            if r.ppl != cut:  # a doc AT the cut is the interpolation
                # endpoint itself — deterministic on both engines
                margins.append(abs(r.ppl - cut) / r.ppl)
    assert margins
    assert min(margins) > 1e-7


def test_spark_percentile_matches_duckdb_quantile_cont(spark, ppl_rows):
    """Feed the funnel's OWN perplexity doubles to Spark's exact
    percentile; the cutoffs must equal DuckDB's bit-for-bit."""
    from open_data_pipelines_spark.operators.lm_score import DEFAULT_BUCKET_BOUNDS

    lo_q, hi_q = DEFAULT_BUCKET_BOUNDS
    sdf = spark.createDataFrame(
        ppl_rows[["lang", "ppl"]], "lang string, ppl double"
    )
    cuts = {
        r["lang"]: (r["lo"], r["hi"])
        for r in sdf.groupBy("lang")
        .agg(
            F.percentile("ppl", F.lit(lo_q)).alias("lo"),
            F.percentile("ppl", F.lit(hi_q)).alias("hi"),
        )
        .collect()
    }
    oracle = {
        r.lang: (r.lo, r.hi)
        for _, r in ppl_rows.drop_duplicates("lang").iterrows()
    }
    assert set(cuts) == set(oracle)
    for lang, (lo, hi) in oracle.items():
        assert cuts[lang] == (lo, hi), lang  # bitwise
