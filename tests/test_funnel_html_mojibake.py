"""Round-13 cross-engine verification run for the HTML-extraction and
mojibake-repair funnel stages (VERDICT r12 task #6): prepare_corpus
(html=True, fix_encoding=True) over the harness corpus wrapped in
markup with planted mojibake, mirrored in DuckDB by planting the
EXPECTED post-extraction/post-repair text and replaying the funnel's
own clean/annotate/filter/dedup SQL fragments (imported from
queries.text — never retyped).

Load-bearing by construction: if html_to_text regressed, raw tags and
dropped-subtree bodies would flow into the fingerprint/quality/chunk
columns; if fix_mojibake regressed, the corrupted rendering would.
Either diverges from the oracle's planted expectation on every row it
touches. Round 14 folded both stages into the permanent corpus_funnel
driver row too (funnel_planted_docs wraps every planted doc in markup
and the funnel oracle plants the expected extraction); this file stays
as the ISOLATED cross-engine check — minimal pipeline (no gates, no
LM), whole-text chunks — so an extraction/repair regression is
attributable without decoding the full funnel hash.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SF_ORACLE = "/root/testdata/sf0.01"

# corrupted rendering (UTF-8 bytes read as cp1252/latin-1) planted on
# residue 2; the oracle plants the repaired form
_MOJIBAKE = " cafÃ© rÃ©sumÃ©"
_REPAIRED = " café résumé"
# markup appendix on residue 4; the oracle plants its extraction
_LIST_HTML = "<ul><li>alpha &amp; beta</li><li>gamma</li></ul>"
_LIST_TEXT_SQL = "chr(10) || chr(10) || 'alpha & beta' || chr(10) || 'gamma'"


def _spark_input(spark, sf_dir):
    from open_data_pipelines_spark.session import load_tables

    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    body = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 8 == 2, F.lit(_MOJIBAKE)).otherwise(F.lit("")),
    )
    wrapped = F.concat(
        F.lit(
            "<html><head><title>T</title><script>var x=1;</script></head>"
            "<body><p>"
        ),
        body,
        F.lit("</p>"),
        F.when(F.col("doc_id") % 8 == 4, F.lit(_LIST_HTML)).otherwise(F.lit("")),
        F.lit("<!-- tracking note --></body></html>"),
    )
    return docs.select("doc_id", wrapped.alias("text"), "lang", "source", "n_chars")


def _oracle_sql() -> str:
    from open_data_pipelines_spark.operators.text_analysis import STOPWORDS
    from open_data_pipelines_spark.queries.text import (
        _CLEAN_SQL,
        _NORM,
        _Q_MEAN,
        _Q_PUNCT,
        _hits_sql,
    )

    lang_cases = " ".join(
        f"WHEN {_hits_sql(lang)} = best THEN '{lang}'" for lang in STOPWORDS
    )
    expected = f"""text
      || (CASE WHEN doc_id % 8 = 2 THEN '{_REPAIRED}' ELSE '' END)
      || (CASE WHEN doc_id % 8 = 4 THEN {_LIST_TEXT_SQL} ELSE '' END)"""
    return f"""
WITH planted AS (
  SELECT doc_id, {expected} AS text FROM documents
),
cleaned AS (SELECT doc_id, {_CLEAN_SQL} AS text FROM planted),
lang_scored AS (
  SELECT doc_id, text,
         greatest({', '.join(_hits_sql(lang) for lang in STOPWORDS)}) AS best
  FROM cleaned
),
annotated AS (
  SELECT doc_id, text,
         CASE WHEN best < 1 THEN 'und' {lang_cases} ELSE 'und' END AS lang,
         CAST(length(text) >= 100 AND length(text) <= 20000 AS DOUBLE) * 0.25
         + CAST({_Q_MEAN} >= 3.0 AND {_Q_MEAN} <= 12.0 AS DOUBLE) * 0.25
         + CAST({_Q_PUNCT} <= 0.2 AS DOUBLE) * 0.25
         + CAST({_hits_sql('en')} >= 1 AS DOUBLE) * 0.25 AS quality
  FROM lang_scored
),
kept AS (
  SELECT * FROM annotated
  WHERE quality >= 0.5 AND lang IN ('en', 'fr', 'de')
),
exact AS (
  SELECT doc_id, text, lang, quality FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5({_NORM.format(t='text')}) ORDER BY doc_id ASC
    ) AS rn FROM kept
  ) WHERE rn = 1
)
SELECT doc_id, lang, quality, 0 AS chunk_idx, text AS chunk FROM exact
"""


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_html_and_mojibake_stages_cross_engine(spark, sf_dir):
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    out = prepare_corpus(
        spark,
        sf_dir,
        docs=_spark_input(spark, sf_dir),
        html=True,
        fix_encoding=True,
        near_dup="none",
        # one window >= any doc: chunk == the full cleaned text, so the
        # compare sees every surviving character
        chunk_size=100_000,
        overlap=0,
    )
    got = {
        (r.doc_id, r.lang, r.quality, r.chunk_idx, r.chunk) for r in out.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {tuple(row) for row in con.execute(_oracle_sql()).fetchall()}
    assert got == want
    assert got  # both gates leave a corpus behind

    # the planted branches actually reached the output (otherwise the
    # stages were exercised on nothing)
    moj = {r for r in got if r[0] % 8 == 2}
    lst = {r for r in got if r[0] % 8 == 4}
    assert moj and all("café résumé" in r[4] for r in moj)
    assert lst and all("alpha & beta gamma" in r[4] for r in lst)
    # and no markup or corrupted rendering survived anywhere
    assert not any("<" in r[4] or "Ã" in r[4] or "var x=1" in r[4] for r in got)
