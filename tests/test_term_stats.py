"""TF-IDF / char-entropy term statistics: hand-computed fixtures and
DuckDB cross-engine parity on the harness corpus."""

from __future__ import annotations

import math

import duckdb
import pytest

from open_data_pipelines_spark.operators.term_stats import char_entropy, tfidf_top_terms
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry unique"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_hand_computed(spark, docs):
    got = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_top_terms(docs, "text", "doc_id", k=10).collect()
    }
    n = 4  # distinct doc ids (the empty doc still counts toward N)
    idf = lambda df_: math.log((n + 1) / (df_ + 1)) + 1
    # doc 1: apple tf=2 df=1; banana tf=1 df=2
    assert got[(1, "apple")]["tf"] == 2
    assert got[(1, "apple")]["idf"] == pytest.approx(idf(1))
    assert got[(1, "apple")]["tfidf"] == pytest.approx(2 * idf(1))
    assert got[(1, "banana")]["tfidf"] == pytest.approx(1 * idf(2))
    # ranking: apple (salient) above banana (common)
    assert got[(1, "apple")]["rank"] == 1 and got[(1, "banana")]["rank"] == 2
    # doc 3: cherry tf=3 but df=2; unique tf=1 df=1 — cherry still wins on tf
    assert got[(3, "cherry")]["rank"] == 1
    # empty doc has no terms
    assert not [key for key in got if key[0] == 4]


def test_char_entropy_hand_computed(spark, docs):
    got = {r["doc_id"]: r for r in char_entropy(docs, "text", "doc_id").collect()}
    # "banana cherry": 13 chars; counts b1 a3 n2 ' '1 c1 h1 e1 r2 y1
    counts = [1, 3, 2, 1, 1, 1, 1, 2, 1]
    nn = sum(counts)
    want = -sum(c / nn * math.log2(c / nn) for c in counts)
    assert got[2]["n_chars"] == 13
    assert got[2]["char_entropy"] == pytest.approx(want)
    # empty doc: zero signals, still present
    assert got[4]["n_chars"] == 0 and got[4]["char_entropy"] == 0.0
    # uniform-ish text has higher entropy than single-token spam
    spam = spark.createDataFrame([(9, "aaaaaaaaaa")], ["doc_id", "text"])
    e = char_entropy(spam, "text", "doc_id").collect()[0]["char_entropy"]
    assert e == pytest.approx(0.0)


def test_duckdb_parity_on_harness_corpus(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    got = {
        (r["doc_id"], r["rank"]): (r["term"], round(r["tfidf"], 9))
        for r in tfidf_top_terms(docs, "text", "doc_id", k=3).collect()
    }
    ent = {
        r["doc_id"]: round(r["char_entropy"], 9)
        for r in char_entropy(docs, "text", "doc_id").collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'")
    n_docs = con.execute("SELECT count(DISTINCT doc_id) FROM documents").fetchone()[0]
    tf_sql = rf"""
WITH terms AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '\s+'), t -> t != '')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, count(*) AS tf FROM terms GROUP BY doc_id, t),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id, tf.t AS term, tf.tf,
         ln(({n_docs} + 1.0) / (df.df + 1.0)) + 1.0 AS idf
  FROM tf JOIN df ON tf.t = df.t
),
ranked AS (
  SELECT doc_id, term, tf * idf AS tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
"""
    want = {
        (r[0], r[1]): (r[2], round(r[3], 9)) for r in con.execute(tf_sql).fetchall()
    }
    assert got == want

    ent_sql = r"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
counts AS (
  SELECT doc_id, c, count(*) AS n FROM chars WHERE c != '' GROUP BY doc_id, c
),
per_doc AS (
  SELECT doc_id, sum(n) AS nc, sum(n * log2(n)) AS clogc
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(log2(p.nc) - p.clogc / p.nc, 0.0) AS h
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""
    want_ent = {r[0]: round(r[1], 9) for r in con.execute(ent_sql).fetchall()}
    assert ent == want_ent
