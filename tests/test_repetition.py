"""Gopher-style repetition signals: hand-computed fixtures, DuckDB
parity on the harness corpus, filter composition, edge cases."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.repetition import (
    GOPHER_THRESHOLDS,
    line_repetition_signals,
    repetition_filter,
    repetition_signals,
    top_ngram_char_fraction,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE


@pytest.fixture()
def docs(spark):
    rows = [
        # 4 lines, "spam spam" repeated 3x: 2 dup lines of 4 total;
        # dup chars = 2*9 of 9+9+9+5 = 18/32
        (1, "spam spam\nspam spam\nspam spam\nclean"),
        # no repetition; 40 distinct tokens — the Gopher thresholds
        # presume real-length docs (an n-gram is ~n/L of a distinct
        # doc's chars, so tiny docs trip them vacuously)
        (2, " ".join(f"w{i:02d}a w{i:02d}b" for i in range(0, 20)).replace("w04b ", "w04b\n")),
        # one dominating bigram: "buy now " * 6 -> top 2-gram "buy now"
        (3, "buy now buy now buy now buy now buy now buy now"),
        # blank-only text
        (4, "\n\n  \n"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_signals_hand_computed(spark, docs):
    got = {r["doc_id"]: r for r in line_repetition_signals(docs, "text", "doc_id").collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_fraction"] == pytest.approx(2 / 4)
    assert got[1]["dup_line_char_fraction"] == pytest.approx(18 / 32)
    assert got[2]["dup_line_fraction"] == 0.0
    assert got[2]["dup_line_char_fraction"] == 0.0
    # blank / empty docs survive with zero signals
    assert got[4]["n_lines"] == 0 and got[4]["dup_line_fraction"] == 0.0
    assert got[5]["n_lines"] == 0


def test_top_ngram_hand_computed(spark, docs):
    got = {
        r["doc_id"]: r["top_2gram_char_fraction"]
        for r in top_ngram_char_fraction(docs, "text", "doc_id", 2).collect()
    }
    # doc 3: 47 chars; "buy now" (7 chars) occurs 6x as a sliding
    # bigram ("now buy" 5x): 6*7/47
    assert got[3] == pytest.approx(6 * 7 / 47)
    assert got[4] == 0.0 and got[5] == 0.0
    # doc 2 has all-distinct bigrams: fraction = len(top)/chars, small
    assert got[2] < 0.5


def test_filter_drops_spam_keeps_clean(spark, docs):
    kept = {r["doc_id"] for r in repetition_filter(docs, "text", "doc_id").collect()}
    assert 1 not in kept  # dup lines way over 0.30
    assert 3 not in kept  # dominating bigram over 0.20
    assert {2, 4, 5} <= kept


def test_signals_schema_and_join_shape(spark, docs):
    sig = repetition_signals(docs, "text", "doc_id")
    assert set(sig.columns) == {
        "doc_id",
        "n_lines",
        "dup_line_fraction",
        "dup_line_char_fraction",
        "top_2gram_char_fraction",
        "top_3gram_char_fraction",
        "top_4gram_char_fraction",
    }
    assert sig.count() == docs.count()  # every doc, exactly once


def test_duckdb_parity_on_harness_corpus(spark):
    """Cross-engine agreement on real text: line signals and top-2gram
    fraction recomputed in DuckDB SQL over the same parquet."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    sig = repetition_signals(docs, "text", "doc_id", ngram_ns=(2,))
    got = {
        r["doc_id"]: (
            round(r["dup_line_fraction"], 9),
            round(r["dup_line_char_fraction"], 9),
            round(r["top_2gram_char_fraction"], 9),
        )
        for r in sig.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    oracle = con.execute(
        r"""
WITH lines AS (
  SELECT doc_id, trim(l) AS l FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents
  ) WHERE trim(l) != ''
),
per_line AS (
  SELECT doc_id, l, count(*) AS n, length(l) AS len
  FROM lines GROUP BY doc_id, l
),
line_sig AS (
  SELECT doc_id,
         CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dlf,
         CASE WHEN sum(n * len) > 0
              THEN CAST(sum(CASE WHEN n > 1 THEN (n - 1) * len ELSE 0 END) AS DOUBLE)
                   / CAST(sum(n * len) AS DOUBLE)
              ELSE 0.0 END AS dlcf
  FROM per_line GROUP BY doc_id
),
toks AS (
  SELECT doc_id, length(text) AS chars,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t != '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, chars, unnest(
    CASE WHEN len(t) >= 2 THEN
      list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
    ELSE [] END) AS g
  FROM toks
),
counted AS (
  SELECT doc_id, chars, g, count(*) AS n FROM grams GROUP BY doc_id, chars, g
),
top AS (
  SELECT doc_id, chars,
         max(struct_pack(n := n, len := length(g), g := g)) AS tp
  FROM counted GROUP BY doc_id, chars
)
SELECT d.doc_id,
       COALESCE(ls.dlf, 0.0) AS dlf,
       COALESCE(ls.dlcf, 0.0) AS dlcf,
       COALESCE(CAST(t.tp.n * t.tp.len AS DOUBLE) / greatest(t.chars, 1), 0.0) AS t2
FROM documents d
LEFT JOIN line_sig ls USING (doc_id)
LEFT JOIN top t ON t.doc_id = d.doc_id
"""
    ).fetchall()
    want = {r[0]: (round(r[1], 9), round(r[2], 9), round(r[3], 9)) for r in oracle}
    assert got == want


def test_repetition_filter_rejects_unknown_threshold_keys(spark):
    import pytest

    from open_data_pipelines_spark.operators.repetition import repetition_filter

    text = " ".join(f"w{i}" for i in range(40))  # diverse: passes defaults
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown repetition threshold keys"):
        repetition_filter(df, "text", "doc_id", {"top2gram_char_fraction": 0.2})
    with pytest.raises(ValueError, match="unknown repetition threshold keys"):
        repetition_filter(df, "text", "doc_id", {"n_lines_max": 5})
    # valid custom n passes validation
    assert repetition_filter(df, "text", "doc_id", {"top_5gram_char_fraction": 0.5}).count() == 1
