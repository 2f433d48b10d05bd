"""Substring-level exact dedup (Lee et al. 2022 re-expression):
hand-computed fixtures, span-merge semantics, keep_one / cap
variants, removal surgery, DuckDB parity on fixtures AND the real
documents table."""

from __future__ import annotations

import duckdb
import pytest

from open_data_pipelines_spark.operators.substring_dedup import (
    duplicated_spans,
    duplication_stats,
    remove_duplicated_spans,
    window_hashes,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

K = 3


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a b c d e f"),
        # shares the 4-token run "a b c d" with doc 1
        (2, "x y a b c d z"),
        # internal verbatim repeat: second "p q r s" is a duplicate
        (3, "p q r s p q r s"),
        # shorter than k: no windows
        (4, "hello"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_window_hashes_counts_and_short_docs(spark, docs):
    got = window_hashes(docs, "text", "doc_id", k=K).collect()
    per_doc = {}
    for r in got:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    # n_tokens - k + 1 windows; short/empty docs produce none
    assert per_doc == {1: 4, 2: 5, 3: 6}


def test_spans_keep_one_hand_computed(spark, docs):
    spans = {
        (r["doc_id"]): (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, "text", "doc_id", k=K).collect()
    }
    # doc 1 holds the first occurrences -> exempt; doc 2's copy of
    # "a b c d" = windows at starts 2,3 merged to [2, 6)
    assert spans == {2: (2, 6), 3: (4, 8)}


def test_spans_mark_all_occurrences(spark, docs):
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, "text", "doc_id", k=K, keep_one=False).collect()
    )
    # doc 1's own copies now marked too; doc 3's two copies are
    # ADJACENT ([0,4) then [4,8)) and merge into one contiguous region
    assert spans == [(1, 0, 4), (2, 2, 6), (3, 0, 8)]


def test_max_occurrences_cap_excludes_degenerate(spark, docs):
    more = docs.union(
        docs.sparkSession.createDataFrame(
            [(6, "a b c q1"), (7, "a b c q2")], ["doc_id", "text"]
        )
    )
    # "a b c" now occurs 4x corpus-wide; cap 3 expels it from the
    # duplicate set, "b c d" (2x) remains
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(more, "text", "doc_id", k=K, max_occurrences=3).collect()
    }
    assert spans == {2: (3, 6), 3: (4, 8)}


def test_stats_every_doc_survives(spark, docs):
    got = {r["doc_id"]: r for r in duplication_stats(docs, "text", "doc_id", k=K).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[2]["n_tokens"] == 7 and got[2]["dup_tokens"] == 4
    assert got[2]["dup_token_fraction"] == pytest.approx(4 / 7)
    assert got[1]["dup_tokens"] == 0 and got[4]["dup_tokens"] == 0
    assert got[5]["n_tokens"] == 0 and got[5]["dup_token_fraction"] == 0.0


def test_removal_surgery(spark, docs):
    got = {r["doc_id"]: r for r in remove_duplicated_spans(docs, "text", "doc_id", k=K).collect()}
    assert got[1]["text"] == "a b c d e f"  # first occurrences survive
    assert got[2]["text"] == "x y z"
    assert got[3]["text"] == "p q r s"
    assert got[4]["text"] == "hello" and got[5]["text"] == ""
    assert got[2]["dup_tokens"] == 4 and got[3]["dup_tokens"] == 4


def test_fast_hash_same_spans(spark, docs):
    slow = {tuple(r) for r in duplicated_spans(docs, "text", "doc_id", k=K).collect()}
    fast = {tuple(r) for r in duplicated_spans(docs, "text", "doc_id", k=K, fast=True).collect()}
    assert slow == fast


def _duckdb_stats(con, table: str, k: int):
    return con.sql(
        rf"""
        WITH base AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' OR text IS NULL THEN []::VARCHAR[]
                      ELSE string_split_regex(trim(text), '\s+') END AS toks
          FROM {table}
        ),
        wins AS (
          SELECT doc_id, unnest(range(len(toks) - {k} + 1)) AS start,
                 unnest(list_transform(range(len(toks) - {k} + 1),
                   i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + {k}), ' ')), 1, 15))::BIGINT
                 )) AS whash
          FROM base WHERE len(toks) >= {k}
        ),
        stats AS (
          SELECT whash, count(*) AS n_occ,
                 min(struct_pack(doc_id := doc_id, start := start)) AS first_occ
          FROM wins GROUP BY whash
        ),
        marked AS (
          SELECT w.doc_id, w.start
          FROM wins w JOIN stats s USING (whash)
          WHERE s.n_occ >= 2
            AND NOT (s.first_occ.doc_id = w.doc_id AND s.first_occ.start = w.start)
        ),
        m2 AS (
          SELECT doc_id, start,
                 max(start + {k}) OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM marked
        ),
        m3 AS (
          SELECT *, CASE WHEN prev_end IS NULL OR start > prev_end THEN 1 ELSE 0 END AS new_span
          FROM m2
        ),
        m4 AS (
          SELECT *, sum(new_span) OVER (PARTITION BY doc_id ORDER BY start) AS span_id
          FROM m3
        ),
        spans AS (
          SELECT doc_id, min(start) AS s, max(start) + {k} AS e
          FROM m4 GROUP BY doc_id, span_id
        ),
        per_doc AS (
          SELECT doc_id, sum(e - s) AS dup_tokens FROM spans GROUP BY doc_id
        )
        SELECT b.doc_id,
               len(b.toks) AS n_tokens,
               coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens
        FROM base b LEFT JOIN per_doc p USING (doc_id)
        ORDER BY 1
        """
    ).fetchall()


def test_duckdb_parity_fixture(spark, docs):
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    oracle = _duckdb_stats(con, "t", K)
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_tokens"])
        for r in duplication_stats(docs, "text", "doc_id", k=K).collect()
    )
    assert got == [tuple(r) for r in oracle]


def test_duckdb_parity_real_documents(spark):
    """Cross-engine parity on the harness corpus (k=8: the 30-word
    vocabulary makes genuine cross-doc 8-token repeats plausible but
    not guaranteed — the assertion is on exact agreement, not on
    duplicates existing)."""
    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    con = duckdb.connect()
    oracle = _duckdb_stats(con, f"'{SF_SMOKE}/documents.parquet'", 8)
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_tokens"])
        for r in duplication_stats(docs, "text", "doc_id", k=8).collect()
    )
    assert got == [tuple(r) for r in oracle]


def test_null_text_counts_zero_tokens(spark):
    """NULL text mirrors the oracle's IS NULL branch: zero tokens,
    zero dup fraction — not NULL/-1 (round-10 review find)."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "a b c d x")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in duplication_stats(docs, "text", "doc_id", k=K).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_token_fraction"] == 0.0
