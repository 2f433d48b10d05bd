"""Cross-engine parity for sentence-boundary chunking (round-12,
verdict r11 task #7): the Spark fold (`sentence_chunks`, one split +
one `aggregate`) against a DuckDB mirror over the same parquet —
putting the sentence chunker on the same cross-engine footing as the
window chunker inside the corpus_funnel oracle.

Dialect note: Spark splits sentences with a Java-regex LOOKBEHIND
(``(?<=[.!?])\\s+``) which RE2 (DuckDB) does not support — the mirror
replaces ``([.!?])\\s+`` with ``\\1<US>`` (unit separator) and splits
on the separator, which is equivalent for any input (each terminal
punct + whitespace-run boundary becomes exactly one split point).
The greedy budget fold is sequential by nature; the mirror walks
sentences with a recursive CTE carrying (used, chunk_idx).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_analysis import sentence_chunks
from tests.conftest import SF_SMOKE

BUDGET = 24

# the harness documents are single-sentence blobs (one oversized chunk
# each) — plant deterministic MULTI-sentence twins in BOTH engines so
# the budget-packing fold is load-bearing: 4-token sentences repeated
# (doc_id % 9 + 2) times pack 6-per-chunk at budget 24, so docs with
# >= 7 sentences produce a second chunk
_PLANT = (
    "repeat('d' || CAST(doc_id AS STRING) || ' alpha beta gamma. ', "
    "CAST(doc_id % 9 + 2 AS INT))"
)

_MIRROR = f"""
WITH RECURSIVE
documents_aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, {_PLANT} AS text FROM documents
),
split_docs AS (
  SELECT doc_id,
         string_split(
           regexp_replace(text, '([.!?])\\s+', '\\1' || chr(31), 'g'), chr(31)
         ) AS raw
  FROM documents_aug
  WHERE text IS NOT NULL AND trim(text) <> ''
),
sents AS (
  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
  FROM (
    SELECT doc_id, trim(unnest(raw)) AS s,
           generate_subscripts(raw, 1) AS i
    FROM split_docs
  )
  WHERE trim(s) <> ''
),
counted AS (
  SELECT doc_id, i, s,
         len(list_filter(string_split_regex(trim(s), '\\s+'), t -> t <> '')) AS n
  FROM sents
),
walk(doc_id, i, s, used, chunk_idx) AS (
  SELECT doc_id, i, s, n, 0 FROM counted WHERE i = 1
  UNION ALL
  SELECT c.doc_id, c.i, c.s,
         CASE WHEN w.used + c.n > {BUDGET} THEN c.n ELSE w.used + c.n END,
         CASE WHEN w.used + c.n > {BUDGET} THEN w.chunk_idx + 1 ELSE w.chunk_idx END
  FROM walk w JOIN counted c ON c.doc_id = w.doc_id AND c.i = w.i + 1
)
SELECT doc_id, chunk_idx, string_agg(s, ' ' ORDER BY i) AS chunk
FROM walk GROUP BY doc_id, chunk_idx
"""


@pytest.mark.parametrize(
    "sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"], ids=["sf0.001", "sf0.01"]
)
def test_sentence_chunks_match_duckdb(spark, sf_dir):
    from open_data_pipelines_spark.session import load_tables

    base = load_tables(spark, sf_dir, register_views=False)["documents"]
    docs = base.select("doc_id", "text").unionByName(
        base.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr(_PLANT).alias("text"),
        )
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk"]
        for r in docs.select(
            "doc_id",
            F.posexplode(sentence_chunks("text", BUDGET)).alias(
                "chunk_idx", "chunk"
            ),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        (doc_id, idx): chunk
        for doc_id, idx, chunk in con.execute(_MIRROR).fetchall()
    }
    assert got == want
    assert len(got) > len(set(d for d, _ in got))  # multi-chunk docs exist
