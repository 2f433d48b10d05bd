"""Embedding similarity-search driver queries (engine extension;
BASELINE.json north-star) on the harness ``embeddings`` table
(``vec_id``, ``embedding: array<float>[64]``, ``label``).

Oracle-exactness: vectors are quantized to an integer grid
(``floor(x*1000 + 0.5)``) so dot products are exact BIGINT sums —
order-independent and bit-identical across engines; cosine then adds
one sqrt + one division (both IEEE-deterministic). See
``operators/similarity.py`` for the float baseline and the LSH scale
path; ``ann_lsh_topk`` runs the RP-LSH bucketed candidates + exact
rescore and is oracle-checked against the brute-force SQL (the
hash-match doubles as the recall proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    near_dup_pairs,
)
from ..session import load_tables

_QV = "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))"
_N_QUERIES = 10
_TOP_K = 5
_NEAR_DUP_T = 0.30


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, register_views=False)["embeddings"]


# --- ann_cosine_topk: exact brute-force top-k per query vector ---------------
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(emb, queries, "embedding", "vec_id", k=_TOP_K)


ORACLE_ANN_TOPK = f"""
WITH e AS (SELECT vec_id, {_QV} AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST((SELECT SUM(x * y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.v, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.v, x -> x * x)) AS DOUBLE)))
           AS cosine_sim
  FROM q, e c WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


# --- embedding_near_dup: all pairs above a cosine threshold ------------------
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return near_dup_pairs(emb, "embedding", "vec_id", threshold=_NEAR_DUP_T)


ORACLE_EMBEDDING_NEAR_DUP = f"""
WITH e AS (SELECT vec_id, {_QV} AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST((SELECT SUM(x * y) FROM (SELECT unnest(a.v) x, unnest(b.v) y)) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)))
           AS cosine_sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= {_NEAR_DUP_T}
"""


# --- ann_lsh_topk: multi-table LSH candidates + exact rescoring --------------
# (The former ``ann_lsh_bucketed`` registry entry — bucket-then-verify with no
# oracle — was retired in round 3: ``ann_lsh_topk`` proves the identical
# RP-LSH bucketed path *with* an oracle, and ``tests/test_similarity_lsh.py``
# keeps a direct candidate-recall gate on the bucketing operator itself.)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-accelerated top-k sharing brute-force's output contract.

    The (planes=2, tables=32) bank has per-true-neighbor miss
    probability ~1e-6 at the harness cosine range (~0.25-0.5), and the
    hash-derived planes are deterministic — so the result is
    row-identical to brute force and is oracle-checked against the SAME
    brute-force SQL. That hash-match IS the recall proof: any missed
    candidate would flip the hash.

    NOTE: planes=2 is the exactness-over-pruning regime (its unrelated
    -pair candidate rate is ~0.9999 — near-all-pairs); the operator's
    scale default is planes=8, where candidates ~= 0.12 of the cross
    product (see ``operators/similarity.rp_lsh_candidates``). The
    recall pytest gate covers the sparse regime.
    """
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ann_lsh_topk(
        emb, queries, "embedding", "vec_id", k=_TOP_K, planes=2, tables=32
    )


QUERIES = {
    "ann_cosine_topk": (q_ann_cosine_topk, ORACLE_ANN_TOPK),
    "embedding_near_dup": (q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP),
    "ann_lsh_topk": (q_ann_lsh_topk, ORACLE_ANN_TOPK),
}
