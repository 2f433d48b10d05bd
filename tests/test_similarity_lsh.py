"""Recall verification for the RP-LSH ANN scale path.

The LSH bucket join is only a valid stand-in for brute force if its
candidate set actually contains the true neighbors — these tests pin
that down numerically instead of taking the bucketing on faith:

- multi-table candidate generation must recover >= 90% of the exact
  top-k pairs at a production-ish (planes=3, tables=16) setting;
- at the driver-query setting (planes=2, tables=32, miss probability
  ~1e-6/neighbor) ``ann_lsh_topk`` must be row-identical to
  ``brute_force_topk`` — the same equivalence the DuckDB oracle
  hash-checks per round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    rp_lsh_candidates,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

N_QUERIES = 10
K = 5


def _emb(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["embeddings"]


def test_rp_lsh_candidate_recall_ge_90pct(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    true_pairs = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, "embedding", "vec_id", k=K).collect()
    }
    cand_pairs = {
        (r.query_id, r.neighbor_id)
        for r in rp_lsh_candidates(
            emb, queries, "embedding", "vec_id", planes=3, tables=16
        ).collect()
    }
    assert true_pairs, "brute force produced no pairs — harness data problem"
    recall = len(true_pairs & cand_pairs) / len(true_pairs)
    assert recall >= 0.9, f"LSH candidate recall {recall:.2%} < 90%"
    # and the candidate set must be a real reduction, not all-pairs
    n_corpus = emb.count()
    assert len(cand_pairs) < N_QUERIES * (n_corpus - 1)


def test_ann_lsh_topk_row_identical_to_brute_force(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    cols = ["query_id", "neighbor_id", "rank", "cosine_sim"]
    bf = sorted(
        tuple(r) for r in brute_force_topk(emb, queries, "embedding", "vec_id", k=K)
        .select(*cols)
        .collect()
    )
    lsh = sorted(
        tuple(r)
        for r in ann_lsh_topk(
            emb, queries, "embedding", "vec_id", k=K, planes=2, tables=32
        )
        .select(*cols)
        .collect()
    )
    assert bf == lsh
