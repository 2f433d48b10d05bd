"""Product quantization: exactness anchor (full shortlist == brute
force row-identical), measured ADC recall, code validity, pure-
projection encode (no exchange), training determinism, compression
arithmetic.

Recall context: the harness embeddings are uniform-random, the
hardest case for PQ (no cluster structure, tiny cosine spread), so
the pinned bounds are low; on real clustered embeddings the same
parameters land far higher. The operator's correctness does not rest
on recall — it rests on the exact-rescore anchor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.pq import pq_encode, pq_topk, train_pq
from open_data_pipelines_spark.operators.similarity import brute_force_topk
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

M, NBITS, TOP_K, N_QUERIES = 8, 4, 5, 20


@pytest.fixture(scope="module")
def pq(spark):
    emb = load_tables(spark, SF_SMOKE, register_views=False)["embeddings"]
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    books = train_pq(emb, "embedding", "vec_id", m=M, nbits=NBITS, iters=1)
    enc = emb.withColumn("pq_code", pq_encode("embedding", books)).persist()
    enc.count()
    yield emb, queries, books, enc
    enc.unpersist()


def test_codebook_shape(pq):
    _, _, books, _ = pq
    assert len(books) == M
    assert all(len(b) == 1 << NBITS for b in books)
    assert all(len(c) == 64 // M for b in books for c in b)


def test_codes_valid_and_compressed(pq):
    _, _, _, enc = pq
    stats = enc.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
        F.min(F.size("pq_code")).alias("n"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < (1 << NBITS)
    assert stats["n"] == M
    # the compression claim, measured against the DATA: every code is
    # M sub-codes of NBITS bits (asserted above), so the encoded form
    # is M*NBITS bits vs dim 32-bit floats — computed from the actual
    # embedding width, not a constant-vs-constant comparison (the old
    # `M < 64*4` compared two literals and tested nothing — round-9
    # test-review find)
    dim = enc.select(F.min(F.size("embedding")).alias("d")).first()["d"]
    assert dim == enc.select(F.max(F.size("embedding"))).first()[0]
    assert M * NBITS < dim * 32


def test_encode_is_pure_projection(pq):
    emb, _, books, _ = pq
    plan = emb.withColumn("c", pq_encode("embedding", books))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_full_shortlist_is_row_identical_to_brute_force(spark, pq):
    emb, queries, books, enc = pq
    got = pq_topk(
        enc, queries, "embedding", "vec_id", books, k=TOP_K, rescore_factor=500
    ).collect()
    want = brute_force_topk(emb, queries, "embedding", "vec_id", k=TOP_K).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, want), key=lambda t: (t[0], t[2])
    )


def test_adc_shortlist_recall(spark, pq):
    emb, queries, books, enc = pq
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, "embedding", "vec_id", k=TOP_K).collect()
    }
    recalls = {}
    for rf in (4, 8):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(
                enc, queries, "embedding", "vec_id", books, k=TOP_K, rescore_factor=rf
            ).collect()
        }
        recalls[rf] = len(got & want) / len(want)
    # uniform-random floor; measured ~0.50 / ~0.67 on the harness
    assert recalls[4] >= 0.35
    assert recalls[8] >= 0.50
    assert recalls[8] >= recalls[4]  # shortlist growth can't hurt


def test_training_deterministic(spark, pq):
    emb, _, books, _ = pq
    again = train_pq(emb, "embedding", "vec_id", m=M, nbits=NBITS, iters=1)
    assert books == again


def test_dim_must_divide(spark, pq):
    emb, _, _, _ = pq
    with pytest.raises(ValueError):
        train_pq(emb, "embedding", "vec_id", m=7)


def test_train_fraction_subsamples(spark, pq):
    emb, _, _, _ = pq
    books = train_pq(
        emb, "embedding", "vec_id", m=4, nbits=2, iters=1, train_fraction=0.3
    )
    assert len(books) == 4 and all(len(b) == 4 for b in books)
