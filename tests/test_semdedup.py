"""SemDeDup-style semantic dedup: cluster-blocked exact-cosine pairs,
bounded quadratic term, and both representative policies.

Ground truth for the pair stage is an independent numpy computation
(same argmin-assignment + cosine arithmetic as the operator's
docstring contract) over the harness embeddings — the operator must
reproduce it exactly within clusters and emit NOTHING across them.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.ivf import train_centroids
from open_data_pipelines_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dup_pairs,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE

K = 4
THRESHOLD = 0.3  # harness embeddings are near-random (max pairwise cosine ~0.43)
QUANT = 1000


def _expected_pairs(rows, centroids, threshold):
    """Independent scalar mirror: argmin-of-squared-distance cell
    assignment (ties to the lower cell id) + quantized cosine."""
    def cell(v):
        best = None
        for i, c in enumerate(centroids):
            d = sum((x - y) ** 2 for x, y in zip(v, c))
            if best is None or d < best[0] or (d == best[0] and i < best[1]):
                best = (d, i)
        return best[1]

    def qcos(a, b):
        # similarity.quantize's EXACT grid: round-half-up via
        # floor(x*s + 0.5), NOT Python round() (banker's half-to-even
        # diverges on exact .5 grid values — second-review find)
        qa = [math.floor(x * QUANT + 0.5) for x in a]
        qb = [math.floor(x * QUANT + 0.5) for x in b]
        na = math.sqrt(sum(x * x for x in qa))
        nb = math.sqrt(sum(x * x for x in qb))
        if na == 0 or nb == 0:
            return None  # zero-grid vectors carry no direction: no pair
        dot = sum(x * y for x, y in zip(qa, qb))
        return dot / (na * nb)

    by_cell: dict[int, list] = {}
    for vid, vec in rows:
        by_cell.setdefault(cell(vec), []).append((vid, vec))
    out = set()
    for members in by_cell.values():
        for i, (ida, va) in enumerate(members):
            for idb, vb in members[i + 1 :]:
                lo, hi = min(ida, idb), max(ida, idb)
                c = qcos(va, vb)
                if c is not None and c >= threshold:
                    out.add((lo, hi))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        load_tables(spark, SF_SMOKE, register_views=False)["embeddings"]
        .filter(F.col("vec_id") < 120)
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_pairs_match_independent_mirror_and_stay_within_cluster(spark, emb):
    cents = train_centroids(emb, "embedding", "vec_id", k=K, iters=2)
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, "embedding", "vec_id", THRESHOLD, centroids=cents
        ).collect()
    }
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    want = _expected_pairs(rows, cents, THRESHOLD)
    assert got == want
    assert got, "threshold too high for the harness embeddings — vacuous test"


def test_threshold_monotone_and_bounds(spark, emb):
    cents = train_centroids(emb, "embedding", "vec_id", k=K, iters=2)

    def pairs_at(t):
        return {
            (r["id_a"], r["id_b"])
            for r in semantic_dup_pairs(
                emb, "embedding", "vec_id", t, centroids=cents
            ).collect()
        }

    loose, tight = pairs_at(0.2), pairs_at(0.35)
    assert tight <= loose
    with pytest.raises(ValueError, match="threshold"):
        semantic_dup_pairs(emb, "embedding", "vec_id", 1.5)


def test_cluster_cap_bounds_the_quadratic_term(spark, emb):
    """max_cluster_size caps comparisons per cluster: the pair set
    shrinks to a subset, and every surviving pair's BOTH members are
    within the capped per-cluster population."""
    cents = train_centroids(emb, "embedding", "vec_id", k=K, iters=2)
    cap = 10
    capped = semantic_dup_pairs(
        emb, "embedding", "vec_id", 0.2, centroids=cents, max_cluster_size=cap
    )
    uncapped = semantic_dup_pairs(emb, "embedding", "vec_id", 0.2, centroids=cents)
    c = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    u = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert c <= u
    # analytic ceiling: K clusters x cap-choose-2
    assert len(c) <= K * cap * (cap - 1) // 2


def test_dedup_min_id_keeps_one_rep_and_all_unpaired_rows(spark, emb):
    cents = train_centroids(emb, "embedding", "vec_id", k=K, iters=2)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, "embedding", "vec_id", THRESHOLD, centroids=cents
        ).collect()
    }
    out = semantic_dedup(emb, "embedding", "vec_id", THRESHOLD, centroids=cents)
    kept = {r["vec_id"] for r in out.collect()}
    # union-find over the expected pairs: min-id representative policy
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    clustered = set(parent)
    expect = (all_ids - clustered) | {i for i in clustered if find(i) == i}
    assert kept == expect
    assert len(kept) < len(all_ids), "no dup groups formed — vacuous"


def test_dedup_farthest_keeps_most_atypical_member(spark):
    """The paper's policy on a constructed example: a 3-member dup
    group where one member sits measurably farther from the cluster
    centroid — that member must be the survivor (min_id would keep
    the lowest id instead, pinning that the policies differ)."""
    rows = [
        (1, [10.0, 10.0]),
        (2, [10.0, 10.05]),   # near-parallel to 1 -> same group
        (3, [12.0, 12.0]),    # parallel direction, farther out
        (9, [-50.0, 40.0]),   # unrelated, its own cluster
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[10.0, 10.0], [-50.0, 40.0]]
    far = semantic_dedup(
        df, "embedding", "vec_id", 0.99, centroids=cents, keep="farthest"
    )
    assert {r["vec_id"] for r in far.collect()} == {3, 9}
    min_id = semantic_dedup(
        df, "embedding", "vec_id", 0.99, centroids=cents, keep="min_id"
    )
    assert {r["vec_id"] for r in min_id.collect()} == {1, 9}
    with pytest.raises(ValueError, match="keep policy"):
        semantic_dedup(df, "embedding", "vec_id", 0.99, centroids=cents, keep="best")


def test_zero_grid_vectors_never_pair_and_survive_dedup(spark):
    """A vector whose every component quantizes to zero has no
    direction on the integer grid (cosine would be 0/0): it must be
    excluded from pairing explicitly — no NULL comparisons — and
    survive dedup untouched (no evidence, no drop), even when two such
    vectors are byte-identical."""
    rows = [
        (1, [0.0001, -0.0002]),   # quantizes to [0, 0]
        (2, [0.0001, -0.0002]),   # identical zero-grid twin
        (3, [10.0, 10.0]),
        (4, [10.0, 10.01]),       # real dup pair with 3
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[0.0, 0.0], [10.0, 10.0]]
    pairs = semantic_dup_pairs(df, "embedding", "vec_id", 0.5, centroids=cents)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(3, 4)}  # zero-grid rows contributed nothing
    out = semantic_dedup(df, "embedding", "vec_id", 0.5, centroids=cents)
    assert {r["vec_id"] for r in out.collect()} == {1, 2, 3}


def test_dedup_validates_threshold_before_training(spark):
    """An invalid threshold must raise BEFORE train_centroids pays
    full k-means passes over the corpus (second-review find)."""
    calls = []
    import open_data_pipelines_spark.operators.semdedup as sd

    real = sd.train_centroids
    sd.train_centroids = lambda *a, **kw: calls.append(1) or real(*a, **kw)
    try:
        df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup(df, "embedding", "vec_id", threshold=1.5)
    finally:
        sd.train_centroids = real
    assert calls == [], "k-means ran before threshold validation"
