"""Cluster-derived topic domains: label correctness against a scalar
nearest-centroid mirror, row preservation with missing embeddings,
bank reuse, and the composition with the mixing machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.topics import cluster_domains
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)


def test_labels_match_scalar_nearest_centroid(spark, tables):
    docs = tables["documents"]
    embs = tables["embeddings"]
    out = cluster_domains(docs, embs, k=8, iters=2)
    assert out.count() == docs.count()  # row-preserving
    assert out.columns == docs.columns + ["domain"]

    # scalar mirror: recompute nearest centroid per vector in Python
    from open_data_pipelines_spark.operators.ivf import train_centroids

    cents = train_centroids(embs, "embedding", "vec_id", k=8, iters=2)
    vecs = {r["vec_id"]: list(r["embedding"]) for r in embs.collect()}

    def nearest(v):
        best, best_d = 0, float("inf")
        for i, c in enumerate(cents):
            d = sum((a - b) ** 2 for a, b in zip(v, c))
            if d < best_d:
                best, best_d = i, d
        return f"cluster_{best}"

    got = {r["doc_id"]: r["domain"] for r in out.select("doc_id", "domain").collect()}
    for doc_id, label in got.items():
        if doc_id in vecs:
            assert label == nearest(vecs[doc_id]), doc_id

    # bank reuse returns identical labels without retraining
    again = cluster_domains(docs, embs, centroids=cents)
    got2 = {r["doc_id"]: r["domain"] for r in again.select("doc_id", "domain").collect()}
    assert {k: v for k, v in got.items() if k in vecs} == {
        k: v for k, v in got2.items() if k in vecs
    }


def test_missing_embeddings_get_sentinel_not_dropped(spark, tables):
    docs = tables["documents"]
    embs = tables["embeddings"].filter(F.col("vec_id") % 2 == 0)  # half missing
    out = cluster_domains(docs, embs, k=4, iters=1)
    assert out.count() == docs.count()
    n_unc = out.filter(F.col("domain") == "unclustered").count()
    have = {r[0] for r in embs.select("vec_id").collect()}
    want_unc = docs.filter(~F.col("doc_id").isin(list(have))).count()
    assert n_unc == want_unc

    with pytest.raises(ValueError):
        cluster_domains(out, embs)  # domain column already present


def test_cluster_balanced_mixing_composition(spark, tables):
    """The point of the operator: cluster labels feed the ordinary
    mixing machinery. Temperature flattening over cluster domains must
    raise the smallest cluster's share, and cap_per_stratum must bound
    the biggest."""
    from open_data_pipelines_spark.operators.sampling import (
        cap_per_stratum,
        rebalance_to_mix,
        temperature_weights,
    )

    docs = tables["documents"]
    embs = tables["embeddings"]
    labeled = cluster_domains(docs, embs, k=4, iters=2)
    sizes = {r[0]: r[1] for r in labeled.groupBy("domain").count().collect()}
    assert len(sizes) >= 2

    w = temperature_weights(labeled, "domain", 4.0)
    flat = rebalance_to_mix(labeled, "domain", w, "doc_id")
    out_sizes = {r[0]: r[1] for r in flat.groupBy("domain").count().collect()}
    small = min(sizes, key=sizes.get)

    def share(d, s):
        return d.get(s, 0) / max(1, sum(d.values()))

    assert share(out_sizes, small) >= share(sizes, small)  # flattened upward

    cap = max(2, min(sizes.values()))
    capped = cap_per_stratum(labeled, "domain", cap, "doc_id")
    capped_sizes = {r[0]: r[1] for r in capped.groupBy("domain").count().collect()}
    assert capped_sizes[min(sizes, key=sizes.get)] == min(sizes.values())  # untouched


def test_duplicate_vec_ids_do_not_fan_out_docs(spark, tables):
    """A duplicate vec_id must not duplicate doc rows: labels collapse
    deterministically (min label) before the left join."""
    docs = tables["documents"]
    embs = tables["embeddings"]
    doubled = embs.unionByName(embs.limit(20))
    out = cluster_domains(docs, doubled, k=4, iters=1)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
