"""Heavy-hitter band cap for the MinHash-LSH candidate join.

A band bucket holding f*N docs emits ~(f*N)^2/2 candidate pairs — the
output itself is quadratic, so no join strategy fixes it; the cap
excludes degenerate buckets (mass duplicates / boilerplate, which the
exact-dedup stage upstream collapses anyway). tools/stress.py --skew
measures the same behavior at 20k docs (uncapped 47.7M pairs vs 38.5k
capped, see STRESS.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_dedup import (
    band_bucket_stats,
    minhash_lsh_candidates,
    shingle_corpus,
)

BOILER = "identical mass duplicated boilerplate text that lands every copy in one band bucket"


def _corpus(spark):
    rows = [(i, BOILER) for i in range(40)]
    # two near-dup pairs: tiny buckets (size 2), must survive the cap
    rows += [
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "alpha beta gamma delta epsilon zeta"),
        (200, "one two three four five six seven"),
        (201, "one two three four five six seven"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cap_drops_hot_bucket_keeps_small_ones(spark):
    docs = _corpus(spark)
    uncapped = minhash_lsh_candidates(docs, "text", "doc_id").count()
    assert uncapped == 40 * 39 // 2 + 2  # quadratic hot mass + 2 real pairs

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, "text", "doc_id", max_bucket_size=10
        ).collect()
    }
    assert capped == {(100, 101), (200, 201)}


def test_band_bucket_stats_reports_the_drop(spark):
    docs = _corpus(spark)
    stats = band_bucket_stats(
        shingle_corpus(docs, "text", "doc_id"), "doc_id", min_size=11
    ).collect()
    # all 4 bands of the 40 identical docs are hot; sizes exactly 40
    assert len(stats) == 4
    assert all(r["bucket_size"] == 40 for r in stats)
    mass = sum(r["bucket_size"] * (r["bucket_size"] - 1) // 2 for r in stats)
    assert mass == 4 * (40 * 39 // 2)


def test_capped_dedup_pipeline_still_verifies_jaccard(spark):
    from open_data_pipelines_spark.operators.text_dedup import minhash_lsh_dedup

    docs = _corpus(spark)
    out = minhash_lsh_dedup(docs, "text", "doc_id", max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert set(got) == {(100, 101), (200, 201)}
    assert all(abs(j - 1.0) < 1e-12 for j in got.values())
