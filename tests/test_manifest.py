"""Corpus build manifests: order-insensitive signatures, byte-stable
manifests, repartition invariance, change detection."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from open_data_pipelines_spark.plans.manifest import (
    corpus_signature,
    manifests_equal,
    write_corpus_manifest,
)
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE


def test_signature_partitioning_invariant(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    a = corpus_signature(docs)
    b = corpus_signature(docs.repartition(13).sortWithinPartitions("n_chars"))
    assert a == b
    assert a["rows"] == 500 and a["xor_sig"] != 0


def test_signature_detects_any_change(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    base = corpus_signature(docs)
    dropped = corpus_signature(docs.filter(F.col("doc_id") != 7))
    mutated = corpus_signature(
        docs.withColumn("text", F.when(F.col("doc_id") == 7, F.lit("x")).otherwise(F.col("text")))
    )
    assert dropped["xor_sig"] != base["xor_sig"] and dropped["rows"] == base["rows"] - 1
    assert mutated["xor_sig"] != base["xor_sig"] and mutated["rows"] == base["rows"]


def test_manifest_byte_stable_and_comparable(spark, tmp_path):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    p1, p2 = str(tmp_path / "m1.json"), str(tmp_path / "m2.json")
    m1 = write_corpus_manifest(p1, docs, config={"near_dup": "minhash"}, stats={"input": 500})
    m2 = write_corpus_manifest(p2, docs.repartition(7), config={"near_dup": "minhash"}, stats={"input": 500})
    assert open(p1).read() == open(p2).read()  # byte-identical builds
    assert manifests_equal(m1, m2)
    loaded = json.load(open(p1))
    assert loaded["signature"]["rows"] == 500
    m3 = write_corpus_manifest(
        str(tmp_path / "m3.json"), docs.filter(F.col("doc_id") != 7)
    )
    assert not manifests_equal(m1, m3)


def test_prepare_corpus_writes_manifest(spark, tmp_path):
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    p = str(tmp_path / "build.json")
    out, stats = prepare_corpus(
        spark, SF_SMOKE, near_dup="none", with_stats=True, manifest_path=p
    )
    m = json.load(open(p))
    assert m["config"]["near_dup"] == "none"
    assert m["funnel_stats"]["input"] == 500
    assert m["signature"]["rows"] == out.count()
