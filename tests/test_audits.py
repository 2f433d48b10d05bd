"""Corpus hygiene audits: PII exposure/residue counts and cross-split
near-dup leakage detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.audits import (
    assert_no_pii_residue,
    pii_audit,
    split_leakage_audit,
    split_leakage_pairs,
)
from open_data_pipelines_spark.operators.text_analysis import redact_pii
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE


def test_pii_audit_counts_by_category(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.user@example.org or b@x.co today"),
            (2, "server 10.0.0.1 and card 4111 1111 1111 1111"),
            (3, "call +44 20 7946 0958 please"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    row = pii_audit(df, "text").first()
    assert row["n_docs"] == 4
    assert row["email_matches"] == 2 and row["email_docs"] == 1
    assert row["ip_matches"] == 1 and row["ip_docs"] == 1
    assert row["card_matches"] == 1 and row["card_docs"] == 1
    assert row["phone_matches"] == 1 and row["phone_docs"] == 1


def test_pii_residue_zero_after_redaction(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    planted = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact leak@example.com at 10.1.2.3"))
    )
    raw = pii_audit(planted, "text").first()
    assert raw["email_matches"] >= 500 and raw["ip_matches"] >= 500
    redacted = planted.withColumn("text", redact_pii("text"))
    assert_no_pii_residue(redacted, "text")  # must not raise
    with pytest.raises(AssertionError, match="PII residue"):
        assert_no_pii_residue(planted, "text")


def test_split_leakage_detects_planted_cross_split_twin(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    base = docs.withColumn("split", F.lit("train"))
    twin = docs.filter(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny mutated tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
        F.lit("test").alias("split"),
    )
    corpus = base.unionByName(twin)
    leaks = split_leakage_pairs(corpus, "text", "doc_id", "split")
    got = {(r["id_a"], r["id_b"]) for r in leaks.collect()}
    assert (7, 90007) in got
    summary = {
        (r["split_a"], r["split_b"]): r["leaked_pairs"]
        for r in split_leakage_audit(corpus, "text", "doc_id", "split").collect()
    }
    assert sum(summary.values()) >= 1


def test_prepare_corpus_split_order_is_leak_free(spark):
    """The funnel dedups BEFORE splitting, so its output must audit
    clean even when the raw input carries cross-split near-twins."""
    from open_data_pipelines_spark.operators.sampling import assign_split
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    twins = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz mutated suffix")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    planted = docs.unionByName(twins)
    out = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=planted,
        near_dup="minhash",
        splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    )
    # audit at the surviving-doc level (one text per doc: chunk_idx 0)
    survivors = out.filter(F.col("chunk_idx") == 0).select(
        "doc_id", F.col("chunk").alias("text"), "split"
    )
    leaks = split_leakage_audit(survivors, "text", "doc_id", "split")
    assert leaks.count() == 0

    # control: splitting the RAW corpus first is NOT leak-free
    raw_split = assign_split(planted, "doc_id", (("train", 0.5), ("test", 0.5)))
    assert split_leakage_audit(raw_split, "text", "doc_id", "split").count() > 0
