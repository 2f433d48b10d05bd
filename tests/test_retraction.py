"""Document retraction: broadcast anti-join removal, selective
re-pack of affected domains only, audit record, idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.functions.hashing import stable_long_hash
from open_data_pipelines_spark.operators.packing import pack_chunks
from open_data_pipelines_spark.operators.retraction import (
    retract_documents,
    retract_from_packed,
    retraction_audit,
)


def _chunks(spark, n_docs=40, chunks_per_doc=3):
    rows = []
    for d in range(n_docs):
        for c in range(chunks_per_doc):
            rows.append((d, f"{d:05d}#{c:03d}", 30 + (d * 7 + c) % 40))
    return spark.createDataFrame(rows, ["doc_id", "__ck", "__ct"])


def test_retract_documents_anti_join(spark):
    df = _chunks(spark)
    tomb = spark.createDataFrame([(3,), (17,)], ["doc_id"])
    out = retract_documents(df, tomb)
    assert out.count() == df.count() - 6
    assert out.filter(F.col("doc_id").isin(3, 17)).count() == 0
    # idempotent + absent-id no-op
    again = retract_documents(out, spark.createDataFrame([(3,), (999,)], ["doc_id"]))
    assert again.count() == out.count()


def test_retract_from_packed_repacks_only_affected_domains(spark):
    df = _chunks(spark)
    packed = pack_chunks(df, "__ck", "__ct", max_tokens=128, n_shards=8).persist()
    dom = F.pmod(stable_long_hash("__ck", salt="pack"), F.lit(8)).cast("string")
    doc_domains = {
        r["doc_id"]: {d for d in r["doms"]}
        for r in df.withColumn("__d", dom)
        .groupBy("doc_id")
        .agg(F.collect_set("__d").alias("doms"))
        .collect()
    }
    victim = 5
    tomb = spark.createDataFrame([(victim,)], ["doc_id"])

    out = retract_from_packed(packed, tomb, max_tokens=128).persist()
    assert out.filter(F.col("doc_id") == victim).count() == 0
    assert out.count() == packed.count() - 3

    # untouched domains keep their pack assignment byte-for-byte
    affected = doc_domains[victim]
    before = {
        (r["__ck"], r["pack_id"], r["pack_tokens"])
        for r in packed.withColumn("__d", dom).filter(~F.col("__d").isin(*affected)).collect()
    }
    after = {
        (r["__ck"], r["pack_id"], r["pack_tokens"])
        for r in out.withColumn("__d", dom).filter(~F.col("__d").isin(*affected)).collect()
    }
    assert before == after

    # affected domains re-packed consistently: every pack's token sum
    # matches its pack_tokens and respects the budget (singletons aside)
    integ = (
        out.groupBy("pack_id")
        .agg(F.sum("__ct").alias("s"), F.first("pack_tokens").alias("pt"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in integ:
        assert r["s"] == r["pt"], r
        assert r["pt"] <= 128 or r["n"] == 1

    # equivalently: result equals packing the surviving rows from scratch
    fresh = pack_chunks(
        df.filter(F.col("doc_id") != victim), "__ck", "__ct", max_tokens=128, n_shards=8
    )
    assert {tuple(r) for r in out.select("__ck", "pack_id", "pack_tokens").collect()} == {
        tuple(r) for r in fresh.select("__ck", "pack_id", "pack_tokens").collect()
    }


def test_retraction_audit(spark):
    df = _chunks(spark)
    packed = pack_chunks(df, "__ck", "__ct", max_tokens=128, n_shards=8)
    tomb = spark.createDataFrame([(5,), (6,), (999,)], ["doc_id"])
    row = retraction_audit(packed, tomb).first()
    assert row["rows_removed"] == 6
    assert row["docs_removed"] == 2
    assert row["domains_touched"] >= 1
