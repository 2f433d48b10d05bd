"""Document retraction: broadcast anti-join removal, selective
re-pack of affected domains only, audit record, idempotency."""

from __future__ import annotations

import json

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


def test_retract_and_reissue_resigns_manifest(spark, tmp_path):
    """Takedown evidence chain: reissue writes a fresh manifest whose
    signature differs, the report's per-id diff lists exactly the
    tombstoned-and-present ids, and the history is appended on disk."""
    from open_data_pipelines_spark.operators.retraction import retract_and_reissue
    from open_data_pipelines_spark.plans.manifest import write_corpus_manifest

    df = _chunks(spark)
    path = str(tmp_path / "manifest.json")
    old = write_corpus_manifest(path, df, config={"k": 1}, stats={"input": 120})

    tomb = spark.createDataFrame([(3,), (17,), (999,)], ["doc_id"])
    out, report = retract_and_reissue(df, tomb, path)
    assert report["changed"] is True
    assert report["removed_ids"] == [3, 17]  # 999 absent -> not in the diff
    assert report["rows_before"] == 120 and report["rows_after"] == 114
    assert report["new_signature"] != old["signature"]
    assert out.count() == 114

    reissued = json.load(open(path))
    assert reissued["signature"] == report["new_signature"]
    assert reissued["config"] == {"k": 1}  # build config preserved
    assert reissued["retractions"] == [{"removed_ids": [3, 17]}]

    # chained takedown appends to the history
    tomb2 = spark.createDataFrame([(25,)], ["doc_id"])
    out2, report2 = retract_and_reissue(out, tomb2, path)
    assert report2["removed_ids"] == [25]
    chained = json.load(open(path))
    assert chained["retractions"] == [{"removed_ids": [3, 17]}, {"removed_ids": [25]}]
    assert chained["signature"]["rows"] == 111


def test_retract_and_reissue_absent_id_is_byte_noop(spark, tmp_path):
    from open_data_pipelines_spark.operators.retraction import retract_and_reissue
    from open_data_pipelines_spark.plans.manifest import write_corpus_manifest

    df = _chunks(spark)
    path = str(tmp_path / "manifest.json")
    write_corpus_manifest(path, df)
    before = open(path, "rb").read()

    out, report = retract_and_reissue(
        df, spark.createDataFrame([(999,)], ["doc_id"]), path
    )
    assert report["changed"] is False and report["removed_ids"] == []
    assert open(path, "rb").read() == before  # byte-identical on disk
    assert out.count() == df.count()


def test_retract_and_reissue_packed_mode(spark, tmp_path):
    """max_tokens routes through retract_from_packed: the reissued
    signature covers the re-packed frame and pack integrity holds."""
    from open_data_pipelines_spark.operators.retraction import retract_and_reissue
    from open_data_pipelines_spark.plans.manifest import write_corpus_manifest

    df = _chunks(spark)
    packed = pack_chunks(df, "__ck", "__ct", max_tokens=128, n_shards=8)
    path = str(tmp_path / "manifest.json")
    old = write_corpus_manifest(path, packed)

    tomb = spark.createDataFrame([(5,), (6,)], ["doc_id"])
    out, report = retract_and_reissue(packed, tomb, path, max_tokens=128)
    assert report["changed"] is True and report["removed_ids"] == [5, 6]
    assert out.filter(F.col("doc_id").isin(5, 6)).count() == 0
    sums = out.groupBy("pack_id").agg(
        F.sum("__ct").alias("s"), F.first("pack_tokens").alias("pt")
    )
    assert sums.filter(F.col("s") != F.col("pt")).count() == 0
    assert report["new_signature"] != old["signature"]


def test_retract_from_packed_property_random_tombstones(spark):
    """Property over random corpora/tombstone sets: retracting from a
    packed corpus equals packing the survivors from scratch (same
    greedy key order), and domains that lost no rows keep their pack
    assignments byte-for-byte."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(99)
    for trial in range(4):
        n_docs = rnd.randint(10, 50)
        rows = []
        for d in range(n_docs):
            for c in range(rnd.randint(1, 4)):
                rows.append((d, f"{d:05d}#{c:03d}", rnd.randint(20, 70)))
        df = spark.createDataFrame(rows, ["doc_id", "__ck", "__ct"])
        packed = pack_chunks(df, "__ck", "__ct", max_tokens=128, n_shards=4)

        victims = rnd.sample(range(n_docs), rnd.randint(0, n_docs // 2))
        victims.append(99999)  # absent id: must be a no-op contributor
        tomb = spark.createDataFrame([(v,) for v in victims], ["doc_id"])

        out = retract_from_packed(packed, tomb, max_tokens=128)
        fresh = pack_chunks(
            df.join(tomb, "doc_id", "left_anti"),
            "__ck",
            "__ct",
            max_tokens=128,
            n_shards=4,
        )
        got = {tuple(r) for r in out.select("__ck", "pack_id", "pack_tokens").collect()}
        want = {
            tuple(r) for r in fresh.select("__ck", "pack_id", "pack_tokens").collect()
        }
        assert got == want, (trial, victims)
        # pack integrity: recorded pack_tokens equals the actual sum
        bad = (
            out.groupBy("pack_id")
            .agg(F.sum("__ct").alias("s"), F.first("pack_tokens").alias("pt"))
            .filter(F.col("s") != F.col("pt"))
            .count()
        )
        assert bad == 0, trial


def test_retract_from_packed_nested_split_domains(spark):
    """Round-9 review find: the packing domain is everything before
    the LAST '/' of pack_id — corpus_prep nests shard domains inside
    splits ('train/17'), and the old first-segment parse collapsed
    every such domain into its split: one tombstone re-packed the
    whole split and rewrote every surviving train pack id."""
    df = _chunks(spark).withColumn(
        "__dom",
        F.concat(
            F.lit("train/"),
            F.pmod(stable_long_hash("__ck", salt="pack"), F.lit(4)).cast("string"),
        ),
    )
    packed = pack_chunks(df, "__ck", "__ct", max_tokens=128, group_col="__dom").drop(
        "__dom"
    ).persist()
    victim = 5
    victim_doms = {
        r["d"]
        for r in packed.filter(F.col("doc_id") == victim)
        .select(F.regexp_replace("pack_id", "/[^/]*$", "").alias("d"))
        .distinct()
        .collect()
    }
    assert victim_doms and all(d.startswith("train/") for d in victim_doms)
    # with 4 shards under one split, at least one shard must be
    # untouched for the assertion below to bite
    all_doms = {
        r["d"]
        for r in packed.select(
            F.regexp_replace("pack_id", "/[^/]*$", "").alias("d")
        ).distinct().collect()
    }
    untouched_doms = all_doms - victim_doms
    assert untouched_doms

    tomb = spark.createDataFrame([(victim,)], ["doc_id"])
    out = retract_from_packed(packed, tomb, max_tokens=128).persist()
    assert out.filter(F.col("doc_id") == victim).count() == 0

    before = {
        (r["__ck"], r["pack_id"], r["pack_tokens"])
        for r in packed.filter(
            F.regexp_replace("pack_id", "/[^/]*$", "").isin(*untouched_doms)
        ).collect()
    }
    after = {
        (r["__ck"], r["pack_id"], r["pack_tokens"])
        for r in out.filter(
            F.regexp_replace("pack_id", "/[^/]*$", "").isin(*untouched_doms)
        ).collect()
    }
    # sibling shards under the same split prefix are byte-for-byte
    # untouched — the blast radius is the exact nested domain
    assert before == after
    packed.unpersist()
    out.unpersist()
