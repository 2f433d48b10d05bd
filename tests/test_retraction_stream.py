"""Tombstone-stream retraction against a stored packed corpus:
end-state parity with the batch twin, emptied-domain partition
deletion, replay idempotence, and the audit trail."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.packing import pack_chunks
from open_data_pipelines_spark.operators.retraction import retract_from_packed
from open_data_pipelines_spark.streaming.retraction_stream import (
    stream_retractions_to_packed,
    write_packed_corpus,
)

BUDGET = 100


def _chunks(spark):
    # 6 docs x 2 chunks over 3 explicit domains; d2 holds only doc 2
    # and doc 5 so tombstoning both EMPTIES it
    rows = [
        (doc, f"{doc:02d}/{i}", 30 + 5 * i, f"d{doc % 3}")
        for doc in range(6)
        for i in range(2)
    ]
    return spark.createDataFrame(rows, ["doc_id", "__ck", "__ct", "grp"])


def _build_corpus(spark, d):
    packed = pack_chunks(_chunks(spark), "__ck", "__ct", BUDGET, group_col="grp")
    write_packed_corpus(packed, f"{d}/corpus")
    return packed


def _land(spark, d, ids):
    spark.createDataFrame([(i,) for i in ids], ["doc_id"]).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/tombstones")


def _drain(spark, d, audit=True):
    stream = (
        spark.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", 1)  # one landed file = one batch
        .parquet(f"{d}/tombstones")
    )
    q = stream_retractions_to_packed(
        stream,
        f"{d}/corpus",
        f"{d}/ckpt",
        BUDGET,
        audit_dir=f"{d}/audit" if audit else None,
    )
    q.awaitTermination()


def test_stream_retraction_matches_batch_twin(spark):
    d = tempfile.mkdtemp(prefix="retract_stream_")
    packed = _build_corpus(spark, d)
    _land(spark, d, [1])
    time.sleep(1.1)
    _land(spark, d, [4, 10])  # absent id 10 must be a no-op rider
    _drain(spark, d)

    got = {
        tuple(r)
        for r in spark.read.parquet(f"{d}/corpus")
        .select("doc_id", "__ck", "__ct", "grp", "pack_id", "pack_tokens")
        .collect()
    }
    tomb = spark.createDataFrame([(1,), (4,), (10,)], ["doc_id"])
    expect = {
        tuple(r)
        for r in retract_from_packed(packed, tomb, BUDGET)
        .select("doc_id", "__ck", "__ct", "grp", "pack_id", "pack_tokens")
        .collect()
    }
    assert got == expect
    assert not {r[0] for r in got} & {1, 4}

    audit = sorted(
        (r["batch_id"], r["n_tombstones"], r["n_affected_domains"], r["rows_removed"])
        for r in spark.read.parquet(f"{d}/audit").collect()
    )
    assert audit == [(0, 1, 1, 2), (1, 2, 1, 2)]


def test_emptying_a_domain_deletes_its_partition(spark):
    d = tempfile.mkdtemp(prefix="retract_stream_empty_")
    _build_corpus(spark, d)
    _land(spark, d, [2, 5])  # all of domain d2
    _drain(spark, d)

    left = spark.read.parquet(f"{d}/corpus")
    assert left.where(F.col("grp") == "d2").count() == 0
    assert "__dom=d2" not in set(os.listdir(f"{d}/corpus"))
    # the other domains were untouched: byte-stable pack ids
    assert left.count() == 8
    audit = spark.read.parquet(f"{d}/audit").collect()
    assert audit[0]["emptied_domains"] == ["d2"]


def test_replay_is_a_noop(spark):
    """Re-applying the same tombstones from a FRESH checkpoint (a
    maximal at-least-once replay) finds no affected domains and
    leaves the corpus files untouched."""
    d = tempfile.mkdtemp(prefix="retract_stream_replay_")
    _build_corpus(spark, d)
    _land(spark, d, [1, 4])
    _drain(spark, d)

    corpus_root = f"{d}/corpus"
    before = {
        tuple(r) for r in spark.read.parquet(corpus_root).collect()
    }
    mtimes = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(corpus_root)
        for p in fs
    }

    # fresh checkpoint -> the source replays every tombstone file
    import shutil

    shutil.rmtree(f"{d}/ckpt")
    _drain(spark, d)

    after = {tuple(r) for r in spark.read.parquet(corpus_root).collect()}
    assert after == before
    mtimes2 = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(corpus_root)
        for p in fs
    }
    assert mtimes2 == mtimes  # zero affected domains -> zero writes
    # the replayed batch appended a second audit row with rows_removed=0
    audit = sorted(
        (r["batch_id"], r["rows_removed"])
        for r in spark.read.parquet(f"{d}/audit").collect()
    )
    assert audit == [(0, 0), (0, 4)]
