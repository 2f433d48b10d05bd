"""Streaming IVF maintenance: in-distribution batches append against
the frozen bank; a drifted batch triggers retrain+remap inside its
micro-batch; probe-all stays row-identical to brute force after the
drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.ivf import (
    build_ivf_index,
    global_mean_dist2,
    ivf_topk,
    train_centroids,
)
from open_data_pipelines_spark.operators.similarity import brute_force_topk
from open_data_pipelines_spark.streaming.ivf_stream import stream_embeddings_to_ivf

K_CELLS = 4


def _vecs(spark, ids, offset=0.0):
    rows = [
        (i, [float(i % 7) + 1.0 + offset, float((i * 3) % 5) + 1.0 + offset])
        for i in ids
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_stream_maintains_index_and_retrains_on_drift(spark, tmp_path):
    base = _vecs(spark, range(100))
    cents = train_centroids(base, "embedding", "vec_id", k=K_CELLS, iters=5)
    index_path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=index_path)
    baseline = global_mean_dist2(base, "embedding", cents)

    # two drops, one file each (maxFilesPerTrigger=1 -> two batches):
    # calm batch then a far-shifted one
    landing = str(tmp_path / "landing")
    calm = _vecs(spark, range(100, 120))
    drifted = _vecs(spark, range(200, 240), offset=50.0)
    calm.repartition(1).write.parquet(landing)
    drifted.repartition(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.format("parquet")
        .schema(calm.schema)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q, state = stream_embeddings_to_ivf(
        stream,
        "embedding",
        "vec_id",
        index_path,
        str(tmp_path / "ckpt"),
        cents,
        baseline,
        retrain_factor=2.0,
    )
    q.awaitTermination(120)

    assert state["batches"] == 2
    assert state["retrains"] == 1  # only the drifted batch trips the gate
    assert state["centroids"] != cents

    index = spark.read.parquet(index_path)
    assert index.count() == 160

    full = base.unionByName(calm).unionByName(drifted)
    queries = _vecs(spark, [0, 101])
    cols = ["query_id", "neighbor_id", "rank", "cosine_sim"]
    bf = {
        tuple(r)
        for r in brute_force_topk(full, queries, "embedding", "vec_id", k=5)
        .select(cols)
        .collect()
    }
    got = {
        tuple(r)
        for r in ivf_topk(
            index, queries, "embedding", "vec_id", state["centroids"], k=5,
            nprobe=K_CELLS,
        )
        .select(cols)
        .collect()
    }
    assert got == bf


def test_drift_first_batch_on_fresh_index_path(spark, tmp_path):
    """Code-review r7 finding: a drifted FIRST batch on an index path
    nothing has written yet must retrain on the batch alone, not crash
    inside foreachBatch on the missing parquet."""
    base = _vecs(spark, range(100))
    cents = train_centroids(base, "embedding", "vec_id", k=K_CELLS, iters=5)
    baseline = global_mean_dist2(base, "embedding", cents)

    landing = str(tmp_path / "landing")
    drifted = _vecs(spark, range(300, 340), offset=50.0)
    drifted.repartition(1).write.parquet(landing)

    index_path = str(tmp_path / "fresh_ivf")  # never built
    stream = (
        spark.readStream.format("parquet").schema(drifted.schema).load(landing)
    )
    q, state = stream_embeddings_to_ivf(
        stream,
        "embedding",
        "vec_id",
        index_path,
        str(tmp_path / "ckpt"),
        cents,
        baseline,
        retrain_factor=2.0,
    )
    q.awaitTermination(120)
    assert state["retrains"] == 1 and state["batches"] == 1

    index = spark.read.parquet(index_path)
    assert index.count() == 40
    queries = _vecs(spark, [301], offset=50.0)
    cols = ["query_id", "neighbor_id", "rank", "cosine_sim"]
    bf = {
        tuple(r)
        for r in brute_force_topk(drifted, queries, "embedding", "vec_id", k=5)
        .select(cols)
        .collect()
    }
    got = {
        tuple(r)
        for r in ivf_topk(
            index, queries, "embedding", "vec_id", state["centroids"], k=5,
            nprobe=K_CELLS,
        )
        .select(cols)
        .collect()
    }
    assert got == bf


def test_bank_state_survives_restart(spark, tmp_path):
    """VERDICT r7 task #3: with state_path, a restarted stream resumes
    against the PERSISTED bank — the second session is handed a
    deliberately bogus seed bank (which WOULD trip the drift gate) and
    must ignore it in favour of the sidecar: no spurious retrain, and
    probe-all stays row-identical to brute force."""
    base = _vecs(spark, range(100))
    cents = train_centroids(base, "embedding", "vec_id", k=K_CELLS, iters=5)
    index_path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=index_path)
    baseline = global_mean_dist2(base, "embedding", cents)

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    bank = str(tmp_path / "bank.json")

    # session 1: one calm batch, persisting the bank sidecar
    calm1 = _vecs(spark, range(100, 120))
    calm1.repartition(1).write.parquet(landing)
    stream = (
        spark.readStream.format("parquet").schema(calm1.schema).load(landing)
    )
    q, s1 = stream_embeddings_to_ivf(
        stream, "embedding", "vec_id", index_path, ckpt,
        cents, baseline, retrain_factor=2.0, state_path=bank,
    )
    q.awaitTermination(120)
    assert s1["batches"] == 1 and s1["retrains"] == 0

    # session 2 (restart): second calm file; the seed args are a bogus
    # far-off bank + near-zero baseline that WOULD force a retrain if
    # the sidecar were ignored
    calm2 = _vecs(spark, range(120, 140))
    calm2.repartition(1).write.mode("append").parquet(landing)
    bogus_cents = [[1e6, 1e6] for _ in range(K_CELLS)]
    stream2 = (
        spark.readStream.format("parquet").schema(calm2.schema).load(landing)
    )
    q2, s2 = stream_embeddings_to_ivf(
        stream2, "embedding", "vec_id", index_path, ckpt,
        bogus_cents, 1e-12, retrain_factor=2.0, state_path=bank,
    )
    q2.awaitTermination(120)
    assert s2["centroids"] == cents  # resumed the persisted bank
    assert s2["retrains"] == 0       # calm batch against the true bank
    assert s2["batches"] == 2        # counter carried across sessions

    index = spark.read.parquet(index_path)
    assert index.count() == 140
    full = base.unionByName(calm1).unionByName(calm2)
    queries = _vecs(spark, [0, 101, 121])
    cols = ["query_id", "neighbor_id", "rank", "cosine_sim"]
    bf = {
        tuple(r)
        for r in brute_force_topk(full, queries, "embedding", "vec_id", k=5)
        .select(cols)
        .collect()
    }
    got = {
        tuple(r)
        for r in ivf_topk(
            index, queries, "embedding", "vec_id", s2["centroids"], k=5,
            nprobe=K_CELLS,
        )
        .select(cols)
        .collect()
    }
    assert got == bf
