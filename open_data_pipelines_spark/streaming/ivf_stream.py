"""Streaming IVF index maintenance (engine extension): embeddings
arrive continuously (the vector-side twin of
:mod:`.media_stream` / :mod:`.corpus_stream`), and each micro-batch
flows through the drift-gated policy of
:func:`..operators.ivf.maintain_ivf_index`:

- in-distribution batches assign against the FROZEN centroid bank (a
  pure codegen projection — streaming-safe by construction) and append
  into the ``partitionBy(list_id)`` layout, touching only the
  partitions the batch lands in;
- a batch whose mean nearest-centroid distance trips
  ``retrain_factor``x the training-time baseline triggers a retrain on
  existing+batch and a full remap inside that batch's ``foreachBatch``
  call, so the index is always a single-bank assignment and probe-all
  stays row-identical to brute force between batches.

Delivery posture is the same at-least-once append as the other bronze
sinks: a replayed batch re-appends rows (parquet cannot dedup by
itself) — dedup the stream on the id upstream or compact at retrain
time, exactly the contract documented on ``append_to_ivf_index``.
The centroid bank + drift baseline are driver-side state (O(k x dim)
floats — the model, never data), carried across batches in the
returned state box and re-derivable after a restart by retraining or
re-reading a persisted bank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.ivf import maintain_ivf_index


def stream_embeddings_to_ivf(
    stream: DataFrame,
    vec_col: str,
    id_col: str,
    index_path: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    baseline_mean_dist2: float,
    retrain_factor: float = 2.0,
    k: int | None = None,
    iters: int = 3,
):
    """availableNow drain of an embedding stream into a maintained IVF
    index. Returns ``(query, state)``; ``state`` is updated per batch:
    ``centroids``, ``baseline_mean_dist2``, ``retrains`` (count), and
    ``batches`` — the caller's next-session bank if it persists it."""
    state = {
        "centroids": centroids,
        "baseline_mean_dist2": baseline_mean_dist2,
        "retrains": 0,
        "batches": 0,
    }

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = maintain_ivf_index(
            batch_df,
            vec_col,
            id_col,
            state["centroids"],
            index_path,
            state["baseline_mean_dist2"],
            retrain_factor=retrain_factor,
            k=k,
            iters=iters,
        )
        state["centroids"] = res["centroids"]
        state["baseline_mean_dist2"] = res["baseline_mean_dist2"]
        state["retrains"] += int(res["retrained"])
        state["batches"] += 1

    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query, state
