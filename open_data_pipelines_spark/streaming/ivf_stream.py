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
returned state box and — when ``state_path`` is given — persisted to
a JSON sidecar after every batch, so a restarted stream resumes
against the SAME bank it left off with (no spurious retrain, no
manual re-handoff): the restart twin of the Structured Streaming
checkpoint, for the model the checkpoint cannot carry. The sidecar
write is atomic (tmp + rename); after a crash between a batch's index
append and its sidecar write, the replayed batch re-runs against the
previous bank — the same at-least-once posture as the data append.
Reference anchor: the run-metadata evidence discipline
(``src/data_processors/utils/metadata_logger.py:35-137``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..operators.ivf import maintain_ivf_index


def load_bank_state(state_path: str) -> dict | None:
    """Persisted bank sidecar ({centroids, baseline_mean_dist2,
    retrains, batches}) or None when no stream has written one yet."""
    try:
        with open(state_path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _save_bank_state(state_path: str, state: dict) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, state_path)


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
    state_path: str | None = None,
):
    """availableNow drain of an embedding stream into a maintained IVF
    index. Returns ``(query, state)``; ``state`` is updated per batch:
    ``centroids``, ``baseline_mean_dist2``, ``retrains`` (count), and
    ``batches``. With ``state_path`` (conventionally a ``bank.json``
    NEXT TO — not inside — ``checkpoint_dir``, which Spark owns) the
    sidecar is loaded on start when present — the passed
    ``centroids``/``baseline_mean_dist2`` then only seed the FIRST
    session — and saved after every batch."""
    state = {
        "centroids": centroids,
        "baseline_mean_dist2": baseline_mean_dist2,
        "retrains": 0,
        "batches": 0,
    }
    if state_path is not None:
        persisted = load_bank_state(state_path)
        if persisted is not None:
            state.update(persisted)

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
        if state_path is not None:
            _save_bank_state(state_path, state)

    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query, state
