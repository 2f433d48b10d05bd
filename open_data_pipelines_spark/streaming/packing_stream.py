"""Streaming twin of sequence packing (``operators/packing.py``):
greedy fixed-budget packing over a chunk stream via
``applyInPandasWithState``, keyed by packing domain.

Contract differences from the batch packer, same posture as the
MinHash band index's streaming twin (greedy admission vs batch
global order):

- **Admission order is (micro-batch, key)**: each batch's rows sort
  by ``key_col`` before appending to the domain's open pack, so the
  result is deterministic GIVEN the ingestion batching; across
  batches the order is arrival order, which is the streaming truth.
  A one-batch drain therefore equals ``pack_chunks`` exactly
  (pinned in tests/test_packing_stream.py).
- **Rows emit when their pack CLOSES**, so every emitted row carries
  the FINAL ``pack_tokens`` (append output mode; an update-mode
  running total would lie to a downstream writer that already
  shipped the row). The open pack's rows wait in state. A pack whose
  running total EXCEEDS the budget (only possible as an oversize
  singleton) closes immediately — no future row could ever join it;
  an exactly-at-budget pack waits, because zero-token rows may still
  join (the batch packer admits them).
- **State holds chunk keys and token counts only** — never payloads.
  The open pack is bounded by ``max_tokens`` rows (every non-empty
  chunk carries >= 1 token), so per-key state is small by
  construction; downstream joins text back by ``key_col``. This is
  what keeps the state store viable at 100 TB: packing state scales
  with open-pack METADATA, not corpus bytes.
- ``flush_after`` (optional, e.g. ``"30 seconds"``) arms a
  processing-time timeout that closes an idle domain's open pack —
  the tail flush a live pipeline needs; seq numbering continues
  afterwards, so pack ids never collide. Without it, tails emit on
  the next overflow (or never, for a drained bounded stream — the
  caller finishes tails with the batch packer, which is also the
  exactly-once-friendly choice on restart).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PACK_STATE_SCHEMA = (
    "seq LONG, run LONG, keys ARRAY<STRING>, toks ARRAY<LONG>"
)
PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("tokens", T.LongType()),
        T.StructField("pack_id", T.StringType()),
        T.StructField("pack_tokens", T.LongType()),
    ]
)


def _make_packer(budget: int, flush_after: str | None):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        dom = key[0]
        seq, run, keys, toks = (
            (state.get[0], state.get[1], list(state.get[2]), list(state.get[3]))
            if state.exists
            else (0, 0, [], [])
        )
        out: dict[str, list] = {
            "domain": [],
            "key": [],
            "tokens": [],
            "pack_id": [],
            "pack_tokens": [],
        }

        def close():
            nonlocal seq, run, keys, toks
            pid = f"{dom}/{seq}"
            out["domain"].extend([dom] * len(keys))
            out["key"].extend(keys)
            out["tokens"].extend(toks)
            out["pack_id"].extend([pid] * len(keys))
            out["pack_tokens"].extend([run] * len(keys))
            seq, run, keys, toks = seq + 1, 0, [], []

        if state.hasTimedOut:
            # idle flush: close the open tail; numbering continues
            if keys:
                close()
            state.update((seq, run, keys, toks))
        else:
            for pdf in pdfs:
                pdf = pdf.sort_values("key", kind="mergesort")
                for k, t in zip(pdf["key"], pdf["tokens"]):
                    t = int(t)
                    if run > 0 and run + t > budget:
                        close()
                    keys.append(k)
                    toks.append(t)
                    run += t
                    if run > budget:  # oversize singleton: nothing joins
                        close()
            state.update((seq, run, keys, toks))
            if flush_after is not None:
                state.setTimeoutDuration(flush_after)

        if out["key"]:
            yield pd.DataFrame(out)

    return update


def pack_chunk_stream(
    stream: DataFrame,
    key_col: str,
    tokens_col: str,
    max_tokens: int,
    domain_col: str,
    flush_after: str | None = None,
) -> DataFrame:
    """Greedy-pack a chunk stream per domain; emits
    ``(domain, key, tokens, pack_id, pack_tokens)`` rows as packs
    close (append mode). See the module docstring for the admission
    and flush contract.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    src = stream.select(
        F.col(domain_col).cast("string").alias("domain"),
        F.col(key_col).cast("string").alias("key"),
        F.col(tokens_col).cast("long").alias("tokens"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_after is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("domain").applyInPandasWithState(
        _make_packer(int(max_tokens), flush_after),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
