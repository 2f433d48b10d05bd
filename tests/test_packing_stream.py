"""Streaming packing twin: greedy admission parity with the batch
packer on a one-batch drain, cross-batch state continuation, and the
idle-flush path (exercised directly against the packer closure — a
processing-time timeout never fires inside an availableNow drain)."""

from __future__ import annotations

import tempfile
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.streaming.packing_stream import (
    _make_packer,
    pack_chunk_stream,
)
from open_data_pipelines_spark.streaming.windows import (
    read_event_stream,
    run_to_memory,
)

BUDGET = 100


def greedy_oracle(batches):
    """Sequential mirror of the streaming admission contract: per
    domain, feed each batch's rows in key order; close on overflow and
    on oversize; return (closed rows, open tails). Each row is
    (domain, key, tokens)."""
    state: dict = {}
    closed = []

    def close(dom):
        seq, run, members = state[dom]
        for k, t in members:
            closed.append((dom, k, t, f"{dom}/{seq}", run))
        state[dom] = (seq + 1, 0, [])

    for batch in batches:
        per_dom: dict = {}
        for dom, k, t in batch:
            per_dom.setdefault(dom, []).append((k, t))
        for dom, rows in per_dom.items():
            state.setdefault(dom, (0, 0, []))
            for k, t in sorted(rows):
                seq, run, members = state[dom]
                if run > 0 and run + t > BUDGET:
                    close(dom)
                seq, run, members = state[dom]
                state[dom] = (seq, run + t, members + [(k, t)])
                if run + t > BUDGET:
                    close(dom)
    tails = {
        dom: (seq, run, members)
        for dom, (seq, run, members) in state.items()
        if members
    }
    return closed, tails


def _chunks():
    # domain a: three closes (incl. an exact-budget pack that must
    # WAIT for the next arrival); domain b: an oversize singleton that
    # must close immediately plus a tail that stays open
    return [
        ("a", "c00", 40),
        ("a", "c01", 40),
        ("a", "c02", 20),  # pack a/0 = exactly 100 -> waits
        ("a", "c03", 70),  # overflow closes a/0, opens a/1
        ("a", "c04", 50),  # closes a/1 at 70, opens a/2 (tail)
        ("b", "c05", 150),  # oversize -> a/… immediate singleton b/0
        ("b", "c06", 30),  # tail b/1
    ]


def test_one_batch_drain_matches_greedy_oracle(spark):
    rows = _chunks()
    d = tempfile.mkdtemp(prefix="pack_stream_")
    df = spark.createDataFrame(rows, ["domain", "chunk_key", "n_tokens"])
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b0")

    stream = read_event_stream(spark, f"{d}/b0", df.schema)
    out = pack_chunk_stream(stream, "chunk_key", "n_tokens", BUDGET, "domain")
    run_to_memory(out, "pack_stream_out", "append")

    got = {
        tuple(r)
        for r in spark.table("pack_stream_out")
        .select("domain", "key", "tokens", "pack_id", "pack_tokens")
        .collect()
    }
    expect_closed, tails = greedy_oracle([rows])
    assert got == set(expect_closed)
    # the open tails (a/2 and b/1) are withheld, not lost
    assert set(tails) == {"a", "b"}
    emitted_keys = {k for (_, k, _, _, _) in expect_closed}
    assert emitted_keys | {
        k for (_, _, ms) in tails.values() for (k, _) in ms
    } == {k for (_, k, _) in rows}


def test_one_batch_drain_matches_batch_packer(spark):
    """A one-batch drain equals pack_chunks minus each domain's final
    (still-open) pack — the batch/stream parity claim in the module
    docstring."""
    from open_data_pipelines_spark.operators.packing import pack_chunks

    rows = [(d, k, t) for (d, k, t) in _chunks() if not (d == "b" and t > BUDGET)]
    d = tempfile.mkdtemp(prefix="pack_stream_parity_")
    df = spark.createDataFrame(rows, ["domain", "chunk_key", "n_tokens"])
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b0")

    batch = pack_chunks(
        df, "chunk_key", "n_tokens", BUDGET, group_col="domain"
    ).collect()
    last_seq = {}
    for r in batch:
        dom, seq = r["pack_id"].split("/")
        last_seq[dom] = max(last_seq.get(dom, -1), int(seq))
    expect = {
        (r["domain"], r["chunk_key"], r["n_tokens"], r["pack_id"], r["pack_tokens"])
        for r in batch
        if int(r["pack_id"].split("/")[1]) < last_seq[r["pack_id"].split("/")[0]]
    }

    stream = read_event_stream(spark, f"{d}/b0", df.schema)
    out = pack_chunk_stream(stream, "chunk_key", "n_tokens", BUDGET, "domain")
    run_to_memory(out, "pack_parity_out", "append")
    got = {
        (r["domain"], r["key"], int(r["tokens"]), r["pack_id"], r["pack_tokens"])
        for r in spark.table("pack_parity_out").collect()
    }
    assert got == expect


def test_cross_batch_continuation(spark):
    """Packs straddle micro-batches: the open tail from batch 0
    absorbs batch 1's rows and seq numbering continues — state
    actually persists across triggers."""
    b0 = [("a", "c00", 60), ("a", "c01", 30)]  # open tail a/0 at 90
    b1 = [("a", "c02", 10), ("a", "c03", 80)]  # 10 JOINS a/0 (=100); 80 closes it, opens a/1
    d = tempfile.mkdtemp(prefix="pack_stream_cont_")
    df0 = spark.createDataFrame(b0, ["domain", "chunk_key", "n_tokens"])
    df1 = spark.createDataFrame(b1, ["domain", "chunk_key", "n_tokens"])
    df0.coalesce(1).write.mode("overwrite").parquet(f"{d}/land")
    time.sleep(1.1)  # file-source batch order is by modification time
    df1.coalesce(1).write.mode("append").parquet(f"{d}/land")

    stream = read_event_stream(spark, f"{d}/land", df0.schema, max_files_per_trigger=1)
    out = pack_chunk_stream(stream, "chunk_key", "n_tokens", BUDGET, "domain")
    run_to_memory(out, "pack_cont_out", "append")
    got = {
        tuple(r)
        for r in spark.table("pack_cont_out")
        .select("domain", "key", "tokens", "pack_id", "pack_tokens")
        .collect()
    }
    expect_closed, tails = greedy_oracle([b0, b1])
    assert got == set(expect_closed)
    # a/0 straddles the batch boundary and a/1 is still open
    assert {pid for (_, _, _, pid, _) in got} == {"a/0"}
    assert tails["a"][0] == 1 and tails["a"][1] == 80


class _FakeState:
    """Minimal GroupState stand-in for driving the packer closure."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def setTimeoutDuration(self, d):
        self.timeout_set = d


def test_idle_flush_closes_tail_and_numbering_continues():
    packer = _make_packer(BUDGET, "10 seconds")
    state = _FakeState()
    # batch: one close (a/0) + an open tail of 60
    batch = pd.DataFrame({"key": ["c0", "c1", "c2"], "tokens": [70, 50, 10]})
    out = list(packer(("a",), iter([batch]), state))
    assert len(out) == 1 and set(out[0]["pack_id"]) == {"a/0"}
    assert state.timeout_set == "10 seconds"
    assert state.get[0] == 1 and state.get[1] == 60

    # the timeout fires: the tail closes as a/1, state resets, seq advances
    state.hasTimedOut = True
    out = list(packer(("a",), iter([]), state))
    assert len(out) == 1
    assert set(out[0]["pack_id"]) == {"a/1"}
    assert list(out[0]["pack_tokens"]) == [60, 60]
    assert state.get == (2, 0, [], [])

    # a later arrival opens a/2 — ids never collide with flushed packs
    state.hasTimedOut = False
    out = list(packer(("a",), iter([pd.DataFrame({"key": ["c3"], "tokens": [5]})]), state))
    assert out == []
    assert state.get[0] == 2 and state.get[1] == 5


def test_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([("a", "k", 1)], ["domain", "chunk_key", "n_tokens"])
    with pytest.raises(ValueError):
        pack_chunk_stream(df, "chunk_key", "n_tokens", 0, "domain")
