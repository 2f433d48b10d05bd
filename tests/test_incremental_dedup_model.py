"""Model-based randomized test of the seen-index log protocol.

Interleaves the protocol's events — admission (fixed and auto batch
ids), batch replay, compaction, crash-before-publish strays, and the
crash-after-publish overlap window — under a deterministic seed
against a driver-side model that tracks the exact text set each live
segment directory holds. After every event:

- probing the full text universe returns exactly
  ``universe - union(segments)`` (membership is never lost to a
  crash artifact and never invented by one);
- the distinct signature count equals the model union;
- every admission returns exactly the model-predicted fresh set —
  including the documented replay contract: a replayed batch id is
  deduped against every segment EXCEPT its own directory, and its
  directory is overwritten to the new fresh set.

Exercises combinations the single-scenario tests don't reach, the
same way tests/test_index_commit.py does for the manifest commit.
"""

from __future__ import annotations

import random
import shutil

import pytest

from open_data_pipelines_spark.operators.incremental_dedup import (
    committed_log_dirs,
    compact_seen_index,
    content_signature,
    dedup_against_index,
    read_seen_index,
)

UNIVERSE = [f"text {chr(97 + i)}" for i in range(14)]


def _frame(spark, texts, start_id):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _seg_names(spark, idx) -> set[str]:
    return {d.rsplit("/", 1)[1] for d in committed_log_dirs(spark, str(idx))}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_log_protocol_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    idx = tmp_path / f"seen-{seed}"
    live: dict[str, set[str]] = {}  # segment dir name -> texts it holds
    fixed_ids: list[int] = []
    next_doc = 0

    def union(exclude: str | None = None) -> set[str]:
        return set().union(*(v for k, v in live.items() if k != exclude), set())

    def admit(batch_id, texts):
        nonlocal next_doc
        frame = _frame(spark, texts, next_doc)
        next_doc += len(texts)
        before = _seg_names(spark, idx)
        fresh = dedup_against_index(
            spark, frame, str(idx), content_signature("text"), "doc_id", batch_id=batch_id
        )
        got = {r["text"] for r in fresh.collect()}
        after = _seg_names(spark, idx)
        new_dirs = after - before
        if batch_id is not None:
            dir_name = f"batch={batch_id}"
        else:
            assert len(new_dirs) == 1, (before, after)
            dir_name = next(iter(new_dirs))
        return got, dir_name

    for step in range(14):
        ev = rng.choice(["admit", "admit_auto", "replay", "compact", "stray", "overlap"])
        if ev == "admit":
            batch_id = 100 + step
            texts = rng.sample(UNIVERSE, rng.randint(1, 4))
            expected = set(texts) - union()
            got, dir_name = admit(batch_id, texts)
            assert got == expected, (seed, step, ev)
            live[dir_name] = expected
            fixed_ids.append(batch_id)
        elif ev == "admit_auto":
            texts = rng.sample(UNIVERSE, rng.randint(1, 3))
            expected = set(texts) - union()
            got, dir_name = admit(None, texts)
            assert got == expected, (seed, step, ev)
            live[dir_name] = expected
        elif ev == "replay" and fixed_ids:
            batch_id = rng.choice(fixed_ids)
            dir_name = f"batch={batch_id}"
            texts = rng.sample(UNIVERSE, rng.randint(1, 4))
            # own directory excluded from the probe; the overwrite
            # makes the directory hold exactly the new fresh set (a
            # text only THIS directory held, not in the new frame,
            # drops out of membership — the documented contract)
            expected = set(texts) - union(exclude=dir_name)
            got, _ = admit(batch_id, texts)
            assert got == expected, (seed, step, ev)
            if dir_name in live or expected:
                live[dir_name] = expected
        elif ev == "compact":
            n = compact_seen_index(spark, str(idx))
            assert n == len(union()), (seed, step, ev)
            live = {name: union() for name in _seg_names(spark, idx)} if n else {}
            assert len(live) <= 1
        elif ev == "stray":
            stray = idx / "base-77777777.tmp"
            if not stray.exists():
                stray.mkdir(parents=True)
                (stray / "_SUCCESS").touch()
        elif ev == "overlap" and live:
            # crash after publish, before deletes: duplicate a random
            # committed segment under a fake batch name — duplicate
            # membership, never new membership
            name = rng.choice(sorted(live))
            dst = idx / f"batch={900 + step}"
            if not dst.exists() and (idx / name).exists():
                shutil.copytree(idx / name, dst)
                live[f"batch={900 + step}"] = set(live[name])

        member = union()
        probe = dedup_against_index(
            spark,
            _frame(spark, UNIVERSE, 10_000 + step * 100),
            str(idx),
            content_signature("text"),
            "doc_id",
            update=False,
        )
        assert {r["text"] for r in probe.collect()} == set(UNIVERSE) - member, (
            seed, step, ev,
        )
        assert read_seen_index(spark, str(idx)).distinct().count() == len(member), (
            seed, step, ev,
        )
