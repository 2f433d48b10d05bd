"""Exactly-once under task retry / speculative double-publish
(VERDICT r14 #4): the WebDataset sink publishes each shard by atomic
move (local) or atomic-at-close stream (object store) and the
manifest last — correct ORDERING, but until round 15 nothing
exercised a task attempt RETRY or a zombie attempt racing the same
shard index. These tests inject both through the sink's
``fault_injector`` seam in a subprocess JVM whose master allows task
retries (``local[4, 3]`` — plain local fails the job on the first
task failure, which is why the shared session can't run them).

What a double-publish bug would look like, and how these fail on it:
the zombie attempt publishes shard S, dies; the winner republishes S.
If shard assignment or in-shard order were nondeterministic (e.g. an
unsorted repartition), the manifest's bytes/sha256 (recorded by the
winning attempt's stream) would disagree with the file the zombie
left — ``all_sha_match`` fails. If orphaned tmp names were
reader-visible, ``visible_extras`` fails. If a retry dropped or
duplicated samples, ``roundtrip_exact`` fails (the reader takes its
shard list from the manifest only).

``index_retry`` pins the same discipline for parquet generations
(`operators/index_commit.py`): a write task inside ``write_fn`` dies
once; the committed generation must read back exactly, with one
generation directory and the _SUCCESS marker the publish gate
requires.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "wds_retry_worker.py")


def _run(mode: str, tmp_path) -> dict:
    out_json = str(tmp_path / "result.json")
    work = str(tmp_path / "work")
    os.makedirs(work, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, WORKER, mode, out_json, work],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"worker failed:\n{proc.stdout}\n{proc.stderr}"
    with open(out_json) as fh:
        return json.load(fh)


@pytest.mark.parametrize("mode", ["local_before", "local_after", "remote_after"])
def test_wds_exactly_once_under_retry(mode, tmp_path):
    r = _run(mode, tmp_path)
    assert r["injector_fired"], "injection never reached — vacuous run"
    assert r["n_samples"] == 200
    assert r["n_read"] == 200
    assert r["roundtrip_exact"]
    assert r["all_bytes_match"] and r["all_sha_match"], r["shard_checks"]
    assert r["visible_extras"] == []


def test_index_commit_exactly_once_under_retry(tmp_path):
    r = _run("index_retry", tmp_path)
    assert r["injector_fired"], "injection never reached — vacuous run"
    assert r["roundtrip_exact"] and r["n_read"] == 200
    assert r["one_generation"]
    assert r["success_marker"]
