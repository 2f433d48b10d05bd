"""The bench regression guard's reference file must stay in lockstep
with the headline set (mechanical check — running the full bench is
the driver's job)."""

from __future__ import annotations

import json
from pathlib import Path

import bench

REF = Path(__file__).resolve().parent.parent / "bench_reference.json"


def test_reference_covers_headline_set():
    ref = json.loads(REF.read_text())
    assert set(bench.HEADLINE) <= set(ref["queries"]), (
        "bench_reference.json missing headline queries: "
        f"{set(bench.HEADLINE) - set(ref['queries'])}"
    )
    assert ref["sf"] == 0.1
    assert 1.0 < ref["ratio_limit"] <= 2.0
    assert all(v > 0 for v in ref["queries"].values())
