"""Corpus build manifests (engine extension): the reproducibility
record a training-data release ships with — what was built, from what
configuration, through which funnel counts, with a content signature
two builds can be compared by WITHOUT re-reading either corpus.

The signature is one aggregation: ``bit_xor`` of a per-row
``xxhash64`` over the sorted column set. XOR is order- and
partitioning-insensitive and cannot overflow, so the same logical
output yields the same signature on any cluster layout — the same
determinism posture as :mod:`..operators.sampling`. (XOR cancels
PAIRS of identical rows; corpus outputs are deduplicated by
construction, and the row count is recorded alongside, which breaks
the remaining ties.)
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_signature(df: DataFrame) -> dict[str, Any]:
    """{rows, xor_sig, schema} — one action, order-insensitive.

    Nulls are encoded explicitly per column: Spark's ``xxhash64``
    passes the seed through untouched for null inputs, so without the
    sentinel a value MIGRATING between columns (null in one, present
    in the other) would leave the hash unchanged and two different
    corpora would sign identically."""
    cols = sorted(df.columns)
    h = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(f"\x00null:{c}"))
            for c in cols
        ]
    )
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(h).alias("sig"),
    ).first()
    return {
        "rows": int(row["rows"]),
        "xor_sig": int(row["sig"]) if row["sig"] is not None else 0,
        "schema": {c: df.schema[c].dataType.simpleString() for c in cols},
    }


def write_corpus_manifest(
    path: str,
    output: DataFrame,
    config: dict[str, Any] | None = None,
    stats: dict[str, int] | None = None,
    extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Assemble and write the manifest JSON; returns the dict.

    ``config`` is the prepare_corpus kwargs used (JSON-serializable
    values only); ``stats`` the funnel's with_stats counts. ``extra``
    merges additional top-level evidence keys (e.g. the ``retractions``
    history :func:`..operators.retraction.retract_and_reissue`
    appends) — it may not shadow the three core keys. The manifest
    carries no timestamps — two identical builds produce
    byte-identical manifests, which is the point.
    """
    manifest = {
        "signature": corpus_signature(output),
        "config": config or {},
        "funnel_stats": stats or {},
    }
    if extra:
        overlap = set(extra) & set(manifest)
        if overlap:
            raise ValueError(f"extra keys shadow manifest core keys: {sorted(overlap)}")
        manifest.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def manifests_equal(a: dict[str, Any], b: dict[str, Any]) -> bool:
    """Two builds are the same release iff signatures match (rows,
    xor, schema) — config may legitimately differ in non-semantic ways
    (e.g. stats_via)."""
    return a["signature"] == b["signature"]
