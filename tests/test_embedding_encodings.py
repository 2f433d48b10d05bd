"""Testdata embedding-encoding robustness (the ts-encoding lesson,
applied forward: round 4 lost 6 driver rows to a harness re-encoding
of events.ts — pin the other plausible re-encoding target too).

The harness stores ``embeddings.embedding`` as ``list<float32>``
today. A regeneration could plausibly switch to ``list<float64>`` (or
back). Every ANN operator funnels vectors through
``as_double_array`` / ``quantize``, so top-k results must be
IDENTICAL across encodings — float32 -> double is exact widening, and
quantization rounds both to the same ints."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.similarity import brute_force_topk

_VALS = [
    [0.1, -0.25, 0.5, 0.125],
    [0.9, 0.75, -0.5, 0.0625],
    [0.1, -0.25, 0.5, 0.126],
    [-0.3, 0.5, 0.25, -0.75],
    [0.11, -0.24, 0.52, 0.13],
]


def _write(tmp_path_factory, param: str) -> str:
    typ = pa.list_(pa.float32() if param == "float32" else pa.float64())
    d = tmp_path_factory.mktemp(f"emb_{param}")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(_VALS)), pa.int64()),
            "embedding": pa.array(_VALS, typ),
        }
    )
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d / "embeddings.parquet")


def _topk(spark, path):
    emb = spark.read.parquet(path)
    q = emb.filter(F.col("vec_id") < 2)
    return sorted(
        map(tuple, brute_force_topk(emb, q, "embedding", "vec_id", k=3).collect())
    )


def test_topk_identical_across_encodings(spark, tmp_path_factory):
    # ONE test computes both encodings and compares directly — the old
    # parametrized version stashed results in a module global and only
    # compared `if len(_results) == 2`, so under -k selection, --lf,
    # or xdist the comparison silently never ran (round-9 test-review
    # find)
    r32 = _topk(spark, _write(tmp_path_factory, "float32"))
    r64 = _topk(spark, _write(tmp_path_factory, "float64"))
    assert r32 == r64
    assert len(r32) > 0


def test_live_testdata_embedding_readable(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    el = emb.schema["embedding"].dataType.elementType.simpleString()
    assert el in ("float", "double"), el
    assert brute_force_topk(
        emb.limit(50), emb.filter(F.col("vec_id") < 2), "embedding", "vec_id", k=3
    ).count() > 0
