"""Sequence packing invariants: conservation (every row exactly
once), budget respected except oversize singletons, pack totals
consistent, determinism under repartitioning, and per-group domains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.packing import pack_chunks, packing_stats

MAX = 100


@pytest.fixture(scope="module")
def chunks(spark):
    # 300 chunks, token counts 5..95 cycling, ids 0..299; plus two
    # oversize rows that must become singletons
    base = spark.range(300).select(
        F.col("id").alias("chunk_id"), (F.col("id") % 91 + 5).alias("n_tokens")
    )
    over = spark.createDataFrame(
        [(1000, 250), (1001, 130)], "chunk_id long, n_tokens long"
    )
    return base.unionByName(over)


@pytest.fixture(scope="module")
def packed(chunks):
    df = pack_chunks(chunks, "chunk_id", "n_tokens", MAX, n_shards=8)
    df.persist()
    df.count()
    return df


def test_conservation(chunks, packed):
    assert packed.count() == chunks.count()
    assert packed.select("chunk_id").distinct().count() == chunks.count()


def test_budget_except_oversize_singletons(packed):
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("rows")
    )
    over = per_pack.filter(F.col("tot") > MAX)
    # any over-budget pack is a single oversize row
    assert over.filter(F.col("rows") > 1).count() == 0
    assert over.count() == 2


def test_pack_tokens_column_consistent(packed):
    bad = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.first("pack_tokens").alias("pt"))
        .filter(F.col("tot") != F.col("pt"))
    )
    assert bad.count() == 0


def test_deterministic_under_repartition(chunks):
    a = pack_chunks(chunks, "chunk_id", "n_tokens", MAX, n_shards=8)
    b = pack_chunks(chunks.repartition(13), "chunk_id", "n_tokens", MAX, n_shards=8)
    ka = sorted(map(tuple, a.select("chunk_id", "pack_id").collect()))
    kb = sorted(map(tuple, b.select("chunk_id", "pack_id").collect()))
    assert ka == kb


def test_group_col_domains(chunks):
    grouped = chunks.withColumn("doc", (F.col("chunk_id") % 10).cast("string"))
    packed = pack_chunks(grouped, "chunk_id", "n_tokens", MAX, group_col="doc")
    # a pack never crosses its packing domain
    crossing = (
        packed.groupBy("pack_id").agg(F.countDistinct("doc").alias("d")).filter(F.col("d") > 1)
    )
    assert crossing.count() == 0


def test_stats_and_utilization(packed):
    row = packing_stats(packed, MAX).collect()[0]
    assert row["n_rows"] == 302
    assert row["n_oversize"] == 2
    # greedy packing of 5..95-token chunks into 100 should beat 60%
    assert row["utilization"] > 0.6


def test_rejects_bad_budget(chunks):
    with pytest.raises(ValueError):
        pack_chunks(chunks, "chunk_id", "n_tokens", 0)
