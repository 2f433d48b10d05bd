from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.similarity import (
    as_double_array,
    cosine,
    cosine_pandas_udf,
)
from tests.conftest import SF_SMOKE


def test_pandas_udf_cosine_matches_expression(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(200)

    udf_cos = cosine_pandas_udf()
    out = pairs.select(
        "ia",
        "ib",
        cosine(as_double_array("va"), as_double_array("vb")).alias("expr_cos"),
        udf_cos(as_double_array("va"), as_double_array("vb")).alias("udf_cos"),
    ).collect()
    assert len(out) == 200
    for r in out:
        # einsum accumulation order differs from the sequential fold —
        # equal to float tolerance, not bitwise
        assert abs(r["expr_cos"] - r["udf_cos"]) < 1e-12
