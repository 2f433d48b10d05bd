"""In-pytest oracle parity gate: a representative sample of queries is
checked against DuckDB at sf0.001 so `pytest` alone catches semantic
drift (the full gate is tools/check_oracle.py across all SFs)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

SAMPLE = [
    "group_sum",
    "impact_score",
    "scd2_merge",
    "minhash_lsh_dedup",
    "ann_cosine_topk",
    "session_agg",
    "record_hash",
    "column_profile",
    "corpus_funnel",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return sorted(map(tuple, df.itertuples(index=False)), key=repr)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, oracle_con, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_SMOKE).toPandas()
    odf = oracle_con.execute(e.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _canon(sdf) == _canon(odf)
