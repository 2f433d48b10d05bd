"""The reference instantiates the wellbeing DAG twice — emergency
(``emergency_wellbeing.sql``) and major (``major_wellbeing.sql``) — and
the twins differ only by the work-category predicate
(``stg_major_works_by_authority.sql:53`` ``work_category_ref = 'major'``
vs the emergency IN-list). These tests pin the parameterized twin:
both scopes materialize, are disjoint in their input permits, and the
unioned overview matches the per-scope runs row for row."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

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


def test_overview_is_union_of_scopes(spark):
    from open_data_pipelines_spark.plans.wellbeing import (
        SCOPE_CATEGORIES,
        wellbeing_impact,
        wellbeing_overview,
    )

    overview = wellbeing_overview(spark, SF_SMOKE).toPandas()
    assert set(overview["scope"]) == set(SCOPE_CATEGORIES)
    for scope in SCOPE_CATEGORIES:
        solo = wellbeing_impact(spark, SF_SMOKE, scope=scope).toPandas()
        part = overview[overview["scope"] == scope].drop(columns=["scope"])
        assert _canon(solo) == _canon(part)


def test_major_branch_matches_oracle(spark, oracle_con):
    from open_data_pipelines_spark.plans.wellbeing import (
        MAJOR_WELLBEING_ORACLE_SQL,
        major_wellbeing_impact,
    )

    sdf = major_wellbeing_impact(spark, SF_SMOKE).toPandas()
    odf = oracle_con.execute(MAJOR_WELLBEING_ORACLE_SQL).fetchdf()
    assert len(sdf) == len(odf) > 0
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _canon(sdf) == _canon(odf)


def test_scopes_partition_the_priority_space(spark):
    """Emergency and major categories are disjoint, so a permit feeds at
    most one wellbeing table — mirrors the reference where a work is
    either immediate_* or major, never both."""
    from open_data_pipelines_spark.plans.wellbeing import SCOPE_CATEGORIES

    cats = [set(v) for v in SCOPE_CATEGORIES.values()]
    for i, a in enumerate(cats):
        for b in cats[i + 1 :]:
            assert not (a & b)
