"""corpus_diff vs a DuckDB FULL OUTER JOIN mirror + semantics pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.corpus_diff import (
    corpus_diff,
    corpus_diff_summary,
)
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE

# the shared normalization SQL the funnel oracle uses for fingerprints
from open_data_pipelines_spark.queries.text import _N  # noqa: E402


@pytest.fixture(scope="module")
def versions(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    old = docs.filter(F.col("doc_id") < 400)
    new = (
        docs.filter(F.col("doc_id") >= 100)  # 0-99 removed
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" EDITED"))
            ).when(
                # cosmetic-only edit: must NOT count as modified
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit("   "), F.upper(F.col("text"))),
            ).otherwise(F.col("text")),
        )
    )
    return old, new


def test_matches_duckdb(spark, versions):
    old, new = versions
    got = sorted(
        (r.doc_id, r.status, r.old_fingerprint, r.new_fingerprint)
        for r in corpus_diff(old, new).collect()
    )
    con = duckdb.connect()
    con.register("old_v", old.toPandas())
    con.register("new_v", new.toPandas())
    fp = "md5(" + _N + ")"
    want = sorted(
        map(
            tuple,
            con.execute(f"""
        WITH o AS (SELECT doc_id, {fp} AS ofp FROM old_v),
             n AS (SELECT doc_id, {fp} AS nfp FROM new_v)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN ofp IS NOT DISTINCT FROM nfp THEN 'unchanged'
                    ELSE 'modified' END AS status,
               ofp, nfp
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """).fetchall(),
        )
    )
    assert got == want


def test_statuses_and_cosmetic_invariance(spark, versions):
    old, new = versions
    summary = {r.status: r.n_docs for r in corpus_diff_summary(old, new).collect()}
    assert summary["removed"] == 100  # ids 0-99
    assert summary["added"] == 100  # ids 400-499
    # %7 edits within the overlap 100-399 are real; %11 edits are
    # cosmetic (upper/whitespace) and the normalized fingerprint
    # ignores them
    overlap = range(100, 400)
    assert summary["modified"] == sum(1 for i in overlap if i % 7 == 0)
    assert summary["modified"] + summary["unchanged"] == 300
    per_doc = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert per_doc[110] == "unchanged"  # %11: cosmetic only
    assert per_doc[105] == "modified"  # %7


def test_null_id_raises(spark):
    bad = spark.createDataFrame([(None, "x")], "doc_id int, text string")
    ok = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(Exception, match="NULL document id"):
        corpus_diff(bad, ok).collect()


def test_diff_drives_retraction(spark, versions):
    """Composition: the removed set from a release diff is exactly a
    tombstone frame — retracting it from the OLD corpus yields the
    id set both versions share (the takedown workflow: diff the
    upstream drop, retract what disappeared)."""
    from open_data_pipelines_spark.operators.retraction import retract_documents

    old, new = versions
    removed = (
        corpus_diff(old, new)
        .filter(F.col("status") == "removed")
        .select("doc_id")
    )
    kept = retract_documents(old, removed)
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    want = {r.doc_id for r in old.collect()} & {r.doc_id for r in new.collect()}
    assert got == want


def test_null_text_and_dup_semantics(spark):
    from open_data_pipelines_spark.operators.corpus_diff import corpus_diff_summary

    old = spark.createDataFrame(
        [(1, None), (2, "same"), (3, None), (5, "dup"), (5, "dup")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, "now has text"), (2, "same"), (5, "dup")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # presence from markers: NULL-text docs classify correctly
    assert got == {1: "modified", 2: "unchanged", 3: "removed", 5: "unchanged"}

    # summary path must ALSO hit the NULL-key guard (the round-12
    # review showed a prunable guard letting it count NULL rows)
    bad = spark.createDataFrame([(None, "x")], "doc_id int, text string")
    ok = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(Exception, match="NULL document id"):
        corpus_diff_summary(bad, ok).collect()

    # conflicting duplicate ids raise; agreeing ones collapsed above
    conflict = spark.createDataFrame(
        [(7, "version a"), (7, "version b")], "doc_id int, text string"
    )
    with pytest.raises(Exception, match="CONFLICTING"):
        corpus_diff(conflict, ok).collect()

    # NULL-text + real-text under one id is also a conflict
    # (count_distinct ignores NULLs — pinned)
    half_null = spark.createDataFrame(
        [(8, None), (8, "real")], "doc_id int, text string"
    )
    with pytest.raises(Exception, match="CONFLICTING"):
        corpus_diff(half_null, ok).collect()
    # all-NULL duplicates agree (collapse, no raise)
    all_null = spark.createDataFrame(
        [(9, None), (9, None)], "doc_id int, text string"
    )
    got9 = {r.doc_id: r.status for r in corpus_diff(all_null, ok).collect()}
    assert got9[9] == "removed"
