"""URL/domain curation operators: parser robustness on hostile crawl
URLs, eTLD+1 splitting, blocklist anti-join semantics (subdomains
blocked with their domain), and the URL-shape quality rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.url_filter import (
    filter_domain_blocklist,
    filter_url_quality,
    parse_url,
    registered_domain,
    url_quality_flags,
)


def _one(spark, url):
    return spark.createDataFrame([(url,)], "url string")


@pytest.mark.parametrize(
    "url,scheme,host,path,query",
    [
        ("https://example.com/a/b?x=1", "https", "example.com", "/a/b", "x=1"),
        ("http://User:p@ss@WWW.Ex.COM:8080/p", "http", "www.ex.com", "/p", None),
        ("ftp://files.example.org", "ftp", "files.example.org", None, None),
        ("not a url at all", None, None, None, None),
        ("https://203.0.113.7/x", "https", "203.0.113.7", "/x", None),
    ],
)
def test_parse_url_fields(spark, url, scheme, host, path, query):
    row = _one(spark, url).select(parse_url("url").alias("p")).first()["p"]
    assert (row["scheme"], row["host"], row["path"], row["query"]) == (
        scheme, host, path, query,
    )


def test_parse_url_null_in_null_out(spark):
    df = spark.createDataFrame([(None,)], "url string")
    row = df.select(parse_url("url").alias("p")).first()["p"]
    assert row["host"] is None and row["scheme"] is None


@pytest.mark.parametrize(
    "host,want",
    [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("a.b.c.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("203.0.113.7", "203.0.113.7"),
        ("shop.foo.com.au", "foo.com.au"),
        (None, None),
    ],
)
def test_registered_domain(spark, host, want):
    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(registered_domain("h").alias("d")).first()["d"] == want


def test_registered_domain_extra_suffixes(spark):
    df = spark.createDataFrame([("x.y.co.il",)], "h string")
    # co.il is NOT in the built-in subset: the default split is wrong
    # for it (last two labels) — exactly what extra_suffixes fixes
    assert df.select(registered_domain("h").alias("d")).first()["d"] == "co.il"
    got = df.select(
        registered_domain("h", extra_suffixes=("co.il",)).alias("d")
    ).first()["d"]
    assert got == "y.co.il"


def test_blocklist_blocks_subdomains_and_keeps_rest(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/page"),
            (2, "https://www.EXAMPLE.com/other"),
            (3, "https://good.org/x"),
            (4, "https://sub.good.org/y"),
            (5, "garbage"),
        ],
        "doc_id int, url string",
    )
    kept = filter_domain_blocklist(df, "url", ["example.com"])
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    # unparseable rows survive only on request
    kept2 = filter_domain_blocklist(df, "url", ["example.com"], keep_unparseable=True)
    assert {r["doc_id"] for r in kept2.collect()} == {3, 4, 5}
    # DataFrame blocklist form matches the list form
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept3 = filter_domain_blocklist(df, "url", bl)
    assert {r["doc_id"] for r in kept3.collect()} == {3, 4}


def test_blocklist_is_broadcast_no_shuffle_on_corpus(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://d"), F.col("id"), F.lit(".com/p")).alias("url"),
    )
    kept = filter_domain_blocklist(df, "url", ["d1.com", "d2.com"])
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert kept.count() == 998


def test_url_quality_rules(spark):
    rows = [
        (1, "https://ok.example.com/article?x=1"),
        (2, "https://203.0.113.7/x"),  # ip host
        (3, "https://casino-winners.example.com/play"),  # badword
        (4, "https://ok.example.com/p?" + "&".join(f"u{i}=1" for i in range(20))),
        (5, "https://ok.example.com/" + "a" * 3000),  # too long
        (6, "https://12345678.co/x"),  # digit-heavy host
        (7, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    kept = filter_url_quality(df, "url")
    assert {r["doc_id"] for r in kept.collect()} == {1}
    flags = df.select("doc_id", url_quality_flags("url").alias("f")).collect()
    by_id = {r["doc_id"]: r["f"] for r in flags}
    assert by_id[2]["ip_host"] and by_id[3]["badword"]
    assert by_id[4]["query_explosion"] and by_id[5]["too_long"]
    assert by_id[6]["digit_host"] and by_id[7]["no_host"]
    # the audit struct is one expression pass: no exchange in the plan
    audit = df.select(url_quality_flags("url").alias("f"))
    assert "Exchange" not in audit._jdf.queryExecution().executedPlan().toString()


def test_blocklist_preserves_callers_dom_column(spark):
    """A pre-existing '__dom' column on the input survives the gate
    untouched (round-11 advice: the operator's temp column used to
    shadow and silently destroy it)."""
    rows = [
        (1, "https://ok.example.com/a", "mine-1"),
        (2, "https://spam.example.org/b", "mine-2"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, __dom string")
    kept = filter_domain_blocklist(df, "url", ["example.org"])
    assert kept.columns == ["doc_id", "url", "__dom"]
    got = {r["doc_id"]: r["__dom"] for r in kept.collect()}
    assert got == {1: "mine-1"}


# --- full public-suffix-list eTLD+1 -------------------------------------

# A PSL fixture with the rule STRUCTURES the official list uses —
# plain, multi-level, wildcard, and exception rules (publicsuffix.org
# list format). The expectations below are the ASCII cases of the
# canonical checkPublicSuffix test vectors (publicsuffix.org/list/,
# CC0) that involve exactly these rules.
_PSL_FIXTURE = """\
// ===BEGIN ICANN DOMAINS===
com
biz
ac
uk.com
*.mm
jp
ac.jp
kyoto.jp
ide.kyoto.jp
*.kobe.jp
!city.kobe.jp
*.ck
!www.ck
us
ak.us
k12.ak.us  // trailing comment after whitespace is ignored per spec
"""

_PSL_VECTORS = [
    (None, None),
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    (".com", None),
    (".example", None),
    (".example.com", None),
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
]


def test_psl_vectors(spark):
    """registered_domain_psl reproduces the canonical checkPublicSuffix
    expectations (ASCII vectors) over a fixture exercising plain,
    multi-level, wildcard and exception rules."""
    from open_data_pipelines_spark.operators.url_filter import (
        PSLRules,
        registered_domain_psl,
    )

    rules = PSLRules.parse(_PSL_FIXTURE)
    # deepest probe needed: the 3-label exact/exception rules
    # (ide.kyoto.jp, city.kobe.jp); wildcards probe via their 2-label
    # parent key, so *.kobe.jp adds nothing beyond 3
    assert rules.max_labels == 3
    rows = [(i, h) for i, (h, _) in enumerate(_PSL_VECTORS)]
    df = spark.createDataFrame(rows, "i int, host string")
    out = registered_domain_psl(df, "host", rules)
    assert out.columns == ["i", "host", "registered_domain"]
    got = {r["i"]: r["registered_domain"] for r in out.collect()}
    for i, (host, want) in enumerate(_PSL_VECTORS):
        assert got[i] == want, (host, got[i], want)


def test_psl_no_shuffle_and_single_broadcast(spark):
    """The probe chain is shuffle-free: no Exchange other than the
    broadcast of the (small) rule table, which Spark reuses across
    probes."""
    from open_data_pipelines_spark.operators.url_filter import (
        PSLRules,
        registered_domain_psl,
    )

    rules = PSLRules.parse(_PSL_FIXTURE)
    df = spark.range(1000).withColumn(
        "host", F.concat(F.lit("s"), F.col("id") % 37, F.lit(".example.co.test"))
    )
    plan = (
        registered_domain_psl(df, "host", rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    import re

    assert not re.search(r"Exchange (hash|range)partitioning", plan)


def test_psl_collision_safe_temp_columns(spark):
    """A caller's own __psl* columns survive."""
    from open_data_pipelines_spark.operators.url_filter import (
        PSLRules,
        registered_domain_psl,
    )

    rules = PSLRules.parse(_PSL_FIXTURE)
    df = spark.createDataFrame(
        [("example.com", "keep-me")], "host string, __psl_e1 string"
    )
    out = registered_domain_psl(df, "host", rules)
    row = out.collect()[0]
    assert row["__psl_e1"] == "keep-me"
    assert row["registered_domain"] == "example.com"


def test_blocklist_with_psl_rules(spark):
    """psl= swaps the heuristic split for the full-list algorithm:
    'x.y.ide.kyoto.jp' blocks under its PSL registrable domain
    'y.ide.kyoto.jp', which the two-level heuristic would missplit as
    'kyoto.jp'."""
    from open_data_pipelines_spark.operators.url_filter import PSLRules

    rules = PSLRules.parse(_PSL_FIXTURE)
    df = spark.createDataFrame(
        [
            (1, "https://x.y.ide.kyoto.jp/a"),
            (2, "https://z.ide.kyoto.jp/b"),
            (3, "https://ok.example.com/c"),
            (4, "https://kyoto.jp/d"),  # IS a public suffix -> NULL dom
        ],
        "doc_id int, url string",
    )
    kept = filter_domain_blocklist(df, "url", ["y.ide.kyoto.jp"], psl=rules)
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}
    kept2 = filter_domain_blocklist(
        df, "url", ["y.ide.kyoto.jp"], psl=rules, keep_unparseable=True
    )
    assert {r["doc_id"] for r in kept2.collect()} == {2, 3, 4}
    assert kept.columns == df.columns
