"""HTML -> text extraction: parity with a REAL parser (Python stdlib
html.parser) on the documented contract — visible text with block-tag
boundaries — modulo whitespace, over hand-written tricky fixtures and
a deterministic generator. Plus the degrade-don't-throw envelope."""

from __future__ import annotations

import random
from html.parser import HTMLParser

from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.html_text import (
    _LINE_TAGS,
    _PARA_TAGS,
    _DROP_BLOCKS,
    extract_title,
    html_to_text,
)


class _Oracle(HTMLParser):
    """Visible text per the operator contract: data outside the
    non-content subtrees, a boundary at every block tag edge."""

    def __init__(self):
        # convert_charrefs decodes entities in data, like the operator
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        self.depth = 0  # inside a drop-block subtree

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_BLOCKS:
            self.depth += 1
        elif tag in _PARA_TAGS + _LINE_TAGS and self.depth == 0:
            self.pieces.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_BLOCKS:
            self.depth = max(0, self.depth - 1)
        elif tag in _PARA_TAGS + _LINE_TAGS and self.depth == 0:
            # real-parser behavior: closing tags bound too (the
            # operator's sentinel scheme matches since round 12)
            self.pieces.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _PARA_TAGS + _LINE_TAGS and self.depth == 0:
            self.pieces.append("\n")

    def handle_data(self, data):
        if self.depth == 0:
            self.pieces.append(data)


def _oracle_tokens(html: str) -> list[str]:
    p = _Oracle()
    p.feed(html)
    p.close()
    return "".join(p.pieces).split()


FIXTURES = [
    "<html><head><title>T</title><style>p{color:red}</style></head>"
    "<body><p>Hello <b>wor</b>ld</p><p>Second &amp; third</p></body></html>",
    "<div>a</div><div>b</div>",  # block boundary must separate a/b
    "<p>keep</p><script>var x = '<div>not text</div>';</script><p>tail</p>",
    "<!-- <p>commented out</p> --><p>real</p>",
    "<P>UPPER</P><BR><LI>item</LI>",
    "<ul><li>one</li><li>two</li></ul>",
    "before<noscript><p>fallback</p></noscript>after",
    "text &lt;tag&gt; &quot;quoted&quot; &#39;apos&#39; a&nbsp;b &amp;",
    "no markup at all, just text.",
    "<span>in</span><span>line</span> tags vanish",
    "<table><tr><td>c1</td><td>c2</td></tr></table>",
    "<pre>  spaced   text  </pre>done",
    "<svg><circle r='1'/><text>vector label</text></svg>visible",
    "<article>one<section>two</section>three</article>",
]


def _gen(rnd: random.Random) -> str:
    words = lambda: " ".join(  # noqa: E731
        f"w{rnd.randint(0, 99)}" for _ in range(rnd.randint(1, 6))
    )
    parts = ["<html><body>"]
    for _ in range(rnd.randint(3, 10)):
        kind = rnd.random()
        if kind < 0.15:
            tag = rnd.choice(_DROP_BLOCKS[:3])
            parts.append(f"<{tag}>{words()}</{tag}>")
        elif kind < 0.5:
            tag = rnd.choice(("p", "div", "li", "h2", "blockquote"))
            inner = words()
            if rnd.random() < 0.4:
                inner += f" <b>{words()}</b> <i>{words()}</i>"
            parts.append(f"<{tag}>{inner}</{tag}>")
        elif kind < 0.6:
            # list with raw newlines between items and OPTIONAL stray
            # text after a closer — the round-12 sentinel edge cases
            items = "\n".join(f"<li>{words()}</li>" for _ in range(rnd.randint(1, 3)))
            stray = words() if rnd.random() < 0.5 else ""
            parts.append(f"<ul>\n{items}\n</ul>{stray}")
        elif kind < 0.7:
            parts.append(f"<!-- {words()} -->")
        elif kind < 0.8:
            parts.append(f"{words()} &amp; {words()}")
        else:
            parts.append(words())
        # random inter-part whitespace (real markup is newline-ridden)
        if rnd.random() < 0.5:
            parts.append(rnd.choice(["\n", "\n\n", "  ", "\t"]))
    parts.append("</body></html>")
    return "".join(parts)


def test_matches_stdlib_parser_on_fixtures_and_generated(spark):
    rnd = random.Random(12)
    docs = FIXTURES + [_gen(rnd) for _ in range(60)]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(docs)], "i int, html string"
    )
    got = {
        r["i"]: (r["t"] or "").split()
        for r in df.select("i", html_to_text("html").alias("t")).collect()
    }
    for i, h in enumerate(docs):
        assert got[i] == _oracle_tokens(h), h


def test_block_boundaries_and_inline_merge(spark):
    df = spark.createDataFrame(
        [("<div>a</div><div>b</div>",), ("<b>bo</b>ld",)], "html string"
    )
    out = [r["t"] for r in df.select(html_to_text("html").alias("t")).collect()]
    assert out[0] == "a\n\nb"  # paragraph boundary survives as a BLANK line
    assert out[1] == "bold"  # inline tags vanish without a boundary


def test_null_and_hostile_degrade_not_throw(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "<p>unclosed"),
        (4, "<a title=\"a>b\">x</a>"),  # '>' in attribute: residue, no error
        (5, "<<<>>>"),
        (6, "<script>never closed"),
    ]
    df = spark.createDataFrame(rows, "i int, html string")
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text("html").alias("t")).collect()}
    assert got[1] is None
    assert got[2] == ""
    assert got[3] == "unclosed"
    assert "x" in got[4]  # documented residue envelope: extra text, never a throw
    assert got[6] is not None


def test_extract_title(spark):
    rows = [
        (1, "<html><head><title> A &amp; B </title></head><body>x</body></html>"),
        (2, "<TITLE>upper</TITLE>"),
        (3, "<p>no title</p>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "i int, html string")
    got = {r["i"]: r["t"] for r in df.select("i", extract_title("html").alias("t")).collect()}
    assert got[1] == "A & B"
    assert got[2] == "upper"
    assert got[3] is None and got[4] is None


def test_funnel_html_stage(spark):
    """prepare_corpus(html=True) on HTML-wrapped docs produces the
    same chunks as the pre-extracted text run — and the banner line
    (a <div> of its own) is strippable by the boilerplate stage
    because block tags became newlines."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    base = [
        (i, " ".join(f"doc{i} token {j} words here now." for j in range(30)))
        for i in range(8)
    ]
    plain = spark.createDataFrame(base, "doc_id long, text string").select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("web").alias("source"),
        F.length("text").alias("n_chars"),
    )
    wrapped = plain.withColumn(
        "text",
        F.concat(
            F.lit("<html><head><title>t</title><style>p{}</style></head><body>"
                  "<div>Accept Cookies</div><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
    )
    kw = dict(
        near_dup="none", quality_min=0.0, keep_langs=("en", "und"),
        boilerplate_min_docs=3, chunk_size=16, overlap=0,
    )
    want = prepare_corpus(spark, SF_SMOKE, docs=plain.withColumn(
        "text", F.concat(F.lit("Accept Cookies\n"), F.col("text"))
    ), **kw).collect()
    got = prepare_corpus(spark, SF_SMOKE, docs=wrapped, html=True, **kw).collect()
    canon = lambda rows: sorted((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in rows)  # noqa: E731
    assert canon(got) == canon(want)
    assert got  # non-empty


def test_paragraph_stage_sees_html_blocks(spark):
    """Regression (round-12 review): <p>/<div> boundaries must open
    BLANK lines, or prepare_corpus(html=True, paragraph_policy=...)
    silently degrades CCNet paragraph dedup to whole-document
    granularity (one paragraph per doc)."""
    from open_data_pipelines_spark.operators.paragraph_dedup import split_paragraphs

    df = spark.createDataFrame(
        [(1, "<p>alpha one</p><p>beta two</p><div>gamma three</div>"),
         (2, "<ul><li>a</li><li>b</li></ul><p>tail</p>")],
        "doc_id int, html string",
    )
    txt = df.select("doc_id", html_to_text("html").alias("text"))
    paras = split_paragraphs(txt, "text", "doc_id")
    by_doc = {}
    for r in paras.collect():
        by_doc.setdefault(r.doc_id, []).append(r[2])
    assert by_doc[1] == ["alpha one", "beta two", "gamma three"]
    # the list is ONE paragraph (li = line tags), tail is another
    assert by_doc[2] == ["a\nb", "tail"]


def test_full_combo_html_boilerplate_paragraph(spark):
    """The round-12 review's composition gap: html=True +
    boilerplate_min_docs + paragraph_policy must still dedup at
    PARAGRAPH granularity — the boilerplate strip may not destroy the
    blank-line boundaries extraction opened."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    shared = "this shared paragraph repeats across several pages here"
    rows = []
    for i in range(6):
        own = " ".join(f"doc{i} body token {j} flows onward" for j in range(12))
        # shared paragraph in 4 of 6 docs: UNDER the boilerplate
        # min_docs=6 line cut (so it must reach the paragraph stage)
        # but repeated enough that keep_first has work to do
        mid = f"<p>{shared}</p>" if i < 4 else ""
        rows.append((
            i,
            f"<div>Accept Cookies</div>{mid}<p>{own}</p>",
        ))
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("web").alias("source"), F.length("text").alias("n_chars"),
    )
    out = prepare_corpus(
        spark, SF_SMOKE, docs=docs, html=True, boilerplate_min_docs=6,
        paragraph_policy="keep_first", near_dup="none", quality_min=0.0,
        keep_langs=("en", "und"), chunk_size=64, overlap=0,
    )
    joined = {
        r.doc_id: r.chunk
        for r in out.groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("chunk")).alias("chunk"))
        .collect()
    }
    # the banner line dies at the boilerplate stage; the shared
    # PARAGRAPH survives in exactly one doc (keep_first), not all six
    n_with_shared = sum(1 for t in joined.values() if "shared paragraph" in t)
    assert n_with_shared == 1, joined
    assert all("accept cookies" not in t for t in joined.values())
    # every doc keeps its own body
    for i in range(6):
        assert f"doc{i} body" in joined.get(i, ""), i


def test_closing_line_tag_bounds_and_newline_between_items(spark):
    """round-12 review: '</li>stray' must not fuse words; and a raw
    newline between list items must NOT fabricate a blank line (which
    would split the list mid-paragraph)."""
    df = spark.createDataFrame(
        [
            (1, "<li>version 2</li>released"),
            (2, "<ul>\n  <li>a</li>\n  <li>b</li>\n</ul>\n<p>tail</p>"),
            (3, "pre\x02mid\x03post"),  # hostile sentinel bytes: stripped
        ],
        "i int, html string",
    )
    got = {r.i: r.t for r in df.select("i", html_to_text("html").alias("t")).collect()}
    assert got[1] == "version 2\nreleased"
    assert got[2] == "a\nb\n\ntail"
    assert got[3] == "premidpost"
