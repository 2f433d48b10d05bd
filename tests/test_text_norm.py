"""Unicode normalization + mojibake repair (operators/text_norm).

The mojibake oracle is the byte-level ground truth: corrupt known-good
text exactly the way the wild does (UTF-8 bytes decoded as
sloppy-cp1252, undefined bytes falling back to latin-1 controls) and
require the pure-expression repair to invert it. NFC is additionally
pinned ENGINE-vs-ENGINE against DuckDB's nfc_normalize.
"""

from __future__ import annotations

import random
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_norm import (
    _CP1252_BYTES,
    _CP1252_CHARS,
    fix_mojibake,
    normalize_unicode,
    with_normalized_text,
)

_SLOPPY_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def mojibake(s: str) -> str:
    """UTF-8 bytes read as sloppy-cp1252 (the wild corruption)."""
    out = []
    for b in s.encode("utf-8"):
        if b in _SLOPPY_UNDEFINED:
            out.append(chr(b))
        else:
            out.append(bytes([b]).decode("cp1252"))
    return "".join(out)


CLEAN = [
    "Café – naïve",
    "日本語テキスト",
    "emoji 🎉 done",
    "“quoted” — em",
    "mixed Ω ™ € fin",
    "żółć ĄĆĘŁŃÓŚŹŻ",
    "हिन्दी پاکستان עברית",
]

UNTOUCHED = [
    "plain ascii",
    "naïve café (clean latin-1, no valid UTF-8 image)",
    "badé",  # lone lead byte at end of string
    "Ã",  # lead with no continuation
    "\xc0\xaf",  # overlong encoding of '/'
    "\xed\xa0\x80",  # surrogate range
    "\xf5\x80\x80\x80",  # > U+10FFFF lead
    # clean text CONTAINING cp1252 specials next to non-latin-1 chars:
    # the pre-translate must not leak onto the no-repair path
    "mixed Ω ™ € fin",
    "em — dash only",
    "",
]


def test_translate_tables_aligned():
    assert len(_CP1252_CHARS) == len(_CP1252_BYTES) == 27
    for ch, by in zip(_CP1252_CHARS, _CP1252_BYTES):
        # each pair is (cp1252 decode of byte, the byte's latin-1 char)
        assert bytes([ord(by)]).decode("cp1252") == ch


def test_mojibake_round_trip(spark):
    rows = [(mojibake(s),) for s in CLEAN]
    out = spark.createDataFrame(rows, ["s"]).select(fix_mojibake("s").alias("f"))
    assert [r.f for r in out.collect()] == CLEAN


def test_clean_text_untouched(spark):
    rows = [(s,) for s in UNTOUCHED] + [(None,)]
    out = spark.createDataFrame(rows, "s string").select(fix_mojibake("s").alias("f"))
    assert [r.f for r in out.collect()] == UNTOUCHED + [None]


def test_hostile_fuzz_never_throws(spark):
    """Random latin-1-range strings: the strict-UTF-8 guard must make
    Spark 4's throwing decode unreachable, and wherever the repair
    fires it must agree with Python's own bytes round-trip."""
    rng = random.Random(1252)
    rows = []
    for _ in range(500):
        n = rng.randrange(0, 24)
        rows.append(("".join(chr(rng.randrange(1, 256)) for _ in range(n)),))
    got = (
        spark.createDataFrame(rows, "s string")
        .select("s", fix_mojibake("s").alias("f"))
        .collect()
    )
    for r in got:
        raw = r.s.encode("latin-1", errors="strict")
        try:
            expect = raw.decode("utf-8")
            if not any(c >= "\xc2" for c in r.s):
                expect = r.s  # no lead byte -> identity by design
        except UnicodeDecodeError:
            expect = r.s
        assert r.f == expect, (r.s, r.f, expect)


def test_double_mojibake_peels_one_layer(spark):
    twice = mojibake(mojibake("Café"))
    out = spark.createDataFrame([(twice,)], ["s"]).select(
        fix_mojibake(fix_mojibake("s")).alias("f")
    )
    assert out.collect()[0].f == "Café"


@pytest.mark.parametrize("form", ["NFC", "NFKC", "NFD", "NFKD"])
def test_normalize_matches_unicodedata(spark, form):
    samples = [
        "Café decomposed",  # e + combining acute
        "é composed",
        "ﬁle ﬂow ℕ ﬀ",  # ligatures / letterlike (NFKC-sensitive)
        "１２３ ｆｕｌｌｗｉｄｔｈ",
        "ascii only",
        "ẛ̣",  # long s with dots, classic reorder case
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.o for r in normalize_unicode(df, "s", form, out_col="o").collect()]
    want = [None if s is None else unicodedata.normalize(form, s) for s in samples]
    assert got == want


def test_nfc_matches_duckdb(spark):
    samples = CLEAN + ["Café", "Å rings", "ẛ̣"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.o for r in normalize_unicode(df, "s", "NFC", out_col="o").collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0] for s in samples
    ]
    assert got == want


def test_with_normalized_text_order(spark):
    # mojibake'd DECOMPOSED text: repair must run before NFC or the
    # byte structure the repair keys on is gone
    src = mojibake("Café fin")
    df = spark.createDataFrame([(src,)], ["text"])
    out = with_normalized_text(df, "text", fix_encoding=True, form="NFC")
    assert out.collect()[0].text == "Café fin"
    # form=None stays pure-expression: no ArrowEvalPython in the plan
    plan = with_normalized_text(df, "text", form=None)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan


def test_bad_form_rejected(spark):
    df = spark.createDataFrame([("x",)], ["s"])
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(df, "s", "NFX")


def test_funnel_normalize_stage_collapses_twins(spark):
    """prepare_corpus(fix_encoding=True, unicode_form='NFC'): a
    mojibake'd copy and a decomposed copy of a real document are
    exact-dedup twins after the normalize stage; without the stage
    both survive (the control run proving the stage is load-bearing)."""
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    base = docs.filter(F.col("doc_id") == 1).collect()[0]
    text = "Café résumé — " + base.text
    composed = (1_000_001, text, base.lang, base.source, len(text))
    corrupted = (1_000_002, mojibake(text), base.lang, base.source, len(text))
    decomposed = (1_000_003, unicodedata.normalize("NFD", text), base.lang, base.source, len(text))
    planted = docs.unionByName(
        spark.createDataFrame([composed, corrupted, decomposed], schema=docs.schema)
    )
    kw = dict(chunk_size=16, overlap=0, near_dup="none")
    normed = prepare_corpus(
        spark, SF_SMOKE, docs=planted, fix_encoding=True, unicode_form="NFC", **kw
    )
    survivors = {
        r.doc_id
        for r in normed.filter(F.col("doc_id") > 1_000_000)
        .select("doc_id").distinct().collect()
    }
    assert len(survivors) == 1  # three spellings, one document kept

    control = prepare_corpus(spark, SF_SMOKE, docs=planted, **kw)
    control_survivors = {
        r.doc_id
        for r in control.filter(F.col("doc_id") > 1_000_000)
        .select("doc_id").distinct().collect()
    }
    assert len(control_survivors) == 3  # stage off -> all three distinct


def test_multiline_strings(spark):
    """Java's $ can assert before a FINAL line terminator — harmless
    here only because \\n/\\r are valid single-byte UTF-8 themselves;
    pin repair and pass-through across embedded/trailing newlines."""
    cases = [
        (mojibake("Café\nrésumé\n"), "Café\nrésumé\n"),
        (mojibake("línea1\r\nlínea2"), "línea1\r\nlínea2"),
        ("plain\ntext\n", "plain\ntext\n"),
        ("bad tail Ã\n", "bad tail Ã\n"),  # invalid stream stays put
    ]
    out = spark.createDataFrame([(s,) for s, _ in cases], "s string").select(
        fix_mojibake("s").alias("f")
    )
    assert [r.f for r in out.collect()] == [w for _, w in cases]


def test_mojibake_round_trip_property(spark):
    """Hypothesis: for ANY unicode text (surrogates excluded),
    corrupt -> repair recovers the original EXACTLY — including
    mojibake-looking originals like 'Ã©': corruption adds exactly one
    cp1252 layer and the repair peels exactly one, so the composition
    is the identity everywhere (the round-12 review killed an
    erroneous carve-out here — the ambiguity policy concerns REPAIR
    of raw text, never this composition)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFFF
        ),
        max_size=40,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(text, min_size=1, max_size=8))
    def run(texts):
        rows = [(i, mojibake(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "i int, s string")
        got = {r.i: r.f for r in df.select("i", fix_mojibake("s").alias("f")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == t, (t, got[i])

    run()


def test_flesch_matches_python_mirror(spark):
    """flesch_reading_ease vs an independent Python mirror of the
    same formula/heuristics, plus sanity ordering: simple prose
    scores far above polysyllabic academic text."""
    import re

    from open_data_pipelines_spark.operators.text_analysis import (
        flesch_reading_ease,
    )

    texts = [
        "The cat sat on the mat. It was warm. The sun shone.",
        "Considerable institutional heterogeneity complicates multilateral "
        "negotiations regarding international environmental instrumentation.",
        "See the bee flee. We make whale cake.",
        "",
        None,
        "one",
        "We bake a cake.",  # sentence-final silent e (round-12 review)
        "banana xyz 404 -- ok.",  # vowel-less tokens keep their floor
    ]

    def word_syl(w):
        clean = re.sub(r"(^[^a-z0-9]+|[^a-z0-9]+$)", "", w.lower())
        groups = len(re.findall(r"[aeiouy]+", clean))
        silent = 1 if re.search(r"[^aeiouy]e$", clean) else 0
        return max(groups - silent, 1)

    def mirror(t):
        if not t:
            return None
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t.strip()) if w]
        if not words:
            return None
        syl = sum(word_syl(w) for w in words)
        sent = max(len(re.findall(r"[.!?]+", t)), 1)
        return 206.835 - 1.015 * (len(words) / sent) - 84.6 * (syl / len(words))

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.f for r in df.select("i", flesch_reading_ease("t").alias("f")).collect()}
    for i, t in enumerate(texts):
        want = mirror(t)
        if want is None:
            assert got[i] is None, (i, got[i])
        else:
            assert got[i] == pytest.approx(want, rel=1e-12), (i, t)
    assert got[0] > got[1] + 40  # simple prose vs academic sludge
