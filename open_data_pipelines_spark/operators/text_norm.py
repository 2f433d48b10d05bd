"""Unicode text normalization (engine extension; the ftfy/NFC stage
every large-scale text pipeline runs before tokenization — CCNet
normalizes with NFD, GPT-2/fastText recipes with NFKC, and web
corpora arrive with a measurable fraction of UTF-8-read-as-cp1252
mojibake that double-counts in dedup and poisons the tokenizer's
learned merges).

Two operators, two execution tiers:

- :func:`fix_mojibake` — PURE EXPRESSIONS (codegen, zero Python).
  The classic corruption is UTF-8 bytes decoded as cp1252/latin-1
  ("Café" -> "CafÃ©"). Because latin-1 maps bytes to the code points
  0x00-0xFF identity-wise, the repair is `decode(encode(s, latin1),
  utf8)` — both JVM built-ins. cp1252's 27 specials (€ " – …) first
  `translate` down to their byte positions. Spark 4's `decode`
  THROWS on malformed input (MALFORMED_CHARACTER_CODING), so the
  repair is gated by a regex that validates the latin-1 image as
  strict UTF-8 (RFC 3629 byte classes re-expressed over code points
  — overlongs, lone continuations, surrogates and >U+10FFFF all
  rejected) AND requires at least one multi-byte lead: ASCII and
  ordinary accented text never match, pass through untouched, and
  the throwing branch is provably unreachable. One known, accepted
  false-positive class: genuine latin-1 text whose byte image
  HAPPENS to be valid UTF-8 with a lead byte (e.g. the literal
  two-char string "Ã©") is indistinguishable from mojibake by
  construction — every encoding fixer shares this ambiguity and
  resolves it the same way (the UTF-8 reading wins).

- :func:`normalize_unicode` — NFC/NFKC/NFD/NFKD via an Arrow-batched
  pandas UDF. This is the honest-UDF case (like BPE encode): the JVM
  has no normalization expression, and the semantics (full UCD
  decomposition + canonical reordering + composition) are not
  regex-expressible. The batch body short-circuits pure-ASCII rows
  with C-speed ``str.isascii`` (normalization is identity on ASCII),
  so on mostly-ASCII web text the per-row Python cost is one branch.

Cross-engine: DuckDB exposes ``nfc_normalize`` — NFC parity is pinned
engine-vs-engine in tests/test_text_norm.py; the mojibake repair is
pinned against a byte-level Python oracle (encode/decode round-trip).

At 100 TB both are embarrassingly parallel single-pass projections:
no shuffle, no state, prune to the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from ..functions.exprmemo import memo_column

__all__ = ["fix_mojibake", "normalize_unicode", "with_normalized_text"]


# cp1252 bytes 0x80-0x9F that differ from latin-1: the code points a
# cp1252 (mis)reader produced, and the byte values they came from.
# The five undefined bytes (0x81 8D 8F 90 9D) fall back to the
# latin-1 control chars in sloppy readers — already identity here.
_CP1252_CHARS = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_CP1252_BYTES = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)

# Strict UTF-8 over code points 0x00-0xFF (the latin-1 byte image):
# RFC 3629 lead/continuation classes; excludes overlongs (C0/C1, E0
# 80-9F, F0 80-8F), surrogates (ED A0-BF) and anything past U+10FFFF
# (F5-FF). Anchored: the WHOLE string must be one valid UTF-8 stream.
_VALID_UTF8_IMAGE = (
    "^(?:[\x00-\x7f]"
    "|[\xc2-\xdf][\x80-\xbf]"
    "|\xe0[\xa0-\xbf][\x80-\xbf]"
    "|[\xe1-\xec][\x80-\xbf][\x80-\xbf]"
    "|\xed[\x80-\x9f][\x80-\xbf]"
    "|[\xee-\xef][\x80-\xbf][\x80-\xbf]"
    "|\xf0[\x90-\xbf][\x80-\xbf][\x80-\xbf]"
    "|[\xf1-\xf3][\x80-\xbf][\x80-\xbf][\x80-\xbf]"
    "|\xf4[\x80-\x8f][\x80-\xbf][\x80-\xbf]"
    ")*$"
)
# at least one multi-byte lead: without one the repair is identity,
# and requiring it keeps ASCII/accented text out of the CASE branch
_HAS_LEAD = "[\xc2-\xf4]"


def _once(expr: Column, f) -> Column:
    # expression-duplication barrier (see url_filter._once): bind the
    # translated string once so the CASE's three uses of it don't
    # re-inline the translate tree per use site
    return F.transform(F.array(expr), f)[0]


@memo_column
def fix_mojibake(col: Column | str) -> Column:
    """Repair UTF-8-decoded-as-cp1252/latin-1 mojibake in one pure
    expression; rows that are not provably mojibake pass through
    unchanged (NULL stays NULL). Idempotent on its own output unless
    the text was double-mojibake'd, in which case a second
    application peels the second layer — apply in a loop only if the
    corpus is known to contain multi-encoded layers."""
    c = F.col(col) if isinstance(col, str) else col

    def repair(s: Column) -> Column:
        t = s["t"]
        is_utf8_image = t.rlike(_VALID_UTF8_IMAGE) & t.rlike(_HAS_LEAD)
        # the guard guarantees every char <= U+00FF and the latin-1
        # byte image is strict UTF-8, so encode is lossless and
        # decode cannot reach its MALFORMED_CHARACTER_CODING throw.
        # The reject branch must return the ORIGINAL, not t: the
        # cp1252 pre-translate has already rewritten specials
        # ("—" -> \x97) in t, and leaking that onto the no-repair
        # path corrupts clean text that merely CONTAINS cp1252
        # specials (pinned in test_text_norm).
        return F.when(
            is_utf8_image, F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")
        ).otherwise(s["o"])

    # ONE single-level lambda binds both values (original +
    # translated) through a struct: a nested _once whose inner lambda
    # captures the outer lambda's variable evaluates fine standalone
    # but hits INTERNAL_ERROR "Cannot evaluate expression" when the
    # tree becomes the input of a downstream pandas UDF (the
    # ArrowEvalPython child projection can't bind cross-scope lambda
    # variables). The original expression is referenced twice (pass-
    # through + translate input) — both uses are cheap for a plain
    # column ref, which is the supported input shape.
    return F.transform(
        F.array(
            F.struct(
                c.alias("o"), F.translate(c, _CP1252_CHARS, _CP1252_BYTES).alias("t")
            )
        ),
        repair,
    )[0]


_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize_unicode(df: DataFrame, text_col: str, form: str = "NFC", out_col: str | None = None) -> DataFrame:
    """Append (or replace) ``text_col`` with its Unicode-normalized
    form. Arrow-batched pandas UDF — the honest UDF case, the JVM has
    no normalization expression — with a C-speed ``str.isascii``
    fast path per row (identity on ASCII, which dominates web text).
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        import unicodedata

        def one(x):
            if x is None or x.isascii():
                return x
            return unicodedata.normalize(form, x)

        return s.map(one, na_action="ignore")

    # runtime annotations: `from __future__ import annotations` leaves
    # string hints pandas_udf cannot resolve (same pattern as bpe.py)
    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    norm = pandas_udf(_norm, "string")
    return df.withColumn(out_col or text_col, norm(F.col(text_col)))


def with_normalized_text(
    df: DataFrame,
    text_col: str,
    fix_encoding: bool = True,
    form: str | None = "NFC",
) -> DataFrame:
    """The composed pre-tokenization normalize stage: mojibake repair
    (pure expressions) then optional Unicode normalization (pandas
    UDF; ``form=None`` skips it and the whole stage stays
    codegen-only). Repair runs FIRST — normalizing mojibake can
    destroy the byte structure the repair keys on."""
    out = df
    if fix_encoding:
        out = out.withColumn(text_col, fix_mojibake(text_col))
    if form is not None:
        out = normalize_unicode(out, text_col, form)
    return out
