"""Repetition-based quality signals for training corpora (engine
extension; complements :mod:`.text_analysis`'s length/punct/stopword
`quality_score` with the duplicate-content signals of Rae et al. 2021
("Scaling Language Models: ... Gopher", Appendix A1.1) as popularized
by the RedPajama/Dolma filtering recipes).

A document stuffed with repeated lines or one dominating phrase is
boilerplate (menus, listings, SEO spam) even when its length and
punctuation look fine. Signals computed here, all per-document:

- ``dup_line_fraction``: lines that are repeats of an earlier line /
  total non-blank lines.
- ``dup_line_char_fraction``: characters in those repeated occurrences
  (beyond each line's first) / total line characters.
- ``top_ngram_char_fraction(n)``: characters covered by the single
  most frequent token n-gram / total characters — high when one
  phrase dominates.

Spark-first shape: explode lines / n-grams, count by (doc, unit),
re-aggregate per doc — three hash shuffles keyed on doc_id, all
map-side combinable, no window over exploded rows and no quadratic
per-doc expression (a 100k-token doc would make an expression-level
``filter(lines, ...)`` scan O(L^2)). Ties on the top n-gram break
toward the lexicographically smallest gram (struct max), so results
are deterministic and cross-engine reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher Appendix A1.1 cutoffs (documents EXCEEDING a threshold drop)
GOPHER_THRESHOLDS = {
    "dup_line_fraction": 0.30,
    "dup_line_char_fraction": 0.20,
    "top_2gram_char_fraction": 0.20,
    "top_3gram_char_fraction": 0.18,
    "top_4gram_char_fraction": 0.16,
}


def _tokens(col: Column) -> Column:
    # split + drop empties: robust to leading/trailing ANY whitespace
    # (Spark `trim` strips only spaces — newlines would survive it)
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def line_repetition_signals(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, n_lines, dup_line_fraction, dup_line_char_fraction) per doc.

    Blank/whitespace-only lines are ignored (they separate paragraphs;
    counting them as "duplicates" would flag every multi-paragraph
    doc). Docs with no non-blank lines get 0.0 fractions.
    """
    lines = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("__l"))
        .withColumn("__l", F.trim("__l"))
        .filter(F.col("__l") != "")
    )
    per_line = lines.groupBy(id_col, "__l").agg(
        F.count(F.lit(1)).alias("__n"), F.length(F.col("__l")).alias("__len")
    )
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("__n").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
        F.sum(F.col("__n") * F.col("__len")).alias("__chars"),
        F.sum(F.when(F.col("__n") > 1, (F.col("__n") - 1) * F.col("__len")).otherwise(0)).alias(
            "__dup_chars"
        ),
    )
    out = per_doc.select(
        F.col(id_col),
        F.col("__total").alias("n_lines"),
        ((F.col("__total") - F.col("__distinct")).cast("double") / F.col("__total").cast("double")).alias(
            "dup_line_fraction"
        ),
        F.when(F.col("__chars") > 0, F.col("__dup_chars").cast("double") / F.col("__chars").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_fraction"),
    )
    # docs whose text has no non-blank line vanish in the explode;
    # restore them with zero signals (left join keyed on the id)
    base = df.select(F.col(id_col))
    return base.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("dup_line_fraction", F.lit(0.0)).alias("dup_line_fraction"),
        F.coalesce("dup_line_char_fraction", F.lit(0.0)).alias("dup_line_char_fraction"),
    )


def top_ngram_char_fraction(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, top_{n}gram_char_fraction) — characters covered by the most
    frequent whitespace-token n-gram over total document characters
    (whitespace included, as Gopher counts raw text chars).

    Coverage is ``count * chars(gram)``; overlapping occurrences are
    counted independently (the standard, cheap convention). Docs
    shorter than n tokens score 0.0.
    """
    col_name = f"top_{n}gram_char_fraction"
    toks = _tokens(F.col(text_col))
    # size guard is load-bearing: sequence(1, 0) would generate a
    # DESCENDING [1, 0] (phantom grams), not an empty list
    grams = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__chars"),
        F.explode(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda s: F.concat_ws(" ", F.slice(toks, s, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__g"),
    )
    counted = grams.groupBy(id_col, "__chars", "__g").agg(F.count(F.lit(1)).alias("__n"))
    # deterministic argmax: (count, length, reversed-gram) struct max —
    # most frequent wins, ties to the longer gram, then lexicographic
    top = counted.groupBy(id_col, "__chars").agg(
        F.max(
            F.struct(
                F.col("__n").alias("n"),
                F.length("__g").alias("len"),
                F.col("__g").alias("g"),
            )
        ).alias("__top")
    )
    out = top.select(
        F.col(id_col),
        (
            (F.col("__top.n") * F.col("__top.len")).cast("double")
            / F.greatest(F.col("__chars"), F.lit(1)).cast("double")
        ).alias(col_name),
    )
    base = df.select(F.col(id_col))
    return base.join(out, id_col, "left").select(
        id_col, F.coalesce(col_name, F.lit(0.0)).alias(col_name)
    )


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str, ngram_ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """All repetition signals joined per doc — one line-shuffle plus
    one gram-shuffle per n, each keyed on ``id_col`` so AQE can
    coalesce; the joins are on the same key (no extra exchange after
    the first)."""
    out = line_repetition_signals(df, text_col, id_col)
    for n in ngram_ns:
        out = out.join(top_ngram_char_fraction(df, text_col, id_col, n), id_col)
    return out


def repetition_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Drop documents exceeding any Gopher repetition threshold.

    Returns the surviving rows of ``df`` (schema unchanged) — the
    signals frame is an internal semi-join, so this composes directly
    into :func:`..plans.corpus_prep.prepare_corpus`-style funnels.
    """
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        import re

        known = {"dup_line_fraction", "dup_line_char_fraction"}
        bad = [
            k
            for k in thresholds
            if k not in known and not re.fullmatch(r"top_\d+gram_char_fraction", k)
        ]
        if bad:
            raise ValueError(
                f"unknown repetition threshold keys {bad}; valid: "
                f"{sorted(known)} or top_<n>gram_char_fraction"
            )
        th.update(thresholds)
    ns = tuple(
        int(k.split("_")[1].removesuffix("gram")) for k in th if k.startswith("top_")
    )
    sig = repetition_signals(df, text_col, id_col, ngram_ns=ns)
    cond = F.lit(True)
    for k, v in th.items():
        cond = cond & (F.col(k) <= F.lit(v))
    keep = sig.filter(cond).select(id_col)
    return df.join(keep, id_col, "left_semi")
