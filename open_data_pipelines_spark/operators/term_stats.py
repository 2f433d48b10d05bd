"""Corpus-level term statistics (engine extension; rounds out the
text-analysis pack with the two classic signals that need CORPUS
state, not just per-row expressions: TF-IDF salience and character
entropy).

Shapes follow :mod:`.repetition`'s discipline — explode to (doc,
unit) rows, count with map-side-combinable hash aggregations, join
tiny side tables broadcast — never a per-doc quadratic expression
and never a driver-side loop:

- **TF-IDF** needs document frequency across the whole corpus: one
  groupBy over distinct (doc, term) pairs builds the DF table (|vocab|
  rows — broadcast), smooth idf = ln((N+1)/(df+1)) + 1 (the
  scikit-learn convention, deterministic and oracle-friendly), and
  top-k per doc is a bounded window over per-doc term rows.
- **Character entropy** is Shannon entropy of the per-doc character
  distribution — a cheap junk detector (random byte soup scores near
  log2(alphabet); single-char spam scores ~0) complementing
  :mod:`.repetition`'s duplicate signals and ``quality_score``'s
  length/stopword heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    return df.select(F.col(id_col), F.explode(toks).alias("__t"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """(id, term, tf, idf, tfidf, rank) — each document's ``k`` most
    salient terms by smooth TF-IDF.

    tf = raw in-doc count; idf = ln((N+1)/(df+1)) + 1 with df = number
    of docs containing the term. Ties break by (tfidf desc, term asc)
    so results are deterministic and cross-engine reproducible. The DF
    table is |vocab|-sized and broadcast; the only wide shuffles key
    on ``id_col`` / term — no product anywhere.
    """
    terms = _term_rows(df, text_col, id_col)
    tf = terms.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    docfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = tf.join(F.broadcast(docfreq), "__t").select(
        F.col(id_col),
        F.col("__t").alias("term"),
        "tf",
        (F.log((F.lit(n_docs) + 1.0) / (F.col("__df") + 1.0)) + 1.0).alias("idf"),
    )
    scored = scored.withColumn("tfidf", F.col("tf") * F.col("idf"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "idf", "tfidf", "rank")
    )


def char_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, char_entropy) — Shannon entropy (bits) of each
    document's character distribution.

    Explode to (doc, char) rows, count, then one per-doc aggregation:
    H = log2(n) - sum(c*log2(c))/n  (the algebraic form that needs no
    per-char p=c/n division before aggregating). Empty docs score 0.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("__c"),
    ).filter(F.col("__c") != "")
    counts = chars.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("__n"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__n").alias("n_chars"),
        F.sum(F.col("__n") * F.log2("__n")).alias("__clogc"),
    )
    out = per_doc.select(
        F.col(id_col),
        "n_chars",
        (F.log2("n_chars") - F.col("__clogc") / F.col("n_chars")).alias(
            "char_entropy"
        ),
    )
    base = df.select(F.col(id_col))
    return base.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.coalesce("char_entropy", F.lit(0.0)).alias("char_entropy"),
    )
