"""Byte-pair-encoding tokenizer — train + encode + count at corpus
scale (engine extension; upgrades the funnel's whitespace/regex token
counts to a real learned subword vocabulary. Public recipe: Sennrich
et al. 2016's word-frequency formulation, the same one the
HuggingFace/GPT-2 tokenizers implement).

Spark-first split of the work:

- **Word counts** (:func:`word_counts`): ONE distributed explode +
  map-side-combinable groupBy over the corpus — the only stage that
  touches every byte. BPE training provably needs nothing else: merge
  statistics are sums over the word-frequency table, so 100 TB of
  text compresses to |distinct words| rows before any quadratic work.
- **Train** (:func:`train_bpe`): the classic merge loop over the
  aggregated word-freq table, driver-side over at most ``max_words``
  top words (a BOUNDED collect, the :func:`.ivf.train_centroids`
  posture — the tail of a Zipf distribution contributes pair counts
  of ~1 and cannot win a merge; the cap is the standard
  trainer-sample trade and is logged in the returned stats).
  Incremental pair-count maintenance (only words containing the
  merged pair are touched) keeps it O(merges x affected-words), not
  O(merges x vocab).
- **Encode** (:func:`bpe_encode` / :func:`token_count_bpe`): applying
  thousands of ranked merges is genuinely inexpressible in column
  functions — this is the charter's honest UDF case, so encoding is
  an Arrow-batched pandas UDF with the merge table inlined in the
  closure (broadcast once per executor, not per row) and an LRU word
  cache (Zipf again: a tiny cache hits almost every word).

Determinism: merge selection breaks count ties by lexicographic pair
order, so the same corpus always trains the same tokenizer — across
partitionings too, because counts are exact integers from one global
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel appended to each word's last symbol (the
#: Sennrich "</w>" marker) — makes detokenization unambiguous
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over whitespace-split, lowercased text — one explode
    + one map-side-combinable groupBy; empty tokens dropped."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    return (
        df.select(toks)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _train_merges(freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """The merge loop over a word-frequency dict. Incremental: pair
    counts are maintained per merge by re-scanning only the words that
    contain the winning pair (indexed), never the whole vocabulary."""
    words: list[tuple[str, ...]] = []
    wfreq: list[int] = []
    for w, n in freqs.items():
        syms = _word_symbols(w)
        if len(syms) >= 2:
            words.append(syms)
            wfreq.append(n)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(i: int, sign: int) -> None:
        syms, n = words[i], wfreq[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * n
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(i)

    for i in range(len(words)):
        add_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pair, cnt in pair_counts.items():
            if cnt <= 0:
                continue
            key = (-cnt, pair)
            if best is None or key < best[0]:
                best = (key, pair, cnt)
        if best is None or best[2] < 2:
            break  # nothing left worth merging
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in list(pair_words.get(pair, ())):
            syms = words[i]
            if pair not in zip(syms, syms[1:]):
                continue  # stale index entry from an earlier rewrite
            add_word(i, -1)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = tuple(out)
            add_word(i, +1)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_words: int = 500_000,
) -> dict:
    """Train a BPE merge table on the corpus. Returns ``{"merges":
    [(a, b), ...], "vocab": [...], "stats": {...}}``.

    One distributed word-count aggregation; the merge loop runs on the
    driver over the ``max_words`` most frequent words (deterministic
    tie-break by word). The cap is the standard trainer-sample trade:
    Zipf tails contribute pair counts of ~1 and cannot alter merge
    choices; ``stats`` records how many words (and what count mass)
    the cap dropped so the trade is never silent.
    """
    counts = word_counts(df, text_col)
    totals = counts.agg(
        F.count(F.lit(1)).alias("w"), F.sum("n").alias("mass")
    ).first()
    top = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
        max_words
    ).collect()
    freqs = {r["word"]: r["n"] for r in top}
    merges = _train_merges(freqs, num_merges)
    alphabet = sorted({s for w in freqs for s in _word_symbols(w)})
    vocab = alphabet + [a + b for a, b in merges]
    return {
        "merges": merges,
        "vocab": vocab,
        "stats": {
            "distinct_words": int(totals["w"]),
            "token_mass": int(totals["mass"] or 0),
            "trained_on_words": len(freqs),
            "trained_mass": int(sum(freqs.values())),
            "num_merges": len(merges),
        },
    }


def _encoder(merges: list[tuple[str, str]]):
    """word -> tuple of BPE tokens, with the classic rank-greedy merge
    application and an LRU cache (Zipf: the cache hits almost every
    word in real text)."""
    from functools import lru_cache

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @lru_cache(maxsize=65536)
    def encode_word(word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        while len(syms) >= 2:
            best_rank, best_j = None, None
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_j = r, j
            if best_j is None:
                break
            syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
        return tuple(syms)

    return encode_word


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` of BPE tokens. Arrow-batched
    pandas UDF (the honest UDF case — ranked merge application is not
    expressible in column functions); the merge table ships once in
    the closure."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges = [tuple(p) for p in merges]

    def _encode(texts):
        enc = _encoder(merges)

        def run(t):
            if t is None:
                return []
            out: list[str] = []
            for w in t.lower().split():
                if w:
                    out.extend(enc(w))
            return out

        return texts.map(run)

    # runtime annotations: the module's `from __future__ import
    # annotations` would leave string hints pandas_udf cannot resolve
    _encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    encode = pandas_udf(_encode, "array<string>")
    return df.withColumn(out_col, encode(F.col(text_col)))


def token_count_bpe(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]],
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the learned-subword token count — the budget a packing /
    chunking stage should use when the training tokenizer is BPE
    (whitespace counts undercount rare words that fragment)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges = [tuple(p) for p in merges]

    def _count(texts):
        enc = _encoder(merges)

        def run(t):
            if t is None:
                return 0
            return sum(len(enc(w)) for w in t.lower().split() if w)

        return texts.map(run)

    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    count = pandas_udf(_count, "long")
    return df.withColumn(out_col, count(F.col(text_col)))


def detokenize(tokens: list[str]) -> str:
    """Inverse of encode for a token list (test/debug helper): join
    and split on the end-of-word sentinel."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")
