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

#: words longer than this bypass merge application (char symbols as
#: is): the greedy merge loop is O(len^2) per word, and a megabyte
#: whitespace-free run (base64 blob, URL) would stall a task — the
#: same cap HF-style tokenizers apply before merging
MAX_WORD_LEN = 100


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over whitespace-split, lowercased text — one explode
    + one map-side-combinable groupBy; NULL/blank rows contribute
    nothing (the shared :func:`.text_analysis.tokens_or_empty`
    guard)."""
    from .text_analysis import tokens_or_empty

    toks = F.explode(tokens_or_empty(text_col, lower=True)).alias("word")
    return (
        df.select(toks)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _py_words(text: str | None) -> list[str]:
    """The PYTHON mirror of the JVM-side tokenization word_counts
    trains on (``split(trim(lower(c)), r"\\s+")``): Java's ``\\s`` is
    the ASCII class, so the mirror must NOT use ``str.split()``'s full
    Unicode whitespace — training would count 'foo\\u00a0bar' as one
    word while encode split it in two, silently diverging the learned
    distribution from what encode applies. (Residual edge: Java vs
    Python lowercasing differs on a handful of locale-sensitive
    codepoints; accepted and documented.)"""
    import re

    if not text:
        return []
    return [w for w in re.split("[ \t\n\x0b\f\r]+", text.lower()) if w]


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _train_merges(freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """The merge loop over a word-frequency dict. Incremental twice
    over: pair counts are maintained per merge by re-scanning only the
    words that contain the winning pair (indexed), never the whole
    vocabulary; and the winner comes from a lazy-deletion max-heap —
    every count CHANGE (increment or decrement) pushes the new value,
    stale entries are discarded on pop when they disagree with the
    live count, so selection is O(log pairs) amortized instead of a
    full pair-table scan per merge. Tie-break identical to the naive
    form: highest count, then lexicographically smallest pair. Words
    longer than :data:`MAX_WORD_LEN` are excluded (same cap encode
    applies, so the trained distribution matches what encode sees)."""
    import heapq

    words: list[tuple[str, ...]] = []
    wfreq: list[int] = []
    for w, n in freqs.items():
        syms = _word_symbols(w)
        if 2 <= len(syms) and len(w) <= MAX_WORD_LEN:
            words.append(syms)
            wfreq.append(n)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word(i: int, sign: int) -> None:
        syms, n = words[i], wfreq[i]
        for a, b in zip(syms, syms[1:]):
            new = pair_counts.get((a, b), 0) + sign * n
            if new > 0:
                pair_counts[(a, b)] = new
                heapq.heappush(heap, (-new, (a, b)))
            else:
                pair_counts.pop((a, b), None)  # prune, don't accumulate zeros
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(i)

    for i in range(len(words)):
        add_word(i, +1)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        pair = None
        while heap:
            neg, cand = heapq.heappop(heap)
            if pair_counts.get(cand) == -neg:  # live entry
                pair = cand
                break
        if pair is None or pair_counts[pair] < 2:
            break  # nothing left worth merging
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
    # persist: the word-count aggregation feeds BOTH the stats action
    # and the top-k collect — without it the corpus-wide explode scan
    # (the expensive stage) runs twice
    counts = word_counts(df, text_col).persist()
    try:
        totals = counts.agg(
            F.count(F.lit(1)).alias("w"), F.sum("n").alias("mass")
        ).first()
        top = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
            max_words
        ).collect()
    finally:
        counts.unpersist()
    freqs = {r["word"]: r["n"] for r in top}
    merges = _train_merges(freqs, num_merges)
    alphabet = sorted({s for w in freqs for s in _word_symbols(w)})
    # dedup while preserving merge order: two distinct merges can
    # concatenate to the same string (('a','bc') and ('ab','c') both
    # yield 'abc') and a duplicated vocab entry would shift/collide
    # any enumerate()-assigned token ids downstream
    vocab = list(dict.fromkeys(alphabet + [a + b for a, b in merges]))
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
    word in real text). Words longer than :data:`MAX_WORD_LEN` skip
    merge application (char symbols as is) — the O(len^2) loop on a
    megabyte whitespace-free blob would stall the task, and the
    trainer excluded such words too."""
    from functools import lru_cache

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @lru_cache(maxsize=65536)
    def encode_word(word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        if len(word) > MAX_WORD_LEN:
            return tuple(syms)
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


#: per-worker-process encoder memo: a pandas UDF body runs once per
#: Arrow batch, so building the rank dict + LRU cache inside it would
#: reset both every ~10k rows — the memo keys on the merge table and
#: survives across batches within one Python worker. BOUNDED at
#: _MAX_WORKER_ENCODERS entries with LRU eviction (round-11 advice:
#: an unbounded memo pins every merge table a long-lived executor
#: ever sees — each with a rank dict + 65k-entry word cache — so a
#: standing cluster that retrains weekly would accrete dead encoders
#: forever). OrderedDict, not lru_cache: eviction must drop the big
#: encoder object itself, not just a wrapper entry.
from collections import OrderedDict as _OrderedDict  # noqa: E402

_MAX_WORKER_ENCODERS = 4
_WORKER_ENCODERS: "_OrderedDict[tuple, object]" = _OrderedDict()


def _encoder_for(merges_key: tuple) -> object:
    enc = _WORKER_ENCODERS.get(merges_key)
    if enc is None:
        enc = _encoder([tuple(p) for p in merges_key])
        _WORKER_ENCODERS[merges_key] = enc
        while len(_WORKER_ENCODERS) > _MAX_WORKER_ENCODERS:
            _WORKER_ENCODERS.popitem(last=False)
    else:
        _WORKER_ENCODERS.move_to_end(merges_key)
    return enc


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

    merges_key = tuple(tuple(p) for p in merges)

    def _encode(texts):
        enc = _encoder_for(merges_key)

        def run(t):
            out: list[str] = []
            for w in _py_words(t):
                out.extend(enc(w))
            return out

        return texts.map(run)

    # runtime annotations: the module's `from __future__ import
    # annotations` would leave string hints pandas_udf cannot resolve
    _encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    encode = pandas_udf(_encode, "array<string>")
    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_decode(
    df: DataFrame, tokens_col: str, out_col: str = "decoded_text",
) -> DataFrame:
    """Invert :func:`bpe_encode` — PURE EXPRESSIONS (the asymmetry is
    real: merge application needs ranked iteration, but undoing it is
    string concatenation): join the subwords, turn each end-of-word
    marker into a space, trim the trailing one. Recovers the
    canonical form encode tokenized (lowercased, ASCII-whitespace-
    collapsed), i.e. ``" ".join(_py_words(text))`` — pinned by the
    round-trip test. Known edge, shared by every marker-based BPE:
    raw text containing the literal marker string decodes with an
    extra break."""
    import re

    toks = F.col(tokens_col)
    joined = F.array_join(toks, "")
    text = F.trim(F.regexp_replace(joined, re.escape(EOW), " "))
    return df.withColumn(
        out_col, F.when(toks.isNull(), F.lit(None).cast("string")).otherwise(text)
    )


def bpe_token_count(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]],
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the learned-subword token count — the budget a packing /
    chunking stage should use when the training tokenizer is BPE
    (whitespace counts undercount rare words that fragment).

    Named ``bpe_token_count`` (DataFrame in, DataFrame out) to avoid
    colliding with :func:`.text_analysis.token_count_bpe`, the
    Column-valued REGEX approximation used where no trained merge
    table exists — same-named imports with different signatures and
    different semantics would be a silent-wrong-counts hazard."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges_key = tuple(tuple(p) for p in merges)

    def _count(texts):
        enc = _encoder_for(merges_key)

        def run(t):
            return sum(len(enc(w)) for w in _py_words(t))

        return texts.map(run)

    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    count = pandas_udf(_count, "long")
    return df.withColumn(out_col, count(F.col(text_col)))


def detokenize(tokens: list[str]) -> str:
    """Inverse of encode for a token list (test/debug helper). Only a
    token-FINAL sentinel ends a word — a blanket substring replace
    would corrupt corpus text that literally contains '</w>' (its
    symbols carry the sentinel as a suffix after a real '>'). Residual
    Sennrich-inherited ambiguity: a merge could assemble a mid-word
    token whose chars happen to END with '</w>' — byte-level BPE is
    the published fix; out of scope for a debug helper."""
    words: list[str] = []
    buf = ""
    for t in tokens:
        if t.endswith(EOW):
            words.append(buf + t[: -len(EOW)])
            buf = ""
        else:
            buf += t
    if buf:
        words.append(buf)
    return " ".join(words)
