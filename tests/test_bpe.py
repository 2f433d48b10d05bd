"""BPE tokenizer: trainer parity against a naive reference
implementation, encode/detokenize round-trip, determinism across
partitionings, count consistency, and the cap's tie-safety."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.bpe import (
    EOW,
    _train_merges,
    _word_symbols,
    bpe_encode,
    detokenize,
    bpe_token_count,
    train_bpe,
    word_counts,
)


def naive_train(freqs: dict[str, int], num_merges: int):
    """The textbook O(merges x vocab) trainer (Sennrich 2016 fig. 1) —
    the oracle the incremental trainer must match exactly."""
    words = {w: list(_word_symbols(w)) for w in freqs}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freqs[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        if counts[pair] < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_incremental_trainer_matches_naive(seed):
    rng = random.Random(seed)
    alphabet = "abcdef"
    freqs = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 50)
        for _ in range(60)
    }
    assert _train_merges(dict(freqs), 40) == naive_train(dict(freqs), 40)


def test_train_on_spark_corpus_and_stats(spark):
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest new " * 3) for i in range(20)],
        ["doc_id", "text"],
    )
    tok = train_bpe(docs, "text", num_merges=50)
    assert tok["stats"]["distinct_words"] == 6
    assert tok["stats"]["trained_on_words"] == 6
    assert tok["stats"]["token_mass"] == 6 * 3 * 20
    # classic Sennrich example: 'lo', 'low', 'ne'/'new' family merges emerge
    merged_strings = {a + b for a, b in tok["merges"]}
    assert "lo" in merged_strings
    assert any(m.startswith("ne") for m in merged_strings)
    # every merge product is in the vocab
    assert set(merged_strings) <= set(tok["vocab"])


def test_trainer_is_partitioning_invariant(spark):
    rows = [(i, f"alpha beta gam{i % 7}ma delta " * 2) for i in range(50)]
    one = train_bpe(spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1), "text", 30)
    many = train_bpe(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13), "text", 30
    )
    assert one["merges"] == many["merges"]


def test_encode_roundtrip_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "the new newest"), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    tok = train_bpe(docs, "text", num_merges=30)
    enc = bpe_encode(docs, "text", tok["merges"])
    counted = bpe_token_count(enc, "text", tok["merges"])
    rows = {r["doc_id"]: r for r in counted.collect()}
    # round-trip: detokenize(encode(text)) == lowercased whitespace-normal text
    assert detokenize(rows[1]["bpe_tokens"]) == "low lower lowest"
    assert detokenize(rows[2]["bpe_tokens"]) == "the new newest"
    assert rows[3]["bpe_tokens"] == [] and rows[3]["n_bpe_tokens"] == 0
    assert rows[4]["bpe_tokens"] == [] and rows[4]["n_bpe_tokens"] == 0
    # count column == len(tokens) always
    for r in rows.values():
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
    # every token ends a word iff it carries the EOW sentinel; word
    # count is preserved
    assert sum(t.endswith(EOW) for t in rows[1]["bpe_tokens"]) == 3


def test_word_counts_shape(spark):
    docs = spark.createDataFrame(
        [(1, "A a  b"), (2, "b c")], ["doc_id", "text"]
    )
    got = {r["word"]: r["n"] for r in word_counts(docs, "text").collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_max_words_cap_keeps_head(spark):
    """With the cap at 2, training sees only the two most frequent
    words — the stats record what was dropped, nothing is silent."""
    docs = spark.createDataFrame(
        [(1, "aaa " * 50 + "bbb " * 40 + "ccc " * 2 + "ddd")],
        ["doc_id", "text"],
    )
    tok = train_bpe(docs, "text", num_merges=10, max_words=2)
    assert tok["stats"]["trained_on_words"] == 2
    assert tok["stats"]["distinct_words"] == 4
    assert tok["stats"]["trained_mass"] == 90
    assert tok["stats"]["token_mass"] == 93
    # merges come only from the head words
    for a, b in tok["merges"]:
        assert set((a + b).replace(EOW, "")) <= {"a", "b"}


def test_rare_singleton_pairs_never_merge():
    """A pair occurring once (count < 2) never becomes a merge — the
    loop stops instead of memorizing hapaxes."""
    merges = _train_merges({"xy": 1}, 10)
    assert merges == []


def test_funnel_packs_by_bpe_budget(spark):
    """With bpe_merges, the packing stage budgets in learned subwords:
    every pack's BPE token total respects the budget (singleton
    oversize excepted), and whitespace-based packing would differ on
    fragmenting text."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    # rare compound words fragment under BPE: whitespace counts say 8
    # tokens/chunk, BPE says far more, so BPE packs must be smaller.
    # Docs are DISTINCT (the i-suffixed token) so exact dedup keeps
    # them all, and long enough to produce several chunks each.
    rows = [
        (
            i,
            (f"antidisestablishmentarianism{i} floccinaucinihilipilification " * 4)
            * 8,
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("web")).withColumn("n_chars", F.length("text"))
    tok = train_bpe(docs, "text", num_merges=5)  # tiny: words stay fragmented

    def run(merges):
        return prepare_corpus(
            spark, SF_SMOKE, docs=docs, near_dup="none", quality_min=0.0,
            keep_langs=("en", "und"), chunk_size=8, overlap=0,
            pack_budget=60, bpe_merges=merges,
        )

    bpe_packed = run(tok["merges"])
    ws_packed = run(None)
    # the BPE budget must be respected in BPE tokens
    enc = bpe_token_count(bpe_packed, "chunk", tok["merges"])
    per_pack = enc.groupBy("pack_id").agg(
        F.sum("n_bpe_tokens").alias("t"), F.count(F.lit(1)).alias("rows")
    )
    over = per_pack.filter((F.col("t") > 60) & (F.col("rows") > 1)).count()
    assert over == 0
    # whitespace packing crams more chunks per pack on this corpus
    n_bpe_packs = bpe_packed.select("pack_id").distinct().count()
    n_ws_packs = ws_packed.select("pack_id").distinct().count()
    assert n_bpe_packs > n_ws_packs


def test_train_encode_agree_on_unicode_whitespace(spark):
    """Java's \\s is ASCII-only: training counts 'foo\\u00a0bar' as ONE
    word, and the encode-side Python mirror must split identically —
    str.split() (full Unicode whitespace) would silently diverge."""
    text = "foo bar foo bar baz"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = {r["word"]: r["n"] for r in word_counts(docs, "text").collect()}
    assert got == {"foo bar": 2, "baz": 1}
    tok = train_bpe(docs, "text", num_merges=20)
    enc = bpe_encode(docs, "text", tok["merges"]).first()["bpe_tokens"]
    # round-trip preserves the NBSP inside the word
    assert detokenize(enc) == text.lower()


def test_long_word_cap_is_consistent_and_fast(spark):
    """A whitespace-free blob longer than MAX_WORD_LEN bypasses merge
    application on BOTH sides: the trainer never learns from it and
    encode returns its raw char symbols promptly."""
    from open_data_pipelines_spark.operators.bpe import MAX_WORD_LEN

    blob = "a" * (MAX_WORD_LEN * 10)
    docs = spark.createDataFrame(
        [(1, f"{blob} {blob} hello hello world")], ["doc_id", "text"]
    )
    tok = train_bpe(docs, "text", num_merges=20)
    for a, b in tok["merges"]:  # no merge learned from the blob
        assert set((a + b).replace(EOW, "")) <= set("helowrd")
    enc = bpe_encode(docs, "text", tok["merges"]).first()["bpe_tokens"]
    assert detokenize(enc) == f"{blob} {blob} hello hello world"


def test_detokenize_preserves_literal_sentinel_text():
    """Only a token-final sentinel ends a word: tokens from a corpus
    word literally containing '</w>' survive the round trip."""
    # word "</w>" -> char symbols with EOW suffixed to the last one
    toks = list(_word_symbols("</w>"))
    assert detokenize(toks) == "</w>"
    # two words, the first ending mid-buffer
    toks2 = list(_word_symbols("ab")) + list(_word_symbols("</w>"))
    assert detokenize(toks2) == "ab </w>"


def test_worker_encoder_memo_is_bounded():
    """N distinct merge tables leave <= _MAX_WORKER_ENCODERS entries
    (LRU eviction — round-11 advice: the unbounded memo pinned every
    merge table a long-lived executor ever saw), and eviction does not
    change what an encoder produces (a rebuilt encoder is
    deterministic in its merge table)."""
    from open_data_pipelines_spark.operators import bpe as B

    saved = dict(B._WORKER_ENCODERS)
    B._WORKER_ENCODERS.clear()
    try:
        tables = [
            tuple((f"a{i}", f"b{i}") for i in range(k + 1)) for k in range(10)
        ]
        first = B._encoder_for(tables[0])("a0b0word")
        for t in tables:
            B._encoder_for(t)
        assert len(B._WORKER_ENCODERS) <= B._MAX_WORKER_ENCODERS
        # tables[0] was evicted; a rebuilt encoder gives the same tokens
        assert tables[0] not in B._WORKER_ENCODERS
        assert B._encoder_for(tables[0])("a0b0word") == first
        # most-recently-USED survives: touch an old entry, add a new one
        B._encoder_for(tables[-B._MAX_WORKER_ENCODERS])
        B._encoder_for(tuple((f"x{i}", f"y{i}") for i in range(3)))
        assert tables[-B._MAX_WORKER_ENCODERS] in B._WORKER_ENCODERS
    finally:
        B._WORKER_ENCODERS.clear()
        B._WORKER_ENCODERS.update(saved)


def test_vocab_has_no_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "abc abc abc ab abde c cq " * 5)], ["doc_id", "text"]
    )
    tok = train_bpe(docs, "text", num_merges=40)
    assert len(tok["vocab"]) == len(set(tok["vocab"]))


def test_bpe_merges_without_pack_budget_fails_loud(spark):
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    with pytest.raises(ValueError, match="pack_budget"):
        prepare_corpus(spark, SF_SMOKE, bpe_merges=[("a", "b")])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.dictionaries(
            st.text(alphabet="abcd", min_size=1, max_size=7),
            st.integers(min_value=1, max_value=30),
            min_size=1,
            max_size=25,
        ),
        st.integers(min_value=0, max_value=25),
    )
    def test_trainer_heap_matches_naive_property(freqs, num_merges):
        """Hypothesis twin of the seeded parity test: the lazy-deletion
        heap (pushed on every increment AND decrement) must select the
        exact same merge sequence as the naive full-scan trainer on
        arbitrary word-frequency dicts — including tie-heavy and
        single-word corpora where stale heap entries abound."""
        assert _train_merges(dict(freqs), num_merges) == naive_train(
            dict(freqs), num_merges
        )

except ImportError:  # pragma: no cover - hypothesis is in the env
    pass


def test_decode_round_trip(spark):
    """bpe_decode(bpe_encode(text)) recovers the canonical tokenized
    form (lowercase, ASCII-whitespace-collapsed) for real and hostile
    inputs; NULL stays NULL, empty stays empty."""
    from open_data_pipelines_spark.operators.bpe import (
        _py_words,
        bpe_decode,
        bpe_encode,
        train_bpe,
    )
    from open_data_pipelines_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"].limit(80)
    merges = train_bpe(docs, "text", num_merges=60)["merges"]
    texts = [r.text for r in docs.collect()] + [
        "MIXED Case\twith nbsp and  runs",
        "",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    out = bpe_decode(bpe_encode(df, "t", merges), "bpe_tokens", out_col="d")
    got = {r.i: r.d for r in out.collect()}
    for i, t in enumerate(texts):
        if t is None:
            # encode maps NULL text to an empty token array
            assert got[i] == ""
        else:
            assert got[i] == " ".join(_py_words(t)), (i, t)
