"""Training-data text preparation: PII redaction, normalization,
token-window chunking (pure-expression ops, no Python in the hot
path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_analysis import (
    chunk_tokens,
    normalize_text,
    redact_pii,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(expr("t").alias("o")).collect()[0]["o"]


def test_redact_pii_families(spark):
    got = _one(
        spark,
        "mail bob.smith+x@example.co.uk or call +44 20 7946 0958, "
        "host 192.168.0.1, card 4111 1111 1111 1111 end",
        redact_pii,
    )
    assert "<EMAIL>" in got and "<PHONE>" in got and "<IP>" in got
    assert "example.co.uk" not in got and "7946" not in got and "192.168" not in got
    assert got.startswith("mail <EMAIL> or call <PHONE>")
    assert got.endswith("end")


def test_redact_pii_leaves_clean_text_alone(spark):
    clean = "The permit for 12 Oak Street was granted in 2024."
    assert _one(spark, clean, redact_pii) == clean


def test_normalize_text(spark):
    assert _one(spark, "  Hello\t\tWORLD \n twice  ", normalize_text) == "hello world twice"


def test_chunk_tokens_stride_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    chunks = _one(spark, text, lambda c: chunk_tokens(c, 4, overlap=1))
    # stride 3: starts at tokens 0,3,6 (1-based 1,4,7); tail kept
    assert chunks == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    # overlap propagates context between consecutive chunks
    assert chunks[0].split()[-1] == chunks[1].split()[0]

    no_overlap = _one(spark, text, lambda c: chunk_tokens(c, 5))
    assert no_overlap == ["w0 w1 w2 w3 w4", "w5 w6 w7 w8 w9"]

    assert _one(spark, "", lambda c: chunk_tokens(c, 4)) == []
    assert _one(spark, "a b", lambda c: chunk_tokens(c, 4)) == ["a b"]


def test_chunk_tokens_validates_overlap():
    with pytest.raises(ValueError):
        chunk_tokens("t", 4, overlap=4)


def test_chunks_explode_to_rows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7)))], ["doc_id", "text"]
    )
    rows = (
        df.select("doc_id", F.posexplode(chunk_tokens("text", 3)).alias("chunk_idx", "chunk"))
        .collect()
    )
    assert [(r["doc_id"], r["chunk_idx"], r["chunk"]) for r in rows] == [
        (1, 0, "t0 t1 t2"),
        (1, 1, "t3 t4 t5"),
        (1, 2, "t6"),
    ]


def test_bulk_invariants_chunking_and_redaction(spark):
    """Battery invariants in one pass: (a) overlap=0 chunks concatenate
    back to the exact token stream; (b) overlapping chunks agree on
    their shared context; (c) redaction is idempotent."""
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "x1", "mail", "a@b.io", "192.168.0.7", "call", "+44 20 7946 0958"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 40))) for _ in range(60)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])

    out = df.select(
        "i",
        "t",
        chunk_tokens("t", 7).alias("flat"),
        chunk_tokens("t", 7, overlap=2).alias("lapped"),
        redact_pii("t").alias("r1"),
        redact_pii(redact_pii("t")).alias("r2"),
    ).collect()

    for r in out:
        toks = r["t"].split()
        # (a) exact reconstruction with no overlap
        assert " ".join(r["flat"]).split() == toks
        # (b) consecutive overlapped chunks share their 2-token seam
        for left, right in zip(r["lapped"], r["lapped"][1:]):
            assert left.split()[-2:] == right.split()[:2]
        # (c) idempotence
        assert r["r1"] == r["r2"]


def test_sentence_chunks_respects_budget_and_boundaries(spark):
    """Sentence-boundary chunking: whole sentences only, budget
    respected except single oversized sentences, content preserved."""
    import pytest
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.operators.text_analysis import sentence_chunks

    rows = [
        (1, "One two three. Four five. Six seven eight nine! Ten?"),
        (2, "A single enormously long sentence with eleven whole tokens inside here."),
        (3, ""),
        (4, None),
        (5, "Short. " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", sentence_chunks("text", 6).alias("c")).collect()
    }
    assert got[1] == [
        "One two three. Four five.",
        "Six seven eight nine! Ten?",
    ]
    # a single over-budget sentence is kept whole as its own chunk
    assert got[2] == [rows[1][1]]
    assert got[3] == [] and got[4] == []
    # budget respected on every multi-sentence chunk; content preserved
    for doc_id, chunks in got.items():
        text = dict(rows)[doc_id]
        if not text:
            continue
        for ch in chunks:
            n = len(ch.split())
            assert n <= 6 or "." not in ch.rstrip(".")  # oversized = one sentence
        assert " ".join(chunks).split() == text.split()

    with pytest.raises(ValueError, match="budget"):
        df.select(sentence_chunks("text", 0))


def test_sentence_chunks_greedy_oracle(spark):
    """Randomized parity with a pure-Python greedy fold."""
    import random

    from open_data_pipelines_spark.operators.text_analysis import sentence_chunks

    rng = random.Random(21)
    docs = []
    for i in range(40):
        sents = [
            " ".join(f"w{rng.randrange(30)}" for _ in range(rng.randint(1, 9))) + "."
            for _ in range(rng.randint(1, 12))
        ]
        docs.append((i, " ".join(sents)))

    def oracle(text, budget):
        import re

        sents = [s for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        chunks, used = [], 0
        for s in sents:
            n = len(s.split())
            if not chunks or used + n > budget:
                chunks.append(s.strip())
                used = n
            else:
                chunks[-1] = chunks[-1] + " " + s.strip()
                used += n
        return chunks

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", sentence_chunks("text", 12).alias("c")).collect()
    }
    for i, text in docs:
        assert got[i] == oracle(text, 12), i


def test_funnel_sentence_chunking_option(spark):
    """chunking='sentence' swaps the fixed-window split for whole-
    sentence packing; chunks respect the budget (oversized single
    sentences excepted) and never cut mid-sentence."""
    import pytest
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from tests.conftest import SF_SMOKE

    rows = [
        (i, " ".join(f"sent{i} number {j} says hello world." for j in range(8)))
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("web")).withColumn("n_chars", F.length("text"))
    with pytest.raises(ValueError, match="overlap"):
        prepare_corpus(
            spark, SF_SMOKE, docs=docs, chunking="sentence", chunk_size=12, overlap=4
        )
    # the DEFAULT overlap (None) must NOT trip the sentence-mode guard
    # (round-11 advice: the old int default forced overlap=0 on every
    # sentence caller); window mode still resolves the default to 8
    prepare_corpus(
        spark, SF_SMOKE, docs=docs, near_dup="none", quality_min=0.0,
        keep_langs=("en", "und"), chunking="sentence", chunk_size=12,
    )
    out = prepare_corpus(
        spark, SF_SMOKE, docs=docs, near_dup="none", quality_min=0.0,
        keep_langs=("en", "und"), chunking="sentence", chunk_size=12, overlap=0,
    )
    chunks = [r["chunk"] for r in out.collect()]
    assert chunks
    for ch in chunks:
        assert ch.endswith(".")  # whole sentences only
        assert len(ch.split()) <= 12
