"""Streaming corpus ingest parity: the drained stream funnel must
agree with the batch pipeline's pre-near-dup stages on the same data
(the suite's standard streaming-vs-batch substitution)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.text_analysis import doc_fingerprint
from open_data_pipelines_spark.operators.text_dedup import dedup_exact_text
from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.streaming.corpus_stream import (
    read_document_stream,
    stream_corpus_to_bronze,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def doc_landing(spark):
    """Two crawl drops; the second re-delivers every 5th doc (exact
    dups across micro-batches) plus a whitespace variant of doc 0."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    d = tempfile.mkdtemp(prefix="doc_landing_")
    docs.write.mode("overwrite").parquet(f"{d}/drop")
    redelivered = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    ws_variant = docs.filter(F.col("doc_id") == 0).select(
        F.lit(20000).alias("doc_id"),
        F.concat(F.lit("  "), F.regexp_replace("text", " ", "  ")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    redelivered.unionByName(ws_variant).write.mode("append").parquet(f"{d}/drop")
    return f"{d}/drop", docs


def test_streaming_funnel_matches_batch_stages(spark, doc_landing):
    landing, docs = doc_landing
    bronze_dir = tempfile.mkdtemp(prefix="bronze_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")

    q = stream_corpus_to_bronze(
        read_document_stream(spark, landing), f"{bronze_dir}/corpus", ckpt
    )
    q.awaitTermination(120)

    got = spark.read.parquet(f"{bronze_dir}/corpus")
    assert got.columns == [
        "doc_id", "text", "lang", "quality", "n_tokens", "source", "ingest_ts",
    ]

    # batch reference: same clean/annotate/filter stages, exact dedup
    from open_data_pipelines_spark.operators.text_analysis import (
        lang_id,
        normalize_text,
        quality_score,
        redact_pii,
    )

    planted = spark.read.parquet(landing)
    cleaned = planted.select(
        "doc_id", normalize_text(redact_pii("text")).alias("text")
    ).select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        quality_score("text").alias("quality"),
    )
    kept = cleaned.filter((F.col("quality") >= 0.5) & F.col("lang").isin("en", "fr", "de"))
    batch = dedup_exact_text(kept, "text", "doc_id")

    # keeper choice differs (first-seen vs min-id); the surviving
    # fingerprint SETS and their counts must agree exactly
    sfp = {r["fp"] for r in got.select(doc_fingerprint("text").alias("fp")).collect()}
    bfp = {r["fp"] for r in batch.select(doc_fingerprint("text").alias("fp")).collect()}
    assert sfp == bfp
    assert got.count() == len(sfp)  # one survivor per fingerprint

    # the one-survivor-per-fingerprint assertion above already proves
    # every re-delivered exact dup collapsed with its original; pin
    # the normalization case explicitly: doc 0's whitespace variant
    # (20000) and the original share a fingerprint — exactly one
    # of the pair survived
    zero_fp_rows = got.withColumn("fp", doc_fingerprint("text")).join(
        batch.filter(F.col("doc_id") == 0).select(doc_fingerprint("text").alias("fp")),
        "fp",
    )
    assert zero_fp_rows.count() == 1


def test_streaming_funnel_is_incremental(spark, doc_landing):
    """A second drain with a new file only appends the NEW novel docs
    (checkpointed progress + watermark dedup state)."""
    import shutil

    shared_landing, docs = doc_landing
    # private COPY of the landing dir: this test appends files, and
    # mutating the module-scoped fixture couples it to the parity test
    # reading the same directory (order/xdist flake — round-9
    # test-review find)
    landing = tempfile.mkdtemp(prefix="doc_landing_inc_") + "/drop"
    shutil.copytree(shared_landing, landing)
    bronze_dir = tempfile.mkdtemp(prefix="bronze2_")
    ckpt = tempfile.mkdtemp(prefix="ckpt2_")

    q = stream_corpus_to_bronze(
        read_document_stream(spark, landing), f"{bronze_dir}/corpus", ckpt
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{bronze_dir}/corpus").count()

    novel = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" entirely new trailing sentence for the stream"))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    redup = docs.filter(F.col("doc_id") == 1).withColumn("doc_id", F.lit(40000).cast("long"))
    novel.unionByName(redup).write.mode("append").parquet(landing)

    q2 = stream_corpus_to_bronze(
        read_document_stream(spark, landing), f"{bronze_dir}/corpus", ckpt
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(f"{bronze_dir}/corpus")
    # the three novel docs appended; the re-delivered dup of doc 1 did
    # not (same fingerprint within the watermark horizon)
    assert out.count() == n1 + 3
    assert out.filter(F.col("doc_id") >= 30000).count() == 3
    assert out.filter(F.col("doc_id") == 40000).count() == 0


def test_stream_then_compact_equals_batch_pipeline(spark):
    """The operational loop: stream-ingest the crawl drop (row-local
    funnel + exact dedup on arrival), then run the deferred batch
    compaction (MinHash near-dup + connected components + chunking)
    over bronze — and get EXACTLY the one-shot batch prepare_corpus
    result on the same files. The landing holds near-dup mutations
    (distinct ids, no exact re-deliveries), so survivor ids are
    deterministic and the comparison is row-for-row."""
    import tempfile

    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.streaming.corpus_stream import drain_and_compact

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    near_dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz mutated suffix")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    planted = docs.unionByName(near_dups)
    landing = tempfile.mkdtemp(prefix="compact_landing_")
    planted.write.mode("overwrite").parquet(f"{landing}/drop")

    streamed = drain_and_compact(
        spark,
        f"{landing}/drop",
        tempfile.mkdtemp(prefix="compact_bronze_") + "/corpus",
        tempfile.mkdtemp(prefix="compact_ckpt_"),
        near_dup="minhash",
    )
    batch = prepare_corpus(spark, SF_SMOKE, docs=planted, near_dup="minhash")

    cols = ["doc_id", "lang", "quality", "chunk_idx", "chunk"]
    assert streamed.columns == batch.columns == cols
    s_rows = {tuple(r) for r in streamed.select(*cols).collect()}
    b_rows = {tuple(r) for r in batch.select(*cols).collect()}
    assert s_rows == b_rows and len(s_rows) == streamed.count()


def test_compact_bronze_runs_domain_mix_over_bronze_source(spark):
    """ADVICE round-5: bronze must carry `source` so the compaction
    can run the domain-mix stages; a source_weights compaction over
    streamed bronze must not fail on a missing column."""
    import tempfile

    from open_data_pipelines_spark.streaming.corpus_stream import drain_and_compact

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    landing = tempfile.mkdtemp(prefix="mix_landing_")
    docs.write.mode("overwrite").parquet(f"{landing}/drop")
    out = drain_and_compact(
        spark,
        f"{landing}/drop",
        tempfile.mkdtemp(prefix="mix_bronze_") + "/corpus",
        tempfile.mkdtemp(prefix="mix_ckpt_"),
        near_dup="none",
        source_weights={"src0": 0.4, "src1": 0.3, "src2": 0.3},
    )
    assert out.count() > 0


def test_stream_corpus_with_near_dedup_rejects_at_ingest(spark, tmp_path):
    """Round-11 online admission: a second crawl drop's near-duplicate
    of an ADMITTED document is rejected at ingest by the persisted
    band index — no batch compaction needed — while fresh content and
    shingle-less shorts pass."""
    import time

    from open_data_pipelines_spark.streaming.corpus_stream import (
        stream_corpus_with_near_dedup,
    )
    from open_data_pipelines_spark.streaming.dedup_stream import read_admitted

    base = (
        "the quick brown fox jumps over the lazy dog and then naps "
        "in the warm afternoon sun beside the old garden wall"
    )
    fresh = (
        "colorless green ideas sleep furiously beneath heavy winter rain "
        "while distant thunder rolls across the silent valley floor"
    )
    rows1 = [(1, base, "en", "web", len(base))]
    # doc 2 is byte-identical (exact watermark dedup inside the batch
    # prefix), doc 3 is the SAME text re-keyed in a LATER drop (the
    # cross-drop near/exact dup the index must reject), doc 4 fresh
    rows2 = [(3, base, "en", "web", len(base)), (4, fresh, "en", "web", len(fresh))]
    landing = str(tmp_path / "landing")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows1, schema).repartition(1).write.parquet(landing)
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).repartition(1).write.mode("append").parquet(
        landing
    )

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q = stream_corpus_with_near_dedup(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        funnel_kwargs={"quality_min": 0.0},
    )
    q.awaitTermination(120)
    admitted = {
        r["doc_id"] for r in read_admitted(spark, str(tmp_path / "out")).collect()
    }
    assert admitted == {1, 4}
    # the funnel prefix's annotations ride into the admitted output
    cols = set(read_admitted(spark, str(tmp_path / "out")).columns)
    assert {"doc_id", "text", "lang", "quality", "n_tokens", "source"} <= cols


def test_streaming_perplexity_gate_matches_batch_filter(spark, doc_landing):
    """The on-arrival LM gate (Arrow-batched scorer, round 12) keeps
    exactly the docs the batch perplexity_filter keeps on the drained
    corpus, and the scorer's values match the JVM scoring path."""
    import tempfile as _tf

    from open_data_pipelines_spark.operators.lm_score import (
        perplexity_filter,
        perplexity_pandas_scorer,
        perplexity_score,
        train_ngram_lm,
    )
    from open_data_pipelines_spark.streaming.corpus_stream import (
        streaming_corpus_bronze,
    )

    landing, docs = doc_landing
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), "text")

    # value parity first: Arrow scorer vs JVM explode+join scorer
    jvm = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_score(docs, "text", "doc_id", lm).collect()
    }
    scorer = perplexity_pandas_scorer(lm)
    py = {
        r["doc_id"]: r["ppl"]
        for r in docs.select("doc_id", scorer(F.col("text")).alias("ppl")).collect()
    }
    assert set(jvm) == set(py)
    for d, v in jvm.items():
        if v is None:
            assert py[d] is None
        else:
            assert abs(py[d] - v) <= 1e-9 * max(1.0, abs(v)), d

    # gate parity: drained stream with the gate == batch filter over
    # the drained bronze (threshold at the score distribution's
    # middle so BOTH outcomes are populated)
    thr = sorted(v for v in jvm.values() if v is not None)[len(jvm) // 2]
    out = _tf.mkdtemp(prefix="bronze_ppl_")
    ckpt = _tf.mkdtemp(prefix="ckpt_ppl_")
    q = stream_corpus_to_bronze(
        read_document_stream(spark, landing), f"{out}/corpus", ckpt,
        perplexity_lm=lm, perplexity_max=thr,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/corpus")

    ungated_out = _tf.mkdtemp(prefix="bronze_noppl_")
    ungated_ckpt = _tf.mkdtemp(prefix="ckpt_noppl_")
    q2 = stream_corpus_to_bronze(
        read_document_stream(spark, landing), f"{ungated_out}/corpus", ungated_ckpt
    )
    q2.awaitTermination(120)
    bronze = spark.read.parquet(f"{ungated_out}/corpus")
    want = perplexity_filter(bronze, "text", "doc_id", lm, thr)

    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert got_ids == want_ids
    assert 0 < len(got_ids) < bronze.count()  # both outcomes populated


def test_perplexity_scorer_max_entries_guard(spark, doc_landing):
    import pytest as _pytest

    from open_data_pipelines_spark.operators.lm_score import (
        perplexity_pandas_scorer,
        train_ngram_lm,
    )
    from open_data_pipelines_spark.streaming.corpus_stream import (
        streaming_corpus_bronze,
    )

    _, docs = doc_landing
    lm = train_ngram_lm(docs.limit(20), "text")
    with _pytest.raises(ValueError, match="max_entries"):
        perplexity_pandas_scorer(lm, max_entries=1)
    with _pytest.raises(ValueError, match="threshold-only"):
        streaming_corpus_bronze(docs, perplexity_lm=lm)  # no max


def test_streaming_lang_gate_matches_batch_predictions(spark, tmp_path):
    """The on-arrival trained-langid gate keeps exactly the docs the
    BATCH predictor whitelists on the drained corpus (planted
    separable multilingual drop; margins clear float noise)."""
    from open_data_pipelines_spark.operators.lang_classifier import (
        fit_lang_classifier,
        lang_pandas_predictor,
        predict_language,
    )
    from open_data_pipelines_spark.streaming.corpus_stream import (
        streaming_corpus_bronze,
    )
    from tests.test_lang_classifier import _multilingual

    corpus = _multilingual(spark).withColumn("source", F.lit("web")).withColumn(
        "n_chars", F.length("text")
    ).select("doc_id", "text", "lang", "source", "n_chars")
    m = fit_lang_classifier(corpus, "text", "lang", n=3, vocab_size=1024)

    # value parity: closure predictor vs batch explode+join path
    batch_pred = {
        r.doc_id: r.pred_lang
        for r in predict_language(corpus, m, "text", "doc_id", ids_only=True).collect()
    }
    predictor = lang_pandas_predictor(m)
    stream_pred = {
        r.doc_id: r.p
        for r in corpus.select("doc_id", predictor(F.col("text")).alias("p")).collect()
    }
    assert stream_pred == batch_pred

    landing = str(tmp_path / "drop")
    corpus.write.parquet(landing)
    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    keep = ("en", "fr")
    q = stream_corpus_to_bronze(
        read_document_stream(spark, landing), out, ckpt,
        lang_model=m, keep_langs=keep + ("und",), quality_min=0.0,
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    want = {d for d, p in batch_pred.items() if p in keep}
    # the claimed-lang heuristic ALSO filters downstream (und kept in
    # the whitelist so only the trained gate separates languages here)
    assert got == want


def test_streaming_lang_gate_und_and_null(spark):
    from open_data_pipelines_spark.operators.lang_classifier import (
        fit_lang_classifier,
        lang_pandas_predictor,
    )
    from tests.test_lang_classifier import _multilingual

    m = fit_lang_classifier(_multilingual(spark), "text", "lang", n=3, vocab_size=256)
    pred = lang_pandas_predictor(m)
    df = spark.createDataFrame([(1, None), (2, ""), (3, "ab")], "i int, t string")
    got = {r.i: r.p for r in df.select("i", pred(F.col("t")).alias("p")).collect()}
    assert got == {1: "und", 2: "und", 3: "und"}


def test_streaming_funnel_survives_hard_kill_mid_batch(spark, doc_landing):
    """Round-15 (VERDICT r14 #6, the IVF/media discipline): recovery
    from a HARD KILL mid-batch — the worst crash point, after the
    sink's parquet append but before the checkpoint commit. Simulated
    the repo's established way (incremental-dedup test family):
    delete the newest ``commits/<n>`` marker (+ its hidden .crc) so
    the restarted query replays that exact micro-batch from the
    recorded offsets. The sink is at-least-once by design, so the
    replay APPENDS duplicates to bronze (asserted, to prove the kill
    simulation isn't vacuous); the documented protocol is that the
    fingerprint dedup collapses them at compaction — asserted here as
    no duplicate and no lost fingerprints vs the batch reference."""
    import os
    import shutil

    from open_data_pipelines_spark.operators.text_analysis import (
        lang_id,
        normalize_text,
        quality_score,
        redact_pii,
    )

    shared_landing, docs = doc_landing
    landing = tempfile.mkdtemp(prefix="doc_landing_kill_") + "/drop"
    shutil.copytree(shared_landing, landing)
    bronze_dir = tempfile.mkdtemp(prefix="bronze_kill_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_kill_")
    bronze_path = f"{bronze_dir}/corpus"

    q = stream_corpus_to_bronze(
        read_document_stream(spark, landing), bronze_path, ckpt
    )
    assert q.awaitTermination(120)

    # second drop lands; second drain commits it
    novel = docs.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh post-crash sentence")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    novel.write.mode("append").parquet(landing)
    q2 = stream_corpus_to_bronze(
        read_document_stream(spark, landing), bronze_path, ckpt
    )
    assert q2.awaitTermination(120)
    n_committed = spark.read.parquet(bronze_path).count()

    # the hard kill: the sink wrote the data batch, the commit marker
    # never landed, the process died. Each drain logs TWO batches
    # (data + the no-row watermark-advance flush), and on restart the
    # engine replays only the LATEST offsets entry (a commit-log gap
    # below it is ignored — measured while building this test), so
    # the rewind must make the data batch the latest: offsets
    # truncate to [0..2], commits to [0..1]. Hidden .crc siblings go
    # too or the marker rewrite fails with a misleading
    # multiple-queries error (repo gotcha, .claude/skills/verify).
    batches = sorted(
        int(n)
        for n in os.listdir(os.path.join(ckpt, "offsets"))
        if n.isdigit()
    )
    data_batch = batches[-2]
    for sub, keep in (("offsets", data_batch), ("commits", data_batch - 1)):
        d = os.path.join(ckpt, sub)
        for n in list(os.listdir(d)):
            core = n[1:-4] if (n.startswith(".") and n.endswith(".crc")) else n
            if core.isdigit() and int(core) > keep:
                os.remove(os.path.join(d, n))

    q3 = stream_corpus_to_bronze(
        read_document_stream(spark, landing), bronze_path, ckpt
    )
    assert q3.awaitTermination(120)

    bronze = spark.read.parquet(bronze_path)
    n_after = bronze.count()
    # at-least-once: the replayed batch re-appended — the kill was real
    assert n_after > n_committed

    # compaction's exact-dedup stage collapses the replay: one
    # survivor per fingerprint, and the fingerprint SET matches the
    # batch pipeline over the same landing content (nothing lost)
    surv = dedup_exact_text(bronze.select("doc_id", "text"), "text", "doc_id")
    sfp = {r["fp"] for r in surv.select(doc_fingerprint("text").alias("fp")).collect()}
    assert surv.count() == len(sfp)

    planted = spark.read.parquet(landing)
    cleaned = planted.select(
        "doc_id", normalize_text(redact_pii("text")).alias("text")
    ).select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        quality_score("text").alias("quality"),
    )
    kept = cleaned.filter(
        (F.col("quality") >= 0.5) & F.col("lang").isin("en", "fr", "de")
    )
    batch = dedup_exact_text(kept, "text", "doc_id")
    bfp = {r["fp"] for r in batch.select(doc_fingerprint("text").alias("fp")).collect()}
    assert sfp == bfp
