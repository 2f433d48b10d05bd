"""End-to-end corpus-prep pipeline over the harness documents table:
stage ordering, monotone row accounting, dedup/PII/chunk invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
from open_data_pipelines_spark.session import load_tables

from conftest import SF_SMOKE


def test_prepare_corpus_end_to_end(spark):
    chunked, stats = prepare_corpus(
        spark, SF_SMOKE, chunk_size=16, overlap=4, with_stats=True
    )
    rows = chunked.collect()
    assert rows, "pipeline produced no chunks"

    # monotone funnel: every stage only drops documents
    assert stats["input"] >= stats["quality_kept"] >= stats["exact_deduped"] >= stats["near_deduped"]
    assert stats["near_deduped"] > 0

    # schema contract
    assert chunked.columns == ["doc_id", "lang", "quality", "chunk_idx", "chunk"]

    # chunk windows respect the token bound; indices start at 0 per doc
    assert all(len(r["chunk"].split()) <= 16 for r in rows)
    first_idx = {}
    for r in rows:
        first_idx.setdefault(r["doc_id"], r["chunk_idx"])
    assert set(chunked.groupBy("doc_id").agg(F.min("chunk_idx").alias("m")).select("m").toPandas()["m"]) == {0}

    # quality/lang filters actually applied
    assert all(r["quality"] >= 0.5 and r["lang"] in ("en", "fr", "de") for r in rows)

    # normalization happened upstream of chunking (no uppercase, no runs)
    assert all(r["chunk"] == r["chunk"].lower() for r in rows)


def test_prepare_corpus_removes_planted_dups_and_pii(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    base = docs.limit(0)  # schema-compatible empty frame
    filler = (
        "the quick brown fox jumps over the lazy dog and the small dock "
        "near the old town square was busy that morning with traders "
    ) * 3
    rows = [
        (1, filler + "contact me at alice@example.com for details", "en", "s", 0),
        (2, filler + "contact me at alice@example.com   for details", "en", "s", 0),  # ws variant
        (3, filler + "an entirely different closing sentence for this text", "en", "s", 0),
    ]
    planted = spark.createDataFrame(rows, schema=base.schema)

    import open_data_pipelines_spark.plans.corpus_prep as cp

    orig = cp.load_tables
    cp.load_tables = lambda spark, sf, register_views=False: {"documents": planted}
    try:
        chunked = cp.prepare_corpus(spark, SF_SMOKE, chunk_size=32, overlap=0)
        out = chunked.collect()
    finally:
        cp.load_tables = orig

    kept_ids = {r["doc_id"] for r in out}
    # docs 1 and 2 are whitespace variants -> exact dedup keeps id 1;
    # doc 3 shares the long filler -> near-dup cluster keeps the minimum
    assert kept_ids == {1}
    # PII never reaches a chunk
    assert all("example.com" not in r["chunk"] for r in out)
    assert any("<email>" in r["chunk"] for r in out)


def test_prepare_corpus_full_optin_path(spark):
    """decontaminate -> rebalance -> split -> chunk -> pack, end to end."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    bench = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        chunk_size=16,
        overlap=0,
        with_stats=True,
        benchmark=bench,
        contamination_n=3,
        source_weights={"src0": 0.3, "src1": 0.3, "src2": 0.4},
        splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)),
        pack_budget=64,
    )
    rows = out.collect()
    assert rows, "opt-in pipeline produced no chunks"
    assert out.columns == [
        "doc_id", "lang", "quality", "split", "chunk_idx", "chunk",
        "pack_id", "pack_tokens",
    ]

    # funnel stays monotone through the new doc-level stages
    assert stats["near_deduped"] >= stats["decontaminated"] >= stats["rebalanced"]
    assert stats["chunks"] == stats["packed"] == len(rows)

    # split is a doc-level property: one label per doc across chunks
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_doc.values())
    assert set().union(*per_doc.values()) <= {"train", "val", "test"}

    # packs never cross splits (domain nests inside split)
    pack_splits = {}
    for r in rows:
        pack_splits.setdefault(r["pack_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in pack_splits.values())

    # pack budget respected (chunks are <=16 tokens, far under 64:
    # no oversize singletons possible)
    pack_tot = {}
    for r in rows:
        pack_tot[r["pack_id"]] = pack_tot.get(r["pack_id"], 0) + len(r["chunk"].split())
    assert all(t <= 64 for t in pack_tot.values())

    # benchmark docs (the planted contamination) are gone
    assert all(d % 37 != 0 for d in per_doc)


def test_prepare_corpus_upsample_variant(spark):
    """Repetition-based mixing: copies become their own documents but
    INHERIT the original doc's split (leak-proof), and only the
    training split is upsampled."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        chunk_size=16,
        overlap=0,
        with_stats=True,
        upsample_weights={"src0": 0.8, "src1": 0.2},
        splits=(("train", 0.9), ("val", 0.1)),
    )
    rows = out.collect()
    assert rows
    assert stats["upsampled"] > 0
    doc_ids = {r["doc_id"] for r in rows}
    # string composite re-key: "<orig>#<copy_idx>"
    assert all("#" in d for d in doc_ids)
    copies = {d for d in doc_ids if int(d.split("#")[1]) >= 1}
    assert copies, "expected re-keyed repetition copies"
    assert {r["split"] for r in rows} <= {"train", "val"}

    # leak-proofness: every copy of an original shares ONE split —
    # duplicated text never straddles the eval boundary
    by_orig: dict[str, set] = {}
    for r in rows:
        by_orig.setdefault(r["doc_id"].split("#")[0], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_orig.values())

    # only the training split is repeated; eval docs stay single-copy
    for r in rows:
        if int(r["doc_id"].split("#")[1]) >= 1:
            assert r["split"] == "train"


def test_prepare_corpus_upsample_no_splits_keeps_all_copies(spark):
    """Without splits the whole corpus upsamples; composite keys make
    copies distinct documents with no numeric-overflow collisions."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    out = prepare_corpus(
        spark,
        SF_SMOKE,
        chunk_size=16,
        overlap=0,
        upsample_weights={"src0": 0.8, "src1": 0.2},
    )
    doc_ids = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert any(int(d.split("#")[1]) >= 1 for d in doc_ids)


def test_observe_audit_matches_eager_counts(spark):
    """The single-pass observe() funnel must equal the per-stage
    count() funnel exactly — base path (VERDICT r4 task #6)."""
    _, eager = prepare_corpus(spark, SF_SMOKE, chunk_size=16, overlap=4, with_stats=True)
    _, observed = prepare_corpus(
        spark, SF_SMOKE, chunk_size=16, overlap=4,
        with_stats=True, stats_via="observe",
    )
    assert observed == eager


def test_observe_audit_with_perplexity_stage(spark):
    """Observe-mode stats must survive the perplexity path's internal
    reuse checkpoint. Regression (round-9 review find): the checkpoint
    of the cleaned/annotated prefix has NO shuffle between it and the
    input/quality observations, and an observation under a LAZY local
    checkpoint without an intervening shuffle is fulfilled with 0 —
    observe mode silently reported input=0/quality_kept=0 while count
    mode reported the true stage counts. The checkpoint is eager in
    observe mode now (caching.lazy_checkpoint docstring has the
    measured rule)."""
    from open_data_pipelines_spark.operators.lm_score import train_ngram_lm

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), "text")
    kwargs = dict(
        chunk_size=16,
        overlap=0,
        with_stats=True,
        perplexity_lm=lm,
        perplexity_max=5000.0,
    )
    out, observed = prepare_corpus(spark, SF_SMOKE, stats_via="observe", **kwargs)
    out.unpersist()
    _, eager = prepare_corpus(spark, SF_SMOKE, stats_via="count", **kwargs)
    assert observed == eager
    assert observed["input"] > 0 and observed["quality_kept"] > 0


def test_observe_audit_matches_eager_counts_optin(spark):
    """Same equality through the branchy opt-in path (anti-join reuse,
    split/upsample filter-union) — the shapes where a naive metrics
    collection would double-count."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    bench = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    kwargs = dict(
        chunk_size=16,
        overlap=0,
        with_stats=True,
        benchmark=bench,
        contamination_n=3,
        splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)),
        upsample_weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        pack_budget=64,
    )
    _, eager = prepare_corpus(spark, SF_SMOKE, **kwargs)
    _, observed = prepare_corpus(spark, SF_SMOKE, stats_via="observe", **kwargs)
    assert observed == eager


def test_stats_via_validated(spark):
    import pytest

    with pytest.raises(ValueError):
        prepare_corpus(spark, SF_SMOKE, with_stats=True, stats_via="bogus")


def test_repetition_stage_drops_boilerplate(spark):
    """Opt-in Gopher repetition stage: a planted duplicate-line spam
    doc drops while normal harness docs survive; the observe funnel
    carries the stage count."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    spam_body = "click here to win a prize now\n" * 40
    spam = spark.createDataFrame(
        [(99991, spam_body, "en", "s", len(spam_body))], schema=docs.schema
    )
    import open_data_pipelines_spark.plans.corpus_prep as cp

    planted = docs.unionByName(spam)
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=planted,
        chunk_size=16,
        overlap=0,
        with_stats=True,
        stats_via="observe",
        repetition_thresholds={},  # Gopher defaults
    )
    assert stats["quality_kept"] >= stats["repetition_kept"]
    assert stats["repetition_kept"] > 0
    assert out.filter(F.col("doc_id") == 99991).count() == 0
    # the stage costs docs, never invents them
    assert stats["repetition_kept"] >= stats["exact_deduped"]


def _planted_near_dups(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    mutated = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz mutated suffix")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs, docs.unionByName(mutated)


def test_near_dup_backend_simhash(spark):
    """SimHash backend drops the planted mutated copies (tiny token
    -profile delta -> small Hamming distance) through the same
    clustering endgame."""
    docs, planted = _planted_near_dups(spark)
    out, stats = prepare_corpus(
        spark, SF_SMOKE, docs=planted, chunk_size=16, overlap=0,
        with_stats=True, stats_via="observe", near_dup="simhash",
    )
    surviving = {int(r["doc_id"]) for r in out.select("doc_id").distinct().collect()}
    planted_ids = {r["doc_id"] + 20000 for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    dropped = planted_ids - surviving
    # the mutated copies overwhelmingly cluster with their originals
    assert len(dropped) >= 0.8 * len(planted_ids), (len(dropped), len(planted_ids))
    assert stats["exact_deduped"] >= stats["near_deduped"]


def test_near_dup_backend_embedding(spark):
    """Embedding backend: planted docs carry near-identical vectors to
    their originals; semantic pairs drop them even though the text
    differs."""
    docs, planted = _planted_near_dups(spark)
    emb = load_tables(spark, SF_SMOKE, register_views=False)["embeddings"].select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    near_vecs = emb.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.transform("embedding", lambda x: x + F.lit(0.0001)).alias("embedding"),
    )
    out = prepare_corpus(
        spark, SF_SMOKE, docs=planted, chunk_size=16, overlap=0,
        near_dup="embedding", embeddings=emb.unionByName(near_vecs),
        embedding_threshold=0.999,
    )
    surviving = {int(r["doc_id"]) for r in out.select("doc_id").distinct().collect()}
    planted_ids = {r["doc_id"] + 20000 for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    # quality/lang filters may drop some planted docs upstream; of the
    # planted ids that reached dedup, none survive their original
    assert not (surviving & planted_ids)


def test_near_dup_backend_semantic(spark):
    """SemDeDup backend (round 10): same planted near-identical
    vectors as the embedding test, found via k-means cluster-blocked
    exhaustive cosine instead of RP-LSH banding — near-parallel
    vectors land in the same k-means cell by construction, so the
    cluster-blocked comparison must catch every planted pair."""
    docs, planted = _planted_near_dups(spark)
    emb = load_tables(spark, SF_SMOKE, register_views=False)["embeddings"].select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    near_vecs = emb.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.transform("embedding", lambda x: x + F.lit(0.0001)).alias("embedding"),
    )
    out = prepare_corpus(
        spark, SF_SMOKE, docs=planted, chunk_size=16, overlap=0,
        near_dup="semantic", embeddings=emb.unionByName(near_vecs),
        embedding_threshold=0.999, semantic_k=8,
    )
    surviving = {int(r["doc_id"]) for r in out.select("doc_id").distinct().collect()}
    planted_ids = {r["doc_id"] + 20000 for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    assert not (surviving & planted_ids)


def test_near_dup_backend_none_and_unknown(spark):
    _, planted = _planted_near_dups(spark)
    _, stats = prepare_corpus(
        spark, SF_SMOKE, docs=planted, chunk_size=16, overlap=0,
        with_stats=True, stats_via="observe", near_dup="none",
    )
    assert stats["near_deduped"] == stats["exact_deduped"]
    import pytest

    with pytest.raises(ValueError):
        prepare_corpus(spark, SF_SMOKE, near_dup="bogus")


def test_mix_temperature_flattens_source_mix(spark):
    """prepare_corpus(mix_temperature=T) derives the target mix from
    the surviving corpus's own stratum sizes and downsamples toward
    the flattened proportions; passing both knobs is rejected."""
    import pytest
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    # skew the natural mix hard: 9 parts "web", 1 part "books"
    skewed = docs.withColumn(
        "source", F.when(F.col("doc_id") % 10 == 0, "books").otherwise("web")
    )
    out = prepare_corpus(
        spark, SF_SMOKE, docs=skewed, near_dup="none", mix_temperature=3.0
    )
    got = {
        r["s"]: r["n"]
        for r in out.select("doc_id")
        .distinct()
        .join(skewed.select("doc_id", "source"), "doc_id")
        .groupBy(F.col("source").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    share = got["books"] / (got["books"] + got["web"])
    assert share > 0.2  # natural ~10% flattened well upward at T=3

    with pytest.raises(ValueError):
        prepare_corpus(
            spark,
            SF_SMOKE,
            docs=skewed,
            near_dup="none",
            mix_temperature=2.0,
            source_weights={"web": 1.0},
        )


def test_observe_audit_with_boilerplate_stage(spark):
    """Round-8 regression: with the boilerplate stage on, the input
    observation used to read 0 — the strip's internal line-explode
    localCheckpoint swallowed it (RDD materialization bypasses SQL
    observed-metrics). Both audit modes must agree, and input must be
    the real corpus size (the strip is row-preserving)."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    n_docs = docs.count()
    kwargs = dict(chunk_size=16, overlap=4, with_stats=True,
                  boilerplate_min_docs=3, docs=docs)
    _, eager = prepare_corpus(spark, SF_SMOKE, **kwargs)
    out, observed = prepare_corpus(spark, SF_SMOKE, stats_via="observe", **kwargs)
    assert observed == eager
    assert observed["input"] == n_docs
    out.unpersist()


def _planted_docs(spark):
    """Docs with a shared banner PARAGRAPH and a shared 10-token
    passage inside otherwise-unique English-ish text."""
    banner = "Accept all cookies to continue reading"
    passage = "the quick brown fox jumps over the lazy sleeping dog"
    base = "the and for you that with this have from they " * 4
    rows = [
        (1, f"{banner}\n\n{base}alpha bravo. {passage}."),
        (2, f"{banner}\n\n{base}charlie delta. {passage}."),
        (3, f"{banner}\n\n{base}echo foxtrot."),
        (4, f"{base}golf hotel india."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_paragraph_stage_strips_shared_banner(spark):
    docs = _planted_docs(spark)
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=docs,
        paragraph_policy="max_docs",
        paragraph_max_docs=2,
        near_dup="none",
        chunk_size=64,
        with_stats=True,
    )
    # the banner paragraph is in 3 docs > 2: dropped everywhere; the
    # content paragraphs survive into chunks
    text = " ".join(r["chunk"] for r in out.collect())
    assert "accept all cookies" not in text
    assert "alpha bravo" in text
    # row-preserving stage: the observe/count note equals input
    assert stats["paragraph_deduped"] == stats["input"] == 4


def test_substring_stage_cuts_shared_passage(spark):
    docs = _planted_docs(spark)
    out, stats = prepare_corpus(
        spark,
        SF_SMOKE,
        docs=docs,
        substring_k=8,
        near_dup="none",
        chunk_size=64,
        with_stats=True,
    )
    chunks = {r["doc_id"]: [] for r in out.collect()}
    for r in out.collect():
        chunks[r["doc_id"]].append(r["chunk"])
    # doc 1 holds the passage's first occurrence; doc 2's copy is cut
    assert any("quick brown fox" in c for c in chunks.get(1, []))
    assert not any("quick brown fox" in c for c in chunks.get(2, []))
    assert stats["substring_deduped"] == stats["input"] == 4


def test_observe_audit_with_new_text_stages(spark):
    """Observe-mode stats must equal count-mode with BOTH round-10
    text stages enabled (they sit above the funnel's checkpoints, so
    this pins the row-preserving + observation-placement contracts)."""
    docs = _planted_docs(spark)
    kwargs = dict(
        docs=docs,
        paragraph_policy="keep_first",
        substring_k=8,
        boilerplate_min_docs=3,
        chunk_size=32,
        with_stats=True,
    )
    _, eager = prepare_corpus(spark, SF_SMOKE, **kwargs)
    out, observed = prepare_corpus(spark, SF_SMOKE, stats_via="observe", **kwargs)
    assert observed == eager
    assert observed["paragraph_deduped"] == observed["input"]
    assert observed["substring_deduped"] == observed["input"]
    out.unpersist()


def test_domain_cap_stage_bounds_head_domain(spark):
    """prepare_corpus(domain_cap=N) bounds every source post-dedup:
    the skewed head domain shrinks toward the cap while under-cap
    domains pass untouched, the stage is audited under both stats
    modes, and doc membership is deterministic across runs."""
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    skewed = docs.withColumn(
        "source", F.when(F.col("doc_id") % 10 == 0, "books").otherwise("web")
    )

    def domain_counts(out):
        return {
            r["s"]: r["n"]
            for r in out.select("doc_id")
            .distinct()
            .join(skewed.select("doc_id", "source"), "doc_id")
            .groupBy(F.col("source").alias("s"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    base = prepare_corpus(spark, SF_SMOKE, docs=skewed, near_dup="none")
    natural = domain_counts(base)
    cap = 50
    assert natural["web"] > 2 * cap and natural["books"] <= cap  # cap binds on web only

    out, stats = prepare_corpus(
        spark, SF_SMOKE, docs=skewed, near_dup="none", domain_cap=cap,
        with_stats=True, stats_via="count",
    )
    capped = domain_counts(out)
    assert capped["books"] == natural["books"]  # under-cap: untouched
    # expected-count trim: binomial around cap (sd ~ sqrt(50)); 5-sigma
    assert 15 <= capped["web"] <= 85
    assert stats["domain_capped"] < stats["near_deduped"]

    # observe-mode audit sees the same stage
    out2, stats2 = prepare_corpus(
        spark, SF_SMOKE, docs=skewed, near_dup="none", domain_cap=cap,
        with_stats=True, stats_via="observe",
    )
    n2 = out2.select("doc_id").distinct().count()
    out2.unpersist()
    assert stats2["domain_capped"] == stats["domain_capped"]
    # and membership is deterministic: same docs survive both runs
    a = {r[0] for r in out.select("doc_id").distinct().collect()}
    b = {r[0] for r in out2.select("doc_id").distinct().collect()}
    assert a == b and len(a) == n2


def test_model_futures_resolve_at_use(spark):
    """Round-15 overlap seam: trained gates passed as concurrent
    futures produce output identical to passing the models directly
    (prepare_corpus._resolve_model blocks exactly at each model's
    first use, after the model-independent prefix is built)."""
    from concurrent.futures import ThreadPoolExecutor

    from open_data_pipelines_spark.operators.lang_classifier import (
        fit_lang_classifier,
    )
    from open_data_pipelines_spark.operators.lm_score import train_ngram_lm

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    train = docs.select(F.lit("en").alias("__lbl"), "text")
    lang_model = fit_lang_classifier(train, "text", "__lbl", vocab_size=256)
    lm = train_ngram_lm(docs, "text")

    kwargs = dict(
        chunk_size=16,
        overlap=4,
        lang_model=lang_model,
        perplexity_lm=lm,
        perplexity_keep_buckets=("head", "middle", "tail"),
    )
    direct = prepare_corpus(spark, SF_SMOKE, **kwargs)
    with ThreadPoolExecutor(max_workers=2) as pool:
        via_futures = prepare_corpus(
            spark,
            SF_SMOKE,
            **{
                **kwargs,
                "lang_model": pool.submit(lambda: lang_model),
                "perplexity_lm": pool.submit(lambda: lm),
            },
        )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, via_futures.collect()))
    assert a == b and a
