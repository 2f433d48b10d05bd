"""Round-13 funnel fold guards: the corpus_funnel driver row now
carries the C4-style content-blockword gate and the CCNet
trained-langid gate. These tests pin the three facts the fold's
cross-engine hash parity rests on:

1. Both gates are LOAD-BEARING at the smoke SF: the blockword stage
   drops the injected residues, the trained gate drops the planted
   mislabeled 'zz' branch (docs the stopword heuristic calls 'en'
   with quality 1.0 — they would reach the output hash if the gate
   regressed to a no-op), and every stage count is observed non-zero
   in the right order.
2. The NB argmax is nowhere near a float tie: min top-2 score margin
   on the actual gated corpus is hundreds of nats (measured 198 for
   real docs / 1011 for zz docs at sf0.001) — cross-engine
   aggregation-order noise is ~1e-9 relative.
3. The Spark prediction equals a pure-Python NB oracle on the same
   model for every gated doc (the argmax the DuckDB mirror replays).
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _planted(spark):
    # the driver row's OWN planting (round 14: shared helper — the
    # input is a full markup page; see funnel_planted_docs)
    from open_data_pipelines_spark.queries.text import funnel_planted_docs

    return funnel_planted_docs(spark, SF_SMOKE)


def _gate_input(planted):
    """The trained gate's actual input in the funnel: the markup page
    AFTER extraction + mojibake repair (prepare_corpus runs the NB
    gate downstream of html/fix_encoding)."""
    from open_data_pipelines_spark.operators.html_text import html_to_text
    from open_data_pipelines_spark.operators.text_norm import with_normalized_text

    # form=None mirrors prepare_corpus(unicode_form=None): the funnel
    # never runs the NFC pass, so neither may the margin pin's input
    return with_normalized_text(
        planted.withColumn("text", html_to_text("text")),
        "text",
        fix_encoding=True,
        form=None,
    )


def test_funnel_gates_load_bearing(spark):
    from open_data_pipelines_spark.operators.lm_score import train_ngram_lm
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.queries.text import (
        _FUNNEL_BL_MIN_DOCS,
        _FUNNEL_BLOCKLIST,
        _FUNNEL_BLOCKWORDS,
        _FUNNEL_CHUNK,
        _FUNNEL_KEEP_LANGS,
        _FUNNEL_OVERLAP,
        _FUNNEL_PPL_BUCKETS,
        funnel_lang_model,
    )

    docs, planted = _planted(spark)
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), "text")
    model = funnel_lang_model(docs)
    out, stats = prepare_corpus(
        spark, SF_SMOKE, docs=planted,
        url_col="url", url_blocklist=_FUNNEL_BLOCKLIST, url_quality=True,
        html=True, fix_encoding=True,
        content_blocklist=_FUNNEL_BLOCKWORDS, lang_model=model,
        keep_langs=_FUNNEL_KEEP_LANGS,
        boilerplate_min_docs=_FUNNEL_BL_MIN_DOCS,
        perplexity_lm=lm, perplexity_keep_buckets=_FUNNEL_PPL_BUCKETS,
        perplexity_bucket_exact=True,
        chunk_size=_FUNNEL_CHUNK, overlap=_FUNNEL_OVERLAP, max_bucket_size=None,
        with_stats=True, stats_via="observe",
    )
    try:
        # each gate strictly cuts: URL gate < planted, blockwords <
        # URL survivors, trained lang < blockword survivors; the
        # lang_kept observation is materialized (it read 0 before the
        # round-13 eager checkpoint) and equals the boilerplate-stage
        # input by row-preservation
        assert stats["blockword_kept"] < stats["url_kept"]
        assert 0 < stats["lang_kept"] < stats["blockword_kept"]
        assert stats["lang_kept"] == stats["input"]
        # every zz doc is gone from the output
        assert out.filter(F.col("doc_id") >= 30000).count() == 0
    finally:
        out.unpersist()

    # the planted zz branch would OTHERWISE reach the output: same
    # funnel with the trained gate off keeps some doc_id>=30000 rows
    # (they pass the stopword lang filter by construction) — this is
    # what makes the gate load-bearing in the driver hash
    control = prepare_corpus(
        spark, SF_SMOKE, docs=planted,
        url_col="url", url_blocklist=_FUNNEL_BLOCKLIST, url_quality=True,
        html=True, fix_encoding=True,
        content_blocklist=_FUNNEL_BLOCKWORDS,
        keep_langs=_FUNNEL_KEEP_LANGS,
        boilerplate_min_docs=_FUNNEL_BL_MIN_DOCS,
        chunk_size=_FUNNEL_CHUNK, overlap=_FUNNEL_OVERLAP, max_bucket_size=None,
    )
    assert control.filter(F.col("doc_id") >= 30000).count() > 0

    # and the blockword branch likewise: gate off -> injected docs
    # survive with their mutated text
    no_bw = prepare_corpus(
        spark, SF_SMOKE, docs=planted,
        url_col="url", url_blocklist=_FUNNEL_BLOCKLIST, url_quality=True,
        html=True, fix_encoding=True,
        lang_model=model, keep_langs=_FUNNEL_KEEP_LANGS,
        boilerplate_min_docs=_FUNNEL_BL_MIN_DOCS,
        chunk_size=_FUNNEL_CHUNK, overlap=_FUNNEL_OVERLAP, max_bucket_size=None,
    )
    hits = no_bw.filter(F.col("chunk").contains("casino")).count()
    assert hits > 0


def _py_scores(model, text):
    t = _WS.sub(" ", text.lower()).strip(" ")
    n = model.n
    total = max(len(t) - n + 1, 0)
    scores = {}
    for lbl in model.labels:
        s = model.priors[lbl]
        for i in range(total):
            p = model.table.get((t[i : i + n], lbl))
            s += p if p is not None else model.unk[lbl]
        scores[lbl] = s
    return scores, total


def test_nb_margin_dwarfs_cross_engine_noise(spark):
    """Min top-2 score gap on the funnel's own gated corpus must be
    orders of magnitude above the ~1e-9-relative aggregation-order
    noise — the fact that lets the oracle replay the argmax in DuckDB
    without a tie hazard. Also pins Spark prediction == pure-Python
    NB oracle for every doc."""
    from open_data_pipelines_spark.operators.lang_classifier import predict_language
    from open_data_pipelines_spark.queries.text import funnel_lang_model

    docs, planted = _planted(spark)
    model = funnel_lang_model(docs)
    gated_in = _gate_input(planted)
    rows = gated_in.select("doc_id", "text").collect()
    margins, zz_margins, want = [], [], {}
    for r in rows:
        scores, total = _py_scores(model, r.text)
        ordered = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)
        gap = ordered[0][1] - ordered[1][1]
        (zz_margins if r.doc_id >= 30000 else margins).append(gap)
        want[r.doc_id] = "und" if total < 1 else ordered[0][0]
    assert min(margins) > 50.0  # measured 198 nats at sf0.001
    assert min(zz_margins) > 500.0  # measured 1011 nats
    # zz branch is decisively 'zz', everything real decisively 'en'
    assert all(p == "zz" for d, p in want.items() if d >= 30000)
    assert all(p == "en" for d, p in want.items() if d < 30000)

    got = {
        r["doc_id"]: r["pred_lang"]
        for r in predict_language(
            gated_in, model, "text", "doc_id", ids_only=True
        ).collect()
    }
    assert got == want


def test_zz_branch_passes_heuristic_gates(spark):
    """The planted zz docs are only a trained-gate test if they would
    SURVIVE every heuristic stage: stopword lang_id must call them
    'en' and the rule-based quality score must clear the funnel's
    0.5 threshold."""
    from open_data_pipelines_spark.operators.text_analysis import (
        lang_id,
        normalize_text,
        quality_score,
        redact_pii,
    )
    from open_data_pipelines_spark.queries.text import _FUNNEL_ZZ_SQL, _docs

    docs = _docs(spark, SF_SMOKE)
    zz = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select((F.col("doc_id") + 30000).alias("doc_id"))
        .withColumn("text", F.expr(_FUNNEL_ZZ_SQL))
        .select("doc_id", normalize_text(redact_pii("text")).alias("text"))
    )
    checked = zz.select(
        lang_id("text").alias("lang"), quality_score("text").alias("q")
    ).collect()
    assert checked
    assert all(r.lang == "en" for r in checked)
    assert all(r.q >= 0.5 for r in checked)


def test_funnel_decon_load_bearing(spark):
    """Round-15 fold: benchmark decontamination runs inside the
    driver row. Pins the branch semantics the oracle hash rests on:
    residue-1 mod 23 docs (full 8-token leak span appended → exact
    8-gram collision with the benchmark) are GONE from the output;
    residue-2 docs (first 7 tokens only → shared 7-gram, no shared
    8-gram) SURVIVE — a detector that widened to 7-grams or matched
    non-contiguous token subsets would drop them and move the hash.
    Control run with decon off shows residue-1 docs would otherwise
    reach the output (the load-bearing direction)."""
    from open_data_pipelines_spark.operators.lm_score import train_ngram_lm
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.queries.text import (
        _FUNNEL_BL_MIN_DOCS,
        _FUNNEL_BLOCKLIST,
        _FUNNEL_BLOCKWORDS,
        _FUNNEL_CHUNK,
        _FUNNEL_DECON_N,
        _FUNNEL_KEEP_LANGS,
        _FUNNEL_OVERLAP,
        _FUNNEL_PPL_BUCKETS,
        funnel_benchmark,
        funnel_lang_model,
    )

    docs, planted = _planted(spark)
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), "text")
    model = funnel_lang_model(docs)
    kwargs = dict(
        docs=planted,
        url_col="url", url_blocklist=_FUNNEL_BLOCKLIST, url_quality=True,
        html=True, fix_encoding=True,
        content_blocklist=_FUNNEL_BLOCKWORDS, lang_model=model,
        keep_langs=_FUNNEL_KEEP_LANGS,
        boilerplate_min_docs=_FUNNEL_BL_MIN_DOCS,
        perplexity_lm=lm, perplexity_keep_buckets=_FUNNEL_PPL_BUCKETS,
        perplexity_bucket_exact=True,
        chunk_size=_FUNNEL_CHUNK, overlap=_FUNNEL_OVERLAP,
        max_bucket_size=None,
    )
    out = prepare_corpus(
        spark, SF_SMOKE,
        benchmark=funnel_benchmark(spark),
        contamination_n=_FUNNEL_DECON_N,
        **kwargs,
    )
    kept = out.groupBy((F.col("doc_id") % 23).alias("r")).count().collect()
    by_res = {r.r: r["count"] for r in kept}
    # every exact-overlap doc dropped, near-miss survivors present
    assert by_res.get(1, 0) == 0
    assert by_res.get(2, 0) > 0

    # decon OFF: residue-1 docs reach the output (they pass every
    # other gate by construction — the stage is load-bearing)
    control = prepare_corpus(spark, SF_SMOKE, **kwargs)
    assert control.filter(F.col("doc_id") % 23 == 1).count() > 0
