"""Trained char-n-gram language classifier vs a pure-Python naive
Bayes oracle (same prep, same vocabulary tie-break, same smoothing),
plus accuracy / invariance / plan-shape pins."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.lang_classifier import (
    LangClassifier,
    fit_lang_classifier,
    predict_language,
)
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["documents"]


@pytest.fixture(scope="module")
def model(spark, docs):
    return fit_lang_classifier(docs, "text", "lang", n=3, vocab_size=2048)


def _prepped(spark, docs):
    """Pull the SPARK-prepped texts so the oracle shares the exact
    lower/whitespace canonicalization (Java vs Python lower() can
    disagree on exotic code points — the oracle mirrors the math,
    not the JVM's Unicode tables)."""
    from open_data_pipelines_spark.operators.lang_classifier import prep_text

    return [
        (r.doc_id, r.lang, r.t)
        for r in docs.select("doc_id", "lang", prep_text("text").alias("t")).collect()
    ]


def _oracle_fit(rows, n, vocab_size, smoothing=0.5):
    grams_by_label: Counter = Counter()
    global_count: Counter = Counter()
    doc_count: Counter = Counter()
    for _, lbl, t in rows:
        doc_count[lbl] += 1
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            grams_by_label[(lbl, g)] += 1
            global_count[g] += 1
    vocab = set(
        g for g, _ in sorted(global_count.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    labels = sorted(doc_count)
    v1 = vocab_size + 1
    tot = {
        l: sum(c for (lbl, g), c in grams_by_label.items() if lbl == l and g in vocab)
        for l in labels
    }
    total_docs = sum(doc_count.values())
    priors = {l: math.log(doc_count[l] / total_docs) for l in labels}
    denom = {l: tot[l] + smoothing * v1 for l in labels}
    unk = {l: math.log(smoothing / denom[l]) for l in labels}
    table = {
        (g, lbl): math.log((c + smoothing) / denom[lbl])
        for (lbl, g), c in grams_by_label.items()
        if g in vocab
    }
    return labels, priors, unk, table


def _oracle_score(t, n, labels, priors, unk, table):
    grams = [t[i : i + n] for i in range(len(t) - n + 1)]
    best = None
    for l in labels:
        s = priors[l]
        for g in grams:
            s += table.get((g, l), unk[l])
        # mirrored tie-break: max over (score, label)
        if best is None or (s, l) > best:
            best = (s, l)
    return best


def test_model_matches_oracle(spark, docs, model):
    rows = _prepped(spark, docs)
    labels, priors, unk, table = _oracle_fit(rows, 3, 2048)
    assert model.labels == tuple(labels)
    for l in labels:
        assert model.priors[l] == pytest.approx(priors[l], rel=1e-12)
        assert model.unk[l] == pytest.approx(unk[l], rel=1e-12)
    assert set(model.table) == set(table)
    for k, v in table.items():
        assert model.table[k] == pytest.approx(v, rel=1e-12)


def test_predictions_match_oracle(spark, docs, model):
    rows = _prepped(spark, docs)
    labels, priors, unk, table = _oracle_fit(rows, 3, 2048)
    got = {
        r.doc_id: (r.pred_lang, r.lang_logp)
        for r in predict_language(
            docs, model, "text", "doc_id", score_col="lang_logp"
        ).collect()
    }
    for doc_id, _, t in rows:
        want_score, want_label = _oracle_score(t, 3, labels, priors, unk, table)
        pred, score = got[doc_id]
        assert pred == want_label, doc_id
        assert score == pytest.approx(want_score, rel=1e-9)


_POOLS = {
    "en": "the quick brown fox jumps over a lazy dog and runs with great speed toward the old barn every morning".split(),
    "fr": "le chat est sur la table et il dort avec une grande joie pendant que nous mangeons du pain chaud".split(),
    "de": "der hund läuft schnell durch den wald und über die wiese während wir heute abend zusammen essen".split(),
    "es": "el perro corre por la casa y come con mucho gusto mientras nosotros hablamos despacio esta noche".split(),
    "zh": list("的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动"),
}


def _multilingual(spark, per_lang=60, seed=7):
    import random

    rng = random.Random(seed)
    rows, i = [], 0
    for lang, pool in _POOLS.items():
        for _ in range(per_lang):
            n_words = rng.randrange(15, 40)
            sep = "" if lang == "zh" else " "
            rows.append((i, sep.join(rng.choice(pool) for _ in range(n_words)), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_label_recovery_on_separable_corpus(spark):
    """The harness documents table carries RANDOM lang tags over one
    shared word pool (not separable by construction — a classifier
    that 'recovered' those labels would be broken). Accuracy is
    asserted on a genuinely multilingual planted corpus instead."""
    corpus = _multilingual(spark)
    m = fit_lang_classifier(corpus, "text", "lang", n=3, vocab_size=1024)
    out = predict_language(corpus, m, "text", "doc_id")
    n = corpus.count()
    hits = out.filter(F.col("pred_lang") == F.col("lang")).count()
    assert hits / n >= 0.98, f"accuracy {hits}/{n}"
    # held-out: fresh draws from the same pools
    held = _multilingual(spark, per_lang=20, seed=99)
    out2 = predict_language(held, m, "text", "doc_id")
    hits2 = out2.filter(F.col("pred_lang") == F.col("lang")).count()
    assert hits2 / held.count() >= 0.95


def test_partitioning_invariance(spark, docs, model):
    a = {
        r.doc_id: r.pred_lang
        for r in predict_language(docs, model, "text", "doc_id").collect()
    }
    b = {
        r.doc_id: r.pred_lang
        for r in predict_language(docs.repartition(7), model, "text", "doc_id").collect()
    }
    assert a == b


def test_round_trip_and_empty_text(spark):
    m = fit_lang_classifier(_multilingual(spark), "text", "lang", n=3, vocab_size=1024)
    model2 = LangClassifier.from_dict(m.to_dict())
    assert model2 == m
    df = spark.createDataFrame(
        [(1, "le chat est sur la table et il dort"), (2, ""), (3, None), (4, "ab")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.pred_lang for r in predict_language(df, model2, "text", "doc_id").collect()}
    assert got[1] == "fr"
    assert got[2] == "und"
    assert got[3] == "und"
    # 2 chars < n=3 -> no grams -> und
    assert got[4] == "und"


def test_plan_shape(docs, model):
    plan = (
        predict_language(docs, model, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # model join never shuffles the model
    # the FINAL enrichment join (per-doc predictions back onto docs)
    # is big-big by design and may plan as SMJ pre-AQE; the assertion
    # above is the scale-critical one (the model side must broadcast)
    # round-15 representation contract (functions/dimframe.py): in
    # production the model frame is an Arrow LocalRelation — broadcast
    # builds collect driver rows with no job and no Python worker —
    # while the explain-audit kill switch keeps the round-13 opaque
    # RDD form (a checkpoint-free composition re-embeds the gate
    # subtree per consumer; driver-held rows riding every copy were
    # the 25-minute optimizer-grind hazard)
    assert "LocalTableScan" in plan
    import os
    from unittest import mock

    with mock.patch.dict(os.environ, {"SPARK_GRAFT_NO_INTERNAL_CHECKPOINT": "1"}):
        audit_plan = (
            predict_language(docs, model, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
    assert "LocalTableScan" not in audit_plan
    assert "Scan ExistingRDD" in audit_plan


def test_ids_only_single_shuffle(spark, docs, model):
    """Round-13 plan rewrite: the whole scoring path is ONE shuffle —
    gram explode, broadcast model join, a single per-doc pivoted
    aggregation with an expression argmax. The old shape paid three
    (per-(doc,gram) counts, per-(doc,label) mass, a corpus-sized
    doc x label grid join). An extra exchange may appear only for the
    under-partitioned-input spread, which must itself vanish on a
    wide input."""
    compact = predict_language(docs, model, "text", "doc_id", ids_only=True)
    plan = compact._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    # docs fixture is small (under-partitioned): agg shuffle + spread
    assert shuffles <= 2
    assert "SortMergeJoin" not in plan  # no grid join anywhere

    wide = docs.repartition(spark.sparkContext.defaultParallelism)
    plan_wide = (
        predict_language(wide, model, "text", "doc_id", ids_only=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # already-wide input: the conditional spread is a no-op, leaving
    # exactly the ONE aggregation exchange (plus the caller's own
    # repartition above)
    agg_shuffles = (
        plan_wide.count("Exchange")
        - plan_wide.count("BroadcastExchange")
        - plan_wide.count("RoundRobinPartitioning")
    )
    assert agg_shuffles == 1


def test_ids_only_matches_enriched(spark, docs, model):
    full = {
        r.doc_id: r.pred_lang
        for r in predict_language(docs, model, "text", "doc_id").collect()
    }
    compact = predict_language(docs, model, "text", "doc_id", ids_only=True)
    assert sorted(compact.columns) == ["doc_id", "pred_lang"]
    got = {r.doc_id: r.pred_lang for r in compact.collect()}
    assert got == full


def test_funnel_language_gate(spark):
    """prepare_corpus(lang_model=...): only documents the trained
    model tags as a keep_langs language survive, and the gate catches
    the es-as-fr class the stopword heuristic provably leaks."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    corpus = _multilingual(spark).withColumn("source", F.lit("web")).withColumn(
        "n_chars", F.length("text")
    ).select("doc_id", "text", "lang", "source", "n_chars")
    m = fit_lang_classifier(corpus, "text", "lang", n=3, vocab_size=1024)
    kw = dict(chunk_size=16, overlap=0, near_dup="none", docs=corpus)
    gated, stats = prepare_corpus(
        spark, SF_SMOKE, lang_model=m, keep_langs=("en", "fr"),
        with_stats=True, stats_via="observe", **kw
    )
    kept_langs = {r.lang for r in gated.select("lang").distinct().collect()}
    assert kept_langs == {"en", "fr"}
    assert stats["lang_kept"] == 120  # 60 en + 60 fr at full recovery

    # control: same whitelist, NO model. The downstream stopword
    # heuristic (annotate_text/lang_id) mis-tags the SPANISH docs as
    # French ("la" is on the fr stopword list; es has no list), so
    # they leak through keep_langs=("en","fr"). The trained gate
    # catches exactly that class. Spanish ids are 180-239.
    control = prepare_corpus(
        spark, SF_SMOKE, keep_langs=("en", "fr"), chunk_size=16, overlap=0,
        near_dup="none", docs=corpus, quality_min=0.0,
    )
    es = (F.col("doc_id") >= 180) & (F.col("doc_id") < 240)
    assert control.filter(es).count() > 0  # heuristic leaks es-as-fr
    caught = prepare_corpus(
        spark, SF_SMOKE, lang_model=m, keep_langs=("en", "fr"), chunk_size=16,
        overlap=0, near_dup="none", docs=corpus, quality_min=0.0,
    )
    assert caught.filter(es).count() == 0  # trained gate drops them

    with pytest.raises(ValueError, match="keep_langs"):
        prepare_corpus(spark, SF_SMOKE, lang_model=m, keep_langs=(), **kw)


def test_caller_temp_column_collision(spark):
    """A caller frame already carrying __t/__total/__pred must come
    through intact (derived temp names, repo convention)."""
    m = fit_lang_classifier(_multilingual(spark), "text", "lang", n=3, vocab_size=256)
    df = spark.createDataFrame(
        [(1, "le chat est sur la table et il dort", "keepA", 7, "keepB")],
        "doc_id int, text string, __t string, __total int, __pred string",
    )
    out = predict_language(df, m, "text", "doc_id").collect()[0]
    assert (out["__t"], out["__total"], out["__pred"]) == ("keepA", 7, "keepB")
    assert out.pred_lang == "fr"
    compact = predict_language(df, m, "text", "doc_id", ids_only=True)
    assert sorted(compact.columns) == ["doc_id", "pred_lang"]


def test_many_label_grouped_shape(spark):
    """Round-14 scale point (VERDICT r13 #4): at a CCNet-realistic
    label cardinality the r13 pivot stops scaling (its 2-per-label
    conditional aggregates are evaluated against every joined gram
    row — 742 µs/row at 64 labels vs ~9 at 3, STRESS round 14), so
    above ``pivot_max_labels`` scoring switches to the GROUPED shape:
    per-(doc,label) exact scores over matched rows + per-doc argmax +
    a closed-form absent-label maximum. Exactly TWO aggregation
    exchanges, O(1) aggregates, still no doc x label grid join, and
    the predictions are exact. Corpus: 64 synthetic languages whose
    words carry label-distinctive trigrams."""
    n_labels = 64
    labels = [f"l{i:02d}" for i in range(n_labels)]
    rows = [
        (d, lbl, " ".join(f"w{i:02d}x{j}" for j in range(12)))
        for d, (i, lbl) in enumerate(
            (i, lbl) for i in range(n_labels) for lbl in [labels[i]] for _ in range(4)
        )
    ]
    df = spark.createDataFrame(
        [(d, lbl, t) for d, lbl, t in rows], "doc_id long, lang string, text string"
    )
    model = fit_lang_classifier(df, "text", "lang", n=3, vocab_size=4096)
    assert len(model.labels) == n_labels

    wide = df.repartition(spark.sparkContext.defaultParallelism)
    compact = predict_language(wide, model, "text", "doc_id", ids_only=True)
    plan = compact._jdf.queryExecution().executedPlan().toString()
    agg_shuffles = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("RoundRobinPartitioning")
    )
    # the grouped shape: (doc,label) agg + doc argmax — exchange count
    # must not grow with label cardinality beyond these two
    assert agg_shuffles == 2
    assert "SortMergeJoin" not in plan

    got = {r.doc_id: r.pred_lang for r in compact.collect()}
    want = {d: lbl for d, lbl, _ in rows}
    assert got == want


def test_grouped_shape_matches_pivot(spark, docs, model):
    """Forcing the grouped shape on the pivot-sized harness corpus
    must reproduce the pivot path's predictions AND scores (the two
    shapes compute the same algebra; only the aggregation layout
    differs — scores agree to aggregation-order float noise)."""
    pivot = {
        r.doc_id: (r.pred_lang, r.s)
        for r in predict_language(
            docs, model, "text", "doc_id", ids_only=True, score_col="s"
        ).collect()
    }
    grouped = {
        r.doc_id: (r.pred_lang, r.s)
        for r in predict_language(
            docs, model, "text", "doc_id", ids_only=True, score_col="s",
            pivot_max_labels=0,
        ).collect()
    }
    assert set(pivot) == set(grouped)
    for d, (lbl, s) in pivot.items():
        g_lbl, g_s = grouped[d]
        assert g_lbl == lbl, d
        if s is None:
            assert g_s is None
        else:
            assert g_s == pytest.approx(s, rel=1e-9)


def test_pandas_predictor_short_doc_edges(spark):
    """Round-14 review: with min_ngrams <= 0 a doc shorter than n is
    legitimately admitted and must score as priors-only (the scalar
    form's empty loop) — the first vectorized form crashed
    sliding_window_view on an all-short batch. Scalar semantics:
    total = len - n + 1 may be NEGATIVE; total < min_ngrams -> 'und',
    otherwise zero windows -> priors argmax."""
    from open_data_pipelines_spark.operators.lang_classifier import (
        lang_pandas_predictor,
    )

    m = fit_lang_classifier(_multilingual(spark), "text", "lang", n=3, vocab_size=256)
    prior_argmax = max(m.labels, key=lambda l: (m.priors[l], l))
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a"), (4, "ab"), (5, "le chat est sur la table")],
        "doc_id int, text string",
    )
    p0 = lang_pandas_predictor(m, min_ngrams=0)
    got0 = {
        r.doc_id: r.p
        for r in df.select("doc_id", p0(F.col("text")).alias("p")).collect()
    }
    # None -> und; ""/"a" have total < 0 < min_ngrams -> und;
    # "ab" has total == 0 == min_ngrams -> priors argmax
    assert got0[1] == "und" and got0[2] == "und" and got0[3] == "und"
    assert got0[4] == prior_argmax
    assert got0[5] == "fr"
    # an ALL-short batch (zero windows anywhere) must not crash
    short = spark.createDataFrame([(1, "a"), (2, "bc")], "doc_id int, text string")
    got_s = {
        r.doc_id: r.p
        for r in short.select("doc_id", p0(F.col("text")).alias("p")).collect()
    }
    assert got_s == {1: "und", 2: prior_argmax}


def test_grouped_shape_invalid_table_falls_back(spark):
    """Round-15 review: the grouped shape's closed-form absent-label
    maximum assumes every stored (gram, label) log-prob >= that
    label's unk log-prob. A from_dict model violating it (possible
    for externally-built tables; impossible for fit_lang_classifier
    output) would silently mispredict in the grouped shape —
    predict_language must detect the violation, warn, and fall back
    to the exact pivot shape."""
    p0 = math.log(0.5)
    m = LangClassifier.from_dict(
        {
            "n": 2,
            "labels": ["en", "fr"],
            "priors": {"en": p0, "fr": p0},
            # en's stored gram log-prob (-20) is BELOW its unk (-1):
            # the grouped absent-formula would credit en with p0-1 and
            # steal the argmax from fr's true p0-2
            "unk": {"en": -1.0, "fr": -3.0},
            "table": [["ab", "en", -20.0], ["ab", "fr", -2.0]],
        }
    )
    df = spark.createDataFrame([(1, "ab")], "doc_id int, text string")
    with pytest.warns(UserWarning, match="grouped scoring shape"):
        got = predict_language(
            df, m, "text", "doc_id", ids_only=True, score_col="s",
            pivot_max_labels=0,
        ).collect()
    assert got[0].pred_lang == "fr"
    assert got[0].s == pytest.approx(p0 - 2.0, rel=1e-12)
    # a VALID table (every stored logp >= unk) still takes the grouped
    # shape silently at the same pivot_max_labels
    ok = LangClassifier.from_dict(
        {
            "n": 2,
            "labels": ["en", "fr"],
            "priors": {"en": p0, "fr": p0},
            "unk": {"en": -21.0, "fr": -3.0},
            "table": [["ab", "en", -20.0], ["ab", "fr", -2.0]],
        }
    )
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        got2 = predict_language(
            df, ok, "text", "doc_id", ids_only=True, pivot_max_labels=0
        ).collect()
    assert got2[0].pred_lang == "fr"
