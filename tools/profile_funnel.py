"""Round-15 optimization probe: where does q_corpus_funnel's wall time go?

Decomposes one bench-identical pass into its construction-time actions
(checkpoint materializations, model-training collects, the boilerplate
auto probe) and the final noop execution, each timed separately with a
job description so an event log can attribute stages.

    python tools/profile_funnel.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from open_data_pipelines_spark.session import get_spark

    spark = get_spark("profile_funnel")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from open_data_pipelines_spark.operators.lm_score import train_ngram_lm
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus
    from open_data_pipelines_spark.queries.text import (
        _FUNNEL_BLOCKLIST,
        _FUNNEL_BLOCKWORDS,
        _FUNNEL_BL_MIN_DOCS,
        _FUNNEL_CHUNK,
        _FUNNEL_DECON_N,
        _FUNNEL_KEEP_LANGS,
        _FUNNEL_OVERLAP,
        _FUNNEL_PPL_BUCKETS,
        funnel_benchmark,
        funnel_lang_model,
        funnel_planted_docs,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if os.environ.get('PROFILE_PATCH'):
        patch_timers()
    for p in range(passes):
        label = "warmup" if p == 0 else f"pass{p}"
        t_all = time.perf_counter()
        marks: list[tuple[str, float]] = []

        def mark(name: str) -> None:
            marks.append((name, time.perf_counter()))

        mark("start")
        sc.setJobDescription(f"{label}: planted_docs build")
        docs, planted = funnel_planted_docs(spark, sf_dir)
        mark("build planted (lazy)")

        sc.setJobDescription(f"{label}: train_ngram_lm")
        lm = train_ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), "text")
        mark("train_ngram_lm")

        sc.setJobDescription(f"{label}: fit_lang_classifier")
        lang_model = funnel_lang_model(docs)
        mark("fit_lang_classifier")

        sc.setJobDescription(f"{label}: prepare_corpus construction")
        out = prepare_corpus(
            spark,
            sf_dir,
            docs=planted,
            url_col="url",
            html=True,
            fix_encoding=True,
            url_blocklist=_FUNNEL_BLOCKLIST,
            url_quality=True,
            content_blocklist=_FUNNEL_BLOCKWORDS,
            lang_model=lang_model,
            keep_langs=_FUNNEL_KEEP_LANGS,
            boilerplate_min_docs=_FUNNEL_BL_MIN_DOCS,
            perplexity_lm=lm,
            perplexity_keep_buckets=_FUNNEL_PPL_BUCKETS,
            perplexity_bucket_exact=True,
            benchmark=funnel_benchmark(spark),
            contamination_n=_FUNNEL_DECON_N,
            chunk_size=_FUNNEL_CHUNK,
            overlap=_FUNNEL_OVERLAP,
            max_bucket_size=None,
        )
        mark("prepare_corpus construction")

        sc.setJobDescription(f"{label}: final noop")
        noop(out)
        mark("final noop")
        sc.setJobDescription(None)
        spark.catalog.clearCache()

        total = time.perf_counter() - t_all
        print(f"== {label}: total {total:.3f}s")
        prev = marks[0][1]
        for name, t in marks[1:]:
            print(f"   {name:32s} {t - prev:7.3f}s")
            prev = t




def patch_timers() -> None:
    """Monkeypatch construction-time hot spots with wall timers."""
    import open_data_pipelines_spark.caching as caching
    import open_data_pipelines_spark.operators.boilerplate as bl
    import open_data_pipelines_spark.operators.lang_classifier as lc
    import open_data_pipelines_spark.operators.contamination as ct
    import open_data_pipelines_spark.operators.text_dedup as td

    def timed(mod, name):
        orig = getattr(mod, name)

        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            dt = time.perf_counter() - t0
            if dt > 0.05:
                print(f"      [{name}] {dt:.3f}s")
            return out

        setattr(mod, name, wrap)

    import open_data_pipelines_spark.operators.graph as gr
    import open_data_pipelines_spark.operators.lm_score as lm
    import open_data_pipelines_spark.operators.text_analysis as ta
    import open_data_pipelines_spark.operators.html_text as ht
    import open_data_pipelines_spark.operators.text_norm as tn
    import open_data_pipelines_spark.operators.url_filter as uf
    import open_data_pipelines_spark.plans.corpus_prep as cp
    timed(cp, "cluster_members")
    timed(lm, "perplexity_buckets")
    timed(cp, "minhash_lsh_dedup")
    timed(cp, "dedup_exact_text")
    timed(cp, "lazy_checkpoint")
    timed(cp, "annotate_text")
    timed(ht, "html_to_text")
    timed(tn, "with_normalized_text")
    timed(ta, "filter_content_blockwords")
    timed(uf, "filter_domain_blocklist")
    timed(uf, "filter_url_quality")
    timed(bl, "strip_boilerplate_lines")
    timed(lc, "predict_language")
    timed(ct, "decontaminate")
    timed(td, "scale_out")
    timed(caching, "lazy_checkpoint")


if __name__ == "__main__":
    main()
