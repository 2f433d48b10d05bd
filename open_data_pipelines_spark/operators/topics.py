"""Cluster-derived topic domains (engine extension; the reference has
no corpus operators — SURVEY.md §2 extensions).

Temperature mixing, per-domain caps, and stratified sampling all key
on a *domain* column — but web corpora often have no usable metadata
domain (one crawl source, millions of URLs). The public recipe is to
MAKE the domains: k-means over document embeddings, label each
document with its cluster, then run the ordinary mixing machinery on
the cluster label (cluster-balanced data selection — the same
move SemDeDup's blocking uses, pointed at curation instead of dedup).

Everything heavy is already distributed: training reads one bounded
sample per iteration (:func:`.ivf.train_centroids` — only the k × dim
mean table is ever collected), and assignment is a pure projection
(argmin over centroid literals) that pipelines with the embedding
scan. The docs ⋈ labels join is id-keyed and AQE-managed; documents
without an embedding get a sentinel domain instead of silently
vanishing, so the composition stays row-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import assign_list_id, train_centroids


def cluster_domains(
    docs: DataFrame,
    embeddings: DataFrame,
    *,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    iters: int = 3,
    out_col: str = "domain",
    unassigned: str = "unclustered",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Label every document with a k-means topic domain
    (``cluster_<id>``), trained on — and assigned from — the
    embeddings frame.

    Returns ``docs`` with ``out_col`` appended; documents missing an
    embedding are labeled ``unassigned`` (kept, never dropped — route
    them explicitly downstream). Pass ``centroids`` to reuse a trained
    bank (e.g. from a previous build, or the IVF index's — one
    clustering can serve search, SemDeDup, and mixing); otherwise a
    fresh deterministic bank is trained here.

    Feed the result straight into
    :func:`.sampling.temperature_weights` /
    :func:`.sampling.rebalance_to_mix` /
    :func:`.sampling.cap_per_stratum` with
    ``stratum_col=out_col`` — cluster-balanced selection without any
    metadata domain.
    """
    if out_col in docs.columns:
        raise ValueError(f"docs already has a {out_col!r} column")
    if centroids is None:
        centroids = train_centroids(embeddings, vec_col, vec_id, k=k, iters=iters)
    labels = embeddings.select(
        F.col(vec_id).alias(doc_id),
        F.concat(F.lit("cluster_"), assign_list_id(vec_col, centroids)).alias(
            out_col
        ),
    )
    # a duplicate vec_id would fan the left join out and duplicate doc
    # rows; collapse deterministically (min label, not dropDuplicates'
    # partition-order pick) so row preservation holds unconditionally —
    # only (id, label) pairs shuffle
    labels = labels.groupBy(doc_id).agg(F.min(out_col).alias(out_col))
    return docs.join(labels, doc_id, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(unassigned))
    )
