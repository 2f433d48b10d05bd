"""SemDeDup-style semantic deduplication (engine extension; the
reference has no vector operations — SURVEY.md §2 extensions).

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means
cluster the embedding space, compare pairs ONLY within a cluster,
call pairs above a cosine threshold semantic duplicates, and keep one
representative per duplicate group — the clustering is what makes
web-scale feasible, turning an O(n²) comparison into per-cluster
blocks.

Spark-first composition — every stage reuses machinery this engine
already ships:

- **cluster** = :func:`.ivf.train_centroids` (deterministic Lloyd) +
  :func:`.ivf.assign_list_id` (argmin over centroid literals — a pure
  whole-stage-codegen projection, no shuffle);
- **within-cluster pairs** = a SELF equi-join hash-partitioned on the
  cluster id (``id_a < id_b``), exact quantized cosine from
  :mod:`.similarity` — deterministic, same arithmetic as every other
  similarity operator here;
- **bound the quadratic term** = :func:`.ivf.cap_hot_cells` keeps
  each cluster's centroid-nearest ``max_cluster_size`` members, so a
  dense region contributes at most cap² comparisons (the paper
  operates at fixed cluster sizes for the same reason);
- **endgame** = the shared cluster-representative policy
  (:func:`.graph.keep_cluster_representatives`, min-id keeper), or
  the paper's own policy ``keep="farthest"`` — keep the group member
  FARTHEST from its cluster centroid (the most atypical example;
  the paper's choice, which preserves diversity).

Scale shape at 100 TB: the only wide operations are the cluster-keyed
self-join (shuffle volume = rows, bounded per-reducer by the cap) and
the connected-components endgame shared with every other dedup
family. Training reads a sample; assignment pipelines with the scan.

Relation to :func:`.similarity.self_near_dup_pairs_bucketed`: RP-LSH
banding finds near-EXACT duplicates (tiny angles) with per-pair
recall guarantees; SemDeDup targets a lower threshold regime
("semantically redundant", 0.9-0.95 typical) where LSH banding's
collision probability decays — cluster-blocking trades probabilistic
recall for exhaustive comparison within a semantic neighborhood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import lazy_checkpoint
from .graph import connected_components, keep_cluster_representatives
from .ivf import _cell_dists, assign_list_id, cap_hot_cells, train_centroids
from .similarity import as_double_array, dot_int, quantize


def semantic_dup_pairs(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    centroids: list[list[float]] | None = None,
    k: int = 64,
    iters: int = 2,
    max_cluster_size: int | None = None,
    quant_scale: int = 1000,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for within-cluster pairs at or above
    ``threshold``. Pass ``centroids`` to reuse a trained bank (e.g.
    the corpus's IVF index bank); otherwise a ``k``-cell bank is
    trained here. ``max_cluster_size`` bounds each cluster to its
    centroid-nearest core before the self-join — the cap on the
    quadratic term."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, id_col, k=k, iters=iters)
    assigned = corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
        "__cell", assign_list_id(vec_col, centroids)
    )
    if max_cluster_size is not None:
        assigned = cap_hot_cells(
            assigned, vec_col, id_col, centroids, max_cluster_size, "__cell"
        )
    q = (
        assigned.select(
            F.col(id_col).alias("__id"),
            F.col("__cell"),
            quantize(vec_col, quant_scale).alias("__qv"),
        )
        .withColumn(
            "__qn", F.sqrt(dot_int(F.col("__qv"), F.col("__qv")).cast("double"))
        )
        # a vector quantizing to all zeros has no direction on the
        # integer grid (cosine would be NULL via 0/0) — excluded from
        # pairing explicitly, like NULL-signature quarantine rows in
        # the media funnel: no evidence, no pair, row survives dedup
        .filter(F.col("__qn") > 0)
    )
    # both sides of the self-join read this frame: checkpoint per the
    # repo convention so the scan + k-way argmin assignment + cap
    # window execute ONCE, not once per side
    q = lazy_checkpoint(q)
    a = q.select(
        F.col("__id").alias("id_a"),
        F.col("__cell"),
        F.col("__qv").alias("__qa"),
        F.col("__qn").alias("__na"),
    )
    b = q.select(
        F.col("__id").alias("id_b"),
        F.col("__cell"),
        F.col("__qv").alias("__qb"),
        F.col("__qn").alias("__nb"),
    )
    return (
        a.join(b, "__cell")  # hash-partitioned on the cluster id
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot_int(F.col("__qa"), F.col("__qb")).cast("double")
                / (F.col("__na") * F.col("__nb"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    k: int = 64,
    iters: int = 2,
    max_cluster_size: int | None = None,
    keep: str = "min_id",
    quant_scale: int = 1000,
) -> DataFrame:
    """Drop semantic duplicates from ``corpus``: one representative
    survives per duplicate group; rows with no duplicate evidence are
    kept untouched (the shared dedup contract).

    ``keep="min_id"`` routes through the repo's shared endgame
    (:func:`.graph.keep_cluster_representatives` — policy changes
    apply to every modality at once). ``keep="farthest"`` is the
    SemDeDup paper's policy: within each duplicate group, keep the
    member farthest from its cluster centroid (the most atypical
    example), ties broken by id ascending — one component-keyed
    window over group members only.
    """
    if keep not in ("min_id", "farthest"):
        raise ValueError(f"unknown keep policy {keep!r}")
    if not 0.0 <= threshold <= 1.0:
        # validated BEFORE training: k-means is full corpus passes
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, id_col, k=k, iters=iters)
    pairs = semantic_dup_pairs(
        corpus,
        vec_col,
        id_col,
        threshold,
        centroids=centroids,
        max_cluster_size=max_cluster_size,
        quant_scale=quant_scale,
    )
    if keep == "min_id":
        return keep_cluster_representatives(corpus, pairs, id_col)
    comp = connected_components(pairs, "id_a", "id_b", algorithm="auto")
    d2 = F.array_min(_cell_dists(as_double_array(vec_col), centroids))["d"]
    members = comp.join(
        corpus.select(F.col(id_col).alias("node"), d2.alias("__d2")), "node"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__d2").desc(), F.col("node").asc()
    )
    drop = (
        members.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") > 1)
        .select(F.col("node").alias(id_col))
    )
    return corpus.join(drop, id_col, "left_anti")
