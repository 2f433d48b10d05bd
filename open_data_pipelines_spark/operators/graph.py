"""Graph operators for dedup clustering (engine extension; the
training-data endgame of the near-dup pipelines in
:mod:`.text_dedup` / :mod:`.similarity`).

Pair lists (MinHash/SimHash/embedding near-dups) answer "which two
docs collide" — deduplication needs the transitive closure: CLUSTERS,
with one canonical representative kept per cluster. That is connected
components over the pair graph.

Implementation is iterative min-label propagation expressed as
DataFrame joins: every node's label becomes the min of its own and
its neighbors' labels until fixpoint. Each round is one hash-shuffle
join + one aggregation, and lineage is truncated per round with an
eager ``localCheckpoint`` (swap for a reliable ``checkpoint`` dir on a
real cluster). Rounds needed equal the graph diameter; near-dup
clusters are shallow (dups of a doc are dups of each other), so this
converges in a handful of rounds. For adversarially deep graphs
(long chains), switch to the large-star/small-star alternation of
Kiveris et al. ("Connected Components in MapReduce and Beyond",
SoCC'14) which converges in O(log n) rounds — same join primitives,
noted here deliberately: the propagation loop below is the simple,
oracle-matchable variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation did not reach fixpoint within max_rounds."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id in the node's connected
    component (deterministic canonical label). Nodes with no edges are
    absent — union singletons in the caller if needed.
    """
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        adj.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_rounds):
            nbr_min = (
                adj.join(labels, adj["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("component").alias("nbr_min"))
            )
            stepped = (
                labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                .select(
                    "node",
                    "component",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                    ).alias("new_component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = stepped.filter(
                F.col("new_component") != F.col("component")
            ).count()
            labels = stepped.select(
                "node", F.col("new_component").alias("component")
            )
            if changed == 0:
                return labels
        raise ConvergenceError(
            f"no fixpoint after {max_rounds} rounds - deep chain graph? "
            "raise max_rounds or use a star-contraction variant"
        )
    finally:
        adj.unpersist()


def cluster_members(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(doc_id, cluster_rep, cluster_size) for every clustered node.

    ``cluster_rep`` is the canonical keeper (min id); dedup drops every
    row where ``doc_id != cluster_rep``. Sizes come from one extra
    aggregation on the component labels (broadcast back — component
    count is tiny relative to nodes).
    """
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(F.broadcast(sizes), "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_rep"),
        "cluster_size",
    )
