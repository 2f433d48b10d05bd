"""Connected-components / dedup-cluster operator tests."""

from __future__ import annotations

import pytest

from open_data_pipelines_spark.operators.graph import (
    ConvergenceError,
    cluster_members,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_chain_and_island(spark):
    # chain 1-2-3-4 plus island {10, 11}: two components, min-labeled
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_edge_direction_irrelevant(spark):
    e = _edges(spark, [(5, 2), (2, 9), (9, 1)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert set(got.values()) == {1}


def test_cluster_members_sizes(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    got = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in cluster_members(e).collect()
    }
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_convergence_guard(spark):
    # a 6-node chain labeled high-to-low needs several rounds; one
    # round cannot reach fixpoint
    e = _edges(spark, [(6, 5), (5, 4), (4, 3), (3, 2), (2, 1)])
    with pytest.raises(ConvergenceError):
        connected_components(e, max_rounds=1)


def test_star_matches_propagation(spark):
    # multi-component graph incl. out-of-order labels: both algorithms
    # must produce identical (node, component) labelings
    pairs = [(5, 2), (2, 9), (9, 1), (20, 30), (30, 25), (40, 41), (41, 40)]
    e = _edges(spark, pairs)
    prop = {r["node"]: r["component"] for r in connected_components(e).collect()}
    star = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="star").collect()
    }
    assert star == prop


def test_auto_escalates_to_star_on_deep_chain(spark):
    # the same 100-node chain that makes propagation raise at
    # max_rounds=25: auto must escalate to star and return the labels
    # star alone produces (VERDICT r4 task #5)
    chain = [(i + 1, i) for i in range(1, 100)]
    e = _edges(spark, chain)
    auto = {
        r["node"]: r["component"]
        for r in connected_components(
            e, algorithm="auto", max_rounds=25, driver_max_edges=0
        ).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="star", max_rounds=25).collect()
    }
    assert auto == star == {i: 1 for i in range(1, 101)}


def test_auto_driver_gate_matches_distributed(spark):
    """The size-gated union-find path must label identically to the
    distributed loop (same min-id contract), including non-numeric
    node ids, and preserve the node dtype in the output schema."""
    pairs = [(5, 2), (2, 9), (9, 1), (20, 30), (30, 25), (40, 41)]
    e = _edges(spark, pairs)
    driver = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="auto").collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(
            e, algorithm="auto", driver_max_edges=0
        ).collect()
    }
    assert driver == dist

    se = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], ["id_a", "id_b"]
    )
    out = connected_components(se, algorithm="auto")
    assert out.schema["node"].dataType.simpleString() == "string"
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_auto_uses_propagation_when_shallow(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    auto = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="auto").collect()
    }
    assert auto == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_unknown_algorithm_raises(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        connected_components(e, algorithm="bogus")


def test_star_converges_on_deep_chain(spark):
    # 100-node descending chain: diameter 99. Propagation at
    # max_rounds=25 raises; star contraction converges well within 25
    # rounds (O(log^2 n)) and labels the whole chain with its minimum.
    chain = [(i + 1, i) for i in range(1, 100)]  # 100-99-...-2-1
    e = _edges(spark, chain)
    with pytest.raises(ConvergenceError):
        connected_components(e, max_rounds=25)
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="star", max_rounds=25).collect()
    }
    assert got == {i: 1 for i in range(1, 101)}


def test_self_loop_nodes_labeled_on_both_auto_paths(spark):
    """A node appearing only in a self-loop must label itself on the
    driver union-find path exactly as on the distributed path
    (code-review r7 finding: a<b collection dropped such nodes)."""
    e = _edges(spark, [(7, 7), (1, 2)])
    driver = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="auto").collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(e, algorithm="auto", driver_max_edges=0).collect()
    }
    assert driver == dist == {1: 1, 2: 1, 7: 7}


def test_union_find_equals_distributed_on_random_graphs(spark):
    """Property: on arbitrary random graphs (self-loops, duplicate
    and reversed edges, multiple components, isolated-by-self-loop
    nodes) the driver union-find gate labels EXACTLY like the forced
    distributed propagation path."""
    import random

    rnd = random.Random(1234)
    for trial in range(6):
        n_nodes = rnd.randint(2, 40)
        n_edges = rnd.randint(1, 60)
        pairs = [
            (rnd.randrange(n_nodes), rnd.randrange(n_nodes)) for _ in range(n_edges)
        ]
        e = _edges(spark, pairs)
        driver = {
            r["node"]: r["component"]
            for r in connected_components(e, algorithm="auto").collect()
        }
        dist = {
            r["node"]: r["component"]
            for r in connected_components(
                e, algorithm="auto", driver_max_edges=0, max_rounds=60
            ).collect()
        }
        assert driver == dist, (trial, pairs)


def test_star_keeps_self_loop_only_nodes(spark):
    """Round-9 review find: the star contraction filtered u != v up
    front and silently dropped nodes appearing only in self-loops,
    while propagation and the driver union-find keep them — the output
    contract is identical labels on EVERY path, including auto's
    escalation target."""
    e = _edges(spark, [(7, 7), (1, 2), (2, 3)])
    want = {1: 1, 2: 1, 3: 1, 7: 7}
    for algo, kwargs in (
        ("star", {}),
        ("propagation", {}),
        ("auto", {"driver_max_edges": 0}),
        ("auto", {}),
    ):
        got = {
            r["node"]: r["component"]
            for r in connected_components(e, algorithm=algo, **kwargs).collect()
        }
        assert got == want, algo
