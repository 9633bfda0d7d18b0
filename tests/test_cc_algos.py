"""Connected-components algorithm equivalence + round-complexity bounds.

``dedup_clusters`` rides on ``connected_components``; this pins that all
three algorithms (plain propagation, min-neighbor+pointer-jumping, Kiveris
large-star/small-star) produce IDENTICAL labels, and that the sublinear
variants beat plain propagation's round count on a planted 64-node chain —
the adversarial shape for propagation (diameter = n-1, so plain needs ~n
rounds while jump/star stay O(log n))."""

from __future__ import annotations

import random

import pytest

from forum_dl_spark.operators.pipeline import connected_components


def _labels(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _graph(spark, edges, n_nodes):
    e = spark.createDataFrame(
        [(f"d{a:03d}", f"d{b:03d}") for a, b in edges],
        "doc_a string, doc_b string",
    )
    nodes = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(n_nodes)], "doc_id string"
    )
    return e, nodes


def _expected_chain(n_chain, n_nodes):
    out = {(f"d{i:03d}", "d000") for i in range(n_chain)}
    out |= {(f"d{i:03d}", f"d{i:03d}") for i in range(n_chain, n_nodes)}
    return out


@pytest.mark.parametrize("algo", ["plain", "jump", "star"])
def test_chain_labels_identical(spark, algo):
    """64-node path + 8 singletons: every algo labels the whole chain with
    its minimum and leaves singletons alone."""
    edges, nodes = _graph(spark, [(i, i + 1) for i in range(63)], 72)
    labels, rounds = connected_components(edges, nodes, algo=algo)
    assert _labels(labels) == _expected_chain(64, 72)
    assert rounds >= 1


def test_sublinear_rounds_on_chain(spark):
    """On the 64-chain, pointer jumping and star both need at most half of
    plain propagation's rounds (they are O(log n); plain is O(n))."""
    edges, nodes = _graph(spark, [(i, i + 1) for i in range(63)], 64)
    _, r_plain = connected_components(edges, nodes, algo="plain")
    _, r_jump = connected_components(edges, nodes, algo="jump")
    _, r_star = connected_components(edges, nodes, algo="star")
    assert r_plain >= 32  # diameter-bound: propagation crawls the chain
    assert r_jump <= r_plain // 2
    assert r_star <= r_plain // 2


def test_random_graph_all_algos_agree(spark):
    """Random multi-component graph: labels agree across algorithms (the
    plain result is the semantics; jump/star must match it exactly)."""
    rng = random.Random(7)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    e, nodes = _graph(spark, edges, n)
    base = _labels(connected_components(e, nodes, algo="plain")[0])
    assert _labels(connected_components(e, nodes, algo="jump")[0]) == base
    assert _labels(connected_components(e, nodes, algo="star")[0]) == base
