"""Star-alternation connected-components (operators/cc.py): log-round
CC must label long chains, cliques, isolated nodes, and forests
exactly."""

from __future__ import annotations

import pytest

from supabase_etl_spark.operators.cc import CC_MAX_ROUNDS, connected_components


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    )
    if not edge_pairs:
        edges = edges.filter("src IS NOT NULL")
    out = connected_components(nodes, edges).collect()
    return {r["node"]: r["component"] for r in out}


def test_long_chain_labels_min(spark):
    # a 200-node chain: min-label propagation would need 199 rounds;
    # star alternation measures 9 and must stay inside the round bound
    n = 200
    got = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_isolated(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(2, 1), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_clique_and_duplicate_edges(spark):
    edges = [(a, b) for a in range(5, 9) for b in range(5, 9) if a != b]
    got = _cc(spark, range(5, 9), edges + edges)
    assert got == {i: 5 for i in range(5, 9)}


def test_no_edges_all_isolated(spark):
    got = _cc(spark, [7, 8, 9], [])
    assert got == {7: 7, 8: 8, 9: 9}


def test_round_bound_is_generous(spark):
    # ring of 64: diameter 32; star alternation needs ~7 rounds, far
    # inside CC_MAX_ROUNDS
    n = 64
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _cc(spark, range(n), edges)
    assert set(got.values()) == {0}
    assert CC_MAX_ROUNDS >= 20
