"""Connected components: correctness vs a Python union-find oracle on random
graphs, plus shape properties (coverage, component = min member)."""

from __future__ import annotations

import random

import pytest

from map_reduce_ruby_spark.operators import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.component for r in connected_components(df).collect()}


def test_two_triangles_and_a_bridge(spark):
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    got = _spark_components(spark, edges)
    assert got == {n: 0 for n in (0, 1, 2, 10, 11, 12)}


def test_chain_needs_multiple_rounds(spark):
    # A path graph: diameter = len-1, worst case for propagation.
    edges = [(i, i + 1) for i in range(12)]
    got = _spark_components(spark, edges)
    assert got == {n: 0 for n in range(13)}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    expected = _union_find(n, edges)
    got = _spark_components(spark, edges)
    # Spark result covers exactly the nodes with >= 1 non-self edge.
    nodes = {a for a, b in edges if a != b} | {b for a, b in edges if a != b}
    assert set(got) == nodes
    for node in nodes:
        assert got[node] == expected[node], node


def test_duplicate_and_self_edges_tolerated(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)]
    got = _spark_components(spark, edges)
    assert got == {1: 1, 2: 1, 4: 1}


def test_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_rounds=2)
