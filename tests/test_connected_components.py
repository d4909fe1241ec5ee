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


def test_star_algorithm_handles_long_chain(spark):
    """A 200-node chain has diameter 200 — min-label propagation would need
    200 rounds; large-star/small-star must converge in O(log n)."""
    from map_reduce_ruby_spark.operators.connected_components import (
        connected_components_star,
    )

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    comp = connected_components_star(edges, max_rounds=12)
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {0}


def test_incremental_matches_full_rebuild_on_random_graphs(spark):
    """Incremental maintenance must be indistinguishable from a full
    rebuild over (old ∪ new) edges — split random graphs into a corpus
    batch and an ingest batch, fold the ingest in incrementally, compare
    node-for-node with CC over the union. Covers merges across old
    components, brand-new nodes, batch-batch edges, and untouched
    components keeping their ids."""
    import random

    from map_reduce_ruby_spark.operators import incremental_connected_components

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = 70
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        # "batch" nodes = ids >= 50; old graph is corpus-only edges
        old = [(a, b) for a, b in edges if a < 50 and b < 50]
        new = [(a, b) for a, b in edges if a >= 50 or b >= 50]
        if not old or not new:
            continue
        base = connected_components(spark.createDataFrame(old, "src long, dst long"))
        got_df = incremental_connected_components(
            base, spark.createDataFrame(new, "src long, dst long")
        )
        got = {r.node: r.component for r in got_df.collect()}
        full = {
            r.node: r.component
            for r in connected_components(
                spark.createDataFrame(edges, "src long, dst long")
            ).collect()
        }
        assert got == full, (seed, {k: (got.get(k), full.get(k)) for k in
                                    set(got) | set(full)
                                    if got.get(k) != full.get(k)})


def test_incremental_no_new_edges_is_identity(spark):
    from map_reduce_ruby_spark.operators import incremental_connected_components

    base = connected_components(
        spark.createDataFrame([(1, 2), (4, 5)], "src long, dst long")
    )
    empty = spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.component
           for r in incremental_connected_components(base, empty).collect()}
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_incremental_merge_takes_new_batch_min_id(spark):
    """A batch doc with a SMALLER id than the clusters it bridges becomes
    the merged component's id — same contract as the full rebuild."""
    from map_reduce_ruby_spark.operators import incremental_connected_components

    base = connected_components(
        spark.createDataFrame([(10, 11), (20, 21)], "src long, dst long")
    )
    new = spark.createDataFrame([(5, 11), (5, 20)], "src long, dst long")
    got = {r.node: r.component
           for r in incremental_connected_components(base, new).collect()}
    assert got == {n: 5 for n in (5, 10, 11, 20, 21)}


def test_star_matches_min_label_on_random_graphs(spark):
    """Both algorithms must produce identical components on arbitrary
    graphs (several seeds, mixed cliques/chains/isolated pairs)."""
    import random

    from map_reduce_ruby_spark.operators.connected_components import (
        connected_components,
        connected_components_star,
    )

    for seed in (3, 17):
        rng = random.Random(seed)
        edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {r.node: r.component for r in connected_components(df).collect()}
        b = {r.node: r.component for r in connected_components_star(df).collect()}
        assert a == b, (seed, {k: (a[k], b.get(k)) for k in a if a[k] != b.get(k)})
