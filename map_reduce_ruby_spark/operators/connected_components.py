"""Distributed connected components via min-label propagation — turns
near-duplicate candidate PAIRS (e.g. MinHash-LSH output) into duplicate
CLUSTERS, the step a real dedup pipeline needs before choosing one keeper
per cluster. The reference has no graph/iterative operators at all
(SURVEY.md §2.2); this is a Spark-native iterative algorithm.

Algorithm: every node starts labeled with its own id; each round, a node's
label becomes the min of its own and its neighbors' labels; stop at fixpoint.
Rounds needed = graph diameter — for dedup clusters (dense cliques produced
by LSH bands) that is 1-3, so the loop runs a handful of shuffles, each an
equi-join on node id.

Scale notes (100 TB posture):
- Per round: one join (edges x labels, shuffle on node id) + one min-agg
  (map-side partial) — no collect, no driver-side graph.
- ``localCheckpoint(eager=True)`` after every round truncates the lineage so
  the plan does not grow O(rounds) deep (the classic iterative-Spark trap).
- The convergence probe is ``isEmpty()``-style: a join + LIMIT 1, not a full
  count.
- For high-diameter graphs (long chains — not the dedup shape) the
  large-star/small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond") converges in O(log n) rounds; this module keeps the
  simpler propagation because dedup graphs are low-diameter, and caps rounds
  at ``max_rounds`` to bound worst-case cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Return a DataFrame ``(node, component)`` where ``component`` is the
    smallest node id in the node's connected component.

    ``edges`` is an undirected edge list (direction ignored, self-loops and
    duplicates tolerated). Nodes appearing only in ``edges`` are covered;
    isolated nodes (no edges) are absent — union them in as singletons at the
    call site if needed.

    Raises ``RuntimeError`` if no fixpoint is reached within ``max_rounds``
    (diameter larger than expected — use a log-rounds algorithm instead).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    try:
        for _ in range(max_rounds):
            nbr_min = (
                sym.join(labels, sym.b == labels.node)
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            # Carry the previous label through the round so convergence is a
            # scan of the checkpointed result — not an extra shuffle join of
            # new labels against old every round.
            new_full = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_component", "component"),
                    ).alias("component"),
                    F.col("component").alias("__old"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_full.filter(F.col("component") != F.col("__old")).limit(1).count()
            )
            labels = new_full.drop("__old")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "graph diameter too large for min-label propagation"
        )
    finally:
        sym.unpersist()
