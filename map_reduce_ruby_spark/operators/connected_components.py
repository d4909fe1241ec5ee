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
- ``materialize.truncate(..., eager=True)`` after every round truncates the
  lineage (localCheckpoint locally; reliable checkpoint() on a durable dir
  when ``SPARK_GRAFT_CHECKPOINT_DIR`` is set — a multi-hour fixpoint loop is
  exactly where executor-local checkpoint blocks are NOT acceptable) so
  the plan does not grow O(rounds) deep (the classic iterative-Spark trap).
- The convergence probe is ``isEmpty()``-style: a join + LIMIT 1, not a full
  count.
- For high-diameter graphs (long chains — not the dedup shape) the
  large-star/small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond") converges in O(log n) rounds —
  ``connected_components_star`` below implements it; the default stays the
  simpler propagation because dedup graphs are low-diameter, and caps rounds
  at ``max_rounds`` to bound worst-case cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from map_reduce_ruby_spark.materialize import truncate


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
    from pyspark.sql import Observation

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # The symmetric edge set is PRE-PARTITIONED on the per-round join key
    # ``b`` before it is persisted: every round joins ``sym.b == labels.node``,
    # and an unpartitioned cache would re-Exchange the full edge set each
    # round — the largest shuffle in the loop, paid (rounds) times. Hashed on
    # ``b`` once, the cached partitioning satisfies the join's distribution
    # requirement and only the (much narrower) labels side shuffles per round.
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(F.col("b"))
        .persist()
    )

    # Lazy: round 1's materializing pass (the first eager round checkpoint)
    # computes and stores the initial labels — no separate job for them.
    labels = truncate(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )

    try:
        for _ in range(max_rounds):
            nbr_min = (
                sym.join(labels, sym.b == labels.node)
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            # Convergence is OBSERVED on the materializing pass itself
            # (Observation metrics fire on the eager localCheckpoint): the
            # previous label rides along as __old and max(component != __old)
            # is folded into the same job — no second probe job scanning the
            # checkpointed result every round (guide §1: one action per
            # round; at corpus scale the probe was a full labels scan).
            obs = Observation()
            new_full = truncate(
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_component", "component"),
                    ).alias("component"),
                    F.col("component").alias("__old"),
                )
                .observe(
                    obs,
                    F.max(
                        F.when(F.col("component") != F.col("__old"), 1).otherwise(0)
                    ).alias("changed"),
                ),
                eager=True,  # obs.get below needs the action to run NOW
            )
            labels = new_full.drop("__old")
            if not (obs.get["changed"] or 0):  # None on an empty edge set
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "graph diameter too large for min-label propagation"
        )
    finally:
        sym.unpersist()


def incremental_connected_components(
    base_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Maintain a clustering when a NEW batch of edges arrives, without
    re-running connected components over the corpus's edge set — the
    daily-ingest form of ``connected_components``, completing the
    incremental lifecycle the persisted indexes already have
    (append_ivf_batch / append_minhash_batch produce each day's candidate
    PAIRS cheaply; this folds those pairs into the standing clusters).

    ``base_labels`` is a prior ``(node, component)`` result (component =
    min node id in the component, the contract shared by both CC
    operators); ``new_edges`` is the batch's edge list — typically
    batch×corpus and batch×batch near-dup pairs. Returns the updated
    ``(node, component)`` covering every node of ``base_labels`` plus
    every node appearing in ``new_edges``, EXACTLY equal to a full
    rebuild over (old edges ∪ new edges) — pinned by tests and by the
    ``dedup_clusters_incremental`` catalog entry's full-rebuild oracle.

    Why it's cheap: each base component is already connected, so the
    corpus graph can be CONTRACTED to one meta-node per component (the
    quotient-graph identity CC(G/~) lifts to CC(G)). The iterative part
    then runs on the contracted batch graph — sized by the BATCH's edges,
    never the corpus — and the corpus pays exactly two non-iterative
    joins: mapping new-edge endpoints through ``base_labels`` (shuffle ∝
    batch edges) and the final relabel, whose build side (components
    actually merged by the batch, ≤ 2·|new edges|) is broadcast — the
    100 TB corpus is relabeled map-side with no shuffle.

    Component ids stay stable except where the batch genuinely merges
    clusters (the merged cluster takes the min id, which may be a new
    batch doc's id — same contract as a full rebuild).
    """
    # The batch edge set feeds THREE subtrees (contraction, batch-node
    # derivation, fresh-node labeling); materialize it once — its upstream
    # is typically the day's candidate-pair derivation (an LSH band
    # self-join), which must not re-run per consumer.
    e = truncate(
        new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    base = base_labels.select("node", "component")

    # Contract: map each endpoint to its base component (itself if unseen).
    # Meta-node ids are base component ids (corpus doc ids) or raw batch
    # node ids — one shared id space, so min-label semantics compose.
    la = base.select(F.col("node").alias("a"), F.col("component").alias("ca"))
    lb = base.select(F.col("node").alias("b"), F.col("component").alias("cb"))
    contracted = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("ca", F.col("a")).alias("a"),
            F.coalesce("cb", F.col("b")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))  # intra-component edges: no-ops
        .distinct()
    )

    # Iterate ONLY on the contracted batch graph. Dedup batches merge a few
    # meta-nodes per cluster (low diameter), so min-label propagation is the
    # right engine here, same as the from-scratch default.
    meta = connected_components(contracted, "a", "b").select(
        F.col("node").alias("meta"), F.col("component").alias("final")
    )

    # Lift back: corpus nodes re-map through their component's meta label;
    # components the batch never touched are absent from `meta` and keep
    # their id. The meta map is bounded by the batch's edge endpoints —
    # broadcast it so the corpus-wide relabel is exchange-free.
    relabeled = base.join(
        F.broadcast(meta), base.component == meta.meta, "left"
    ).select("node", F.coalesce("final", "component").alias("component"))

    # Nodes new in this batch (not in base_labels): their meta-node is
    # themselves. An anti-join against base (broadcast side = batch nodes)
    # keeps nodes that already existed from being emitted twice.
    batch_nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .join(base.select("node"), "node", "left_anti")
    )
    fresh = batch_nodes.join(
        F.broadcast(meta), batch_nodes.node == meta.meta, "left"
    ).select("node", F.coalesce("final", F.col("node")).alias("component"))

    return relabeled.union(fresh)


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the high-diameter
    fallback for ``connected_components``: a length-d chain needs d rounds
    of min-label propagation but only O(log d) star rounds, because each
    round rewires every node toward its neighborhood minimum.

    Per round (both steps are one groupBy-min + one join, shuffled on node):
      large-star: for each u, every LARGER neighbor v re-points to
                  m = min(N(u) ∪ {u})   — keeps the graph connected while
                  collapsing upward edges onto local minima.
      small-star: for each u (now only smaller-or-equal neighbors remain
                  relevant), all of N(u) ∪ {u} re-point to m.
    Fixpoint: the directed edge set stops changing; every edge is then
    (member -> component root). Same output contract as
    ``connected_components``: (node, component=min node id in component).
    """
    from pyspark.sql import Observation

    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # current directed forest: (u, v) meaning "u points at v"; start with
    # both directions so every node sees its full neighborhood. The starting
    # cardinality for the fixpoint probe is observed on the same
    # materializing pass (no separate count job).
    obs0 = Observation()
    cur = truncate(
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n")),
        eager=True,  # obs0.get is read before the first star round runs
    )
    # The node set is derived from the CHECKPOINTED start state (cur holds
    # both directions of every edge, so its `a` column is exactly the node
    # set) — deriving it from the raw `edges` plan re-ran the full upstream
    # pair derivation (LSH self-join and all) once more at the final join.
    nodes = cur.select(F.col("a").alias("node")).distinct()

    def star(edges_uv: DataFrame, large: bool) -> DataFrame:
        # Lazy truncate: sym feeds BOTH the neighborhood-min agg and
        # the rewire join below. Left as a plan it would execute twice
        # inside the round's one materializing job; checkpointed, the first
        # path computes+stores each partition and the second reads the
        # blocks (the _bpe_learn fusion pattern) — one union+distinct
        # shuffle per star step instead of two, with no extra job.
        sym = truncate(
            edges_uv.union(
                edges_uv.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).distinct()
        )
        m = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        joined = sym.join(m, "a")
        if large:
            out = joined.filter(F.col("b") > F.col("a")).select(
                F.col("b").alias("a"), F.col("m").alias("b")
            )
        else:
            out = joined.select(F.col("b").alias("a"), F.col("m").alias("b")).union(
                m.select(F.col("a"), F.col("m").alias("b"))
            )
        return out.filter(F.col("a") != F.col("b")).distinct()

    cur_count = int(obs0.get["n"])
    for _ in range(max_rounds):
        # Fixpoint probe: both sides are distinct edge SETS, so equal
        # cardinality + empty one-direction difference == equality. The
        # cardinality is OBSERVED on the round's materializing pass itself
        # (no separate count job), and the exceptAll join runs only in
        # rounds where the counts already agree.
        obs = Observation()
        nxt = truncate(
            star(star(cur, large=True), large=False)
            .observe(obs, F.count(F.lit(1)).alias("n")),
            eager=True,  # obs.get below needs the action to run NOW
        )
        nxt_count = int(obs.get["n"])
        changed = 1
        if nxt_count == cur_count:
            changed = nxt.exceptAll(cur).limit(1).count()
        cur, cur_count = nxt, nxt_count
        if changed == 0:
            # cur is a star forest: (member -> root); roots self-label
            labels = cur.select(
                F.col("a").alias("node"), F.col("b").alias("component")
            )
            return (
                nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias("component"),
                )
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_rounds} rounds"
    )
