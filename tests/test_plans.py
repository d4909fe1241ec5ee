"""Physical-plan shape assertions — the 100 TB posture, checked in CI.

Correctness says the answer is right; these tests say the PLAN is the one
that survives a 1000-executor cluster: dimensions broadcast (no fact-table
shuffle for dim joins), parquet filters pushed to the scan, column pruning
active, global top-k via TakeOrderedAndProject (never a full sort), and
whole-stage codegen covering the hot path.
"""

from __future__ import annotations

import pytest

from map_reduce_ruby_spark.plans import all_entries


def plan_of(spark, sf_dir, name: str, execute: bool = False) -> str:
    df = all_entries()[name].fn(spark, sf_dir)
    if execute:  # finalize AQE on THIS plan so codegen ids are assigned
        df.collect()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "star_join_full")
    # 5 dimension joins must be broadcast; only lineitem<->orders may shuffle.
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_q1_filter_pushed_to_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_q1_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    # Scan must read only the 8 needed columns, not l_orderkey/l_partkey/....
    scan = plan[plan.index("ReadSchema") :].split("\n")[0]
    assert "l_orderkey" not in scan and "l_partkey" not in scan, scan
    assert "l_quantity" in scan and "l_returnflag" in scan, scan


def test_global_topk_never_global_sorts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "global_topk_orders")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_q1_has_partial_aggregation(spark, sf_dir):
    # Map-side combine (the reference's O4) must appear as a partial
    # HashAggregate before the exchange.
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan


def test_q1_stays_in_codegen(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary", execute=True)
    assert "codegen id" in plan, plan  # formatted mode tags codegen'd operators
    # No Python evaluation in the hot path of SQL-native queries.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_semi_join_is_semi_in_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "semi_join_customers_with_open_orders")
    assert "LeftSemi" in plan, plan


def test_asof_is_single_shuffle(spark, sf_dir):
    # The as-of composition must shuffle ONCE on the key (hashpartitioning) —
    # no range-join blowup, no extra exchanges beyond AQE reads.
    plan = plan_of(spark, sf_dir, "asof_last_purchase")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    exchanges = plan.count("hashpartitioning(")
    assert exchanges == 1, f"expected 1 shuffle, saw {exchanges}\n{plan}"


def test_lsh_join_is_bucket_equi_join(spark, sf_dir):
    # Candidate generation must be an equi-join on the band bucket — a
    # cartesian/theta join here would be the O(n^2) trap at scale.
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    pushed = plan[plan.index("PushedFilters") :].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    scan = plan[plan.index("ReadSchema") :].split("\n")[0]
    assert "l_orderkey" not in scan and "l_returnflag" not in scan, scan


def test_q4_semi_join_shape(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q4_order_priority_exists")
    assert "LeftSemi" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_grouping_sets_single_expand_single_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "grouping_sets_flag_status")
    # One Expand feeding one aggregation pipeline — not four scans unioned.
    assert plan.count("Expand") >= 1, plan
    # formatted mode prints each node twice (tree + detail section), so one
    # physical scan == one "Location:" detail line.
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_q8_dims_broadcast_single_fact_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q8_market_share")
    # 6 dimension joins (part, supplier, customer, n1, region, n2) broadcast;
    # lineitem<->orders is the only join allowed to shuffle.
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_q10_pushdown_and_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_items")
    assert "EqualTo(l_returnflag,R)" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q18_semi_join_reuses_orderkey_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_large_volume_customers")
    assert "LeftSemi" in plan, plan
    # HAVING-aggregate and semi-join both hash on l_orderkey.
    assert plan.count("hashpartitioning(l_orderkey") >= 1, plan


def test_range_frame_window_partitioned_by_customer(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_range_frame_spend")
    assert "specifiedwindowframe(RangeFrame, -60, currentrow$())" in plan, plan
    # exactly one shuffle: the window's customer partitioning (formatted
    # explain prints each node once in the tree and once in the detail list)
    assert plan.count("+- Exchange") == 1, plan
    assert "hashpartitioning(o_custkey" in plan, plan


def test_q21_single_orderkey_shuffle_dims_broadcast(spark, sf_dir):
    """Q21's lo-join, per-order aggregate, and join-back all key on
    l_orderkey; the supplier/nation sides broadcast; top-100 never global-
    sorts. A second orderkey repartition would double the dominant shuffle."""
    from map_reduce_ruby_spark.plans import all_entries

    plan = (
        all_entries()["q21_waiting_orders"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_joins_on_band_buckets(spark, sf_dir):
    """The incremental pass must join batch bands to corpus bands on the
    (band_idx, band_hash) bucket key — never a cross pairing."""
    from map_reduce_ruby_spark.plans import all_entries

    plan = (
        all_entries()["dedup_incremental_minhash"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "band_hash" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: joining a hive-partitioned fact against a
    FILTERED dim must inject a runtime pruning subquery so only matching
    partition directories are scanned — at 100 TB this is the difference
    between reading one date/type partition and reading the lake."""
    from pyspark.sql import functions as F

    from map_reduce_ruby_spark.sources import load_table

    out = str(tmp_path / "part_events")
    load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    ).write.partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)

    dim = spark.createDataFrame(
        [("purchase", 1.0), ("view", 0.1), ("click", 0.2)],
        "event_type string, weight double",
    ).filter(F.col("weight") > 0.5)  # selects exactly one partition

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        joined = fact.join(dim, "event_type").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        rows = {r.event_type: r.n for r in joined.collect()}
        expected = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert rows == {"purchase": expected}
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_recursive_cte_surface(spark):
    """Pin the Spark 4.1 recursive-CTE surface: UNION ALL recursion works
    (series generation — usable for bounded-depth expansions), while
    UNION-distinct recursion raises the documented error, which is WHY the
    connected-components operators use iterative DataFrame algorithms
    (min-label propagation / large-star-small-star) instead of a recursive
    CTE: cyclic-graph closure needs mid-recursion dedup."""
    rows = spark.sql(
        """
        WITH RECURSIVE t(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5
        )
        SELECT n FROM t ORDER BY n
        """
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3, 4, 5]

    import pytest as _pytest

    spark.sql(
        "CREATE OR REPLACE TEMP VIEW rcte_edges AS "
        "SELECT * FROM VALUES (1,2),(2,1) AS t(a,b)"
    )
    with _pytest.raises(Exception, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            """
            WITH RECURSIVE reach(a, b) AS (
                SELECT a, b FROM rcte_edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN rcte_edges e ON r.b = e.a
            )
            SELECT COUNT(*) AS n FROM reach
            """
        ).collect()


def test_simhash_bitsample_equals_banded_hamming(spark, sf_dir):
    """Both complete candidate generators over the same 60-bit signature —
    3 adaptive DISJOINT bands (pigeonhole) and 6 overlapping cyclic 20-bit
    windows (covering design: every bit in exactly 2 windows, hamming<=2
    kills at most 4) — must emit the IDENTICAL verified pair set: the exact
    bit_count(XOR) filter makes candidate generation invisible whenever it
    is complete. A divergence means one generator dropped a true pair."""
    from map_reduce_ruby_spark.plans import all_entries

    e = all_entries()
    banded = set(map(tuple, e["dedup_simhash_hamming"].fn(spark, sf_dir).collect()))
    sampled = set(map(tuple, e["dedup_simhash_bitsample"].fn(spark, sf_dir).collect()))
    assert banded == sampled
    assert len(banded) > 0  # non-vacuous: the fixture has near-dup families


def test_kneser_ney_trigram_hand_computed(spark, tmp_path):
    """Pin the interpolated-KN formula on a corpus small enough to verify
    by hand: one document 'a b c a b d' (trigram types abc/bca/cab/abd,
    all count 1). With D = 0.75:
      p(c|a,b) = .25/2 + (.75*2/2) * (.25/2 + (.75*2/2) * 1/4) = 0.359375
      p(a|b,c) = .25/1 + (.75*1/1) * (.25/1 + (.75*1/1) * 1/4) = 0.578125
    and the (a,b) context's two continuations are symmetric."""
    import pyspark.sql.functions as F_

    from map_reduce_ruby_spark.plans import all_entries

    d = tmp_path / "kn_docs"
    docs = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    ).select(
        "doc_id", "text", F_.lit("en").alias("lang"),
        F_.lit("s").alias("source"), F_.length("text").alias("n_chars"),
    )
    docs.write.parquet(str(d / "documents.parquet"))
    out = {
        (r.w1, r.w2, r.w3): (r.c3, r.p_kn)
        for r in all_entries()["text_kneser_ney_trigram"].fn(spark, str(d)).collect()
    }
    assert out == {
        ("a", "b", "c"): (1, 0.359375),
        ("a", "b", "d"): (1, 0.359375),
        ("b", "c", "a"): (1, 0.578125),
        ("c", "a", "b"): (1, 0.578125),
    }


def test_kneser_ney_probabilities_are_proper(spark, sf_dir):
    """On the fixture corpus every emitted smoothed probability lies in
    (0, 1] — the discount/interpolation arithmetic never leaks mass."""
    from map_reduce_ruby_spark.plans import all_entries

    rows = all_entries()["text_kneser_ney_trigram"].fn(spark, sf_dir).collect()
    assert rows
    assert all(0.0 < r.p_kn <= 1.0 for r in rows)
