"""Sorted-neighborhood record linkage (operators/er.py + plans/
er_queries.py): candidate volume bound, rank order, within-corpus mode,
planted-pair recall, and the no-single-partition-window plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.er import (
    _global_rank,
    sorted_neighborhood_candidates,
)
from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.plans.er_queries import _ER_WINDOW


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_candidate_volume_is_bounded_by_n_times_w(spark):
    # 40 records, all sharing ONE blocking key (the worst-case hot key for
    # LSH banding, which would fan out quadratically): SNM's candidate
    # count stays data-independent — at most n*w pairs per pass.
    n, w = 40, _ER_WINDOW
    recs = spark.createDataFrame(
        [(i, i % 2, "k") for i in range(n)], "rec_id long, side long, k1 string"
    )
    cross = sorted_neighborhood_candidates(recs, ["k1"], w).count()
    # sides alternate in rank order here, so cross-side pairs are the odd
    # offsets within each window
    expect_cross = sum(
        1 for a in range(n) for off in range(1, w + 1)
        if a + off < n and off % 2 == 1
    )
    assert cross == expect_cross
    within = sorted_neighborhood_candidates(
        recs, ["k1"], w, cross_side_only=False
    ).count()
    expect_all = sum(1 for a in range(n) for off in range(1, w + 1) if a + off < n)
    assert within == expect_all
    assert within <= n * w  # the SNM bound


def test_ranks_match_global_sort_order(spark):
    recs = spark.createDataFrame(
        [(1, 1, "banana"), (2, 0, "apple"), (3, 1, "cherry"), (4, 0, "apple")],
        "rec_id long, side long, k1 string",
    )
    got = {r.rec_id: r.rk for r in _global_rank(recs, "k1", None).collect()}
    # global order: (apple,2) (apple,4) (banana,1) (cherry,3)
    assert got == {2: 0, 4: 1, 1: 2, 3: 3}


def test_multi_pass_union_dedupes_pairs(spark):
    # two keys with the SAME sort order: each pass emits the same pairs,
    # the union must still return each pair once
    recs = spark.createDataFrame(
        [(i, i % 2, chr(97 + i), chr(97 + i)) for i in range(6)],
        "rec_id long, side long, k1 string, k2 string",
    )
    one = sorted_neighborhood_candidates(recs, ["k1"], 2).collect()
    both = sorted_neighborhood_candidates(recs, ["k1", "k2"], 2).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, both))


def test_planted_cross_side_pair_is_found(spark, tmp_path):
    # Two near-identical records on opposite sides, surrounded by noise
    # that shares no shingles with them: the pair must surface with a
    # high verified jaccard; noise must produce nothing.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base), (1, base + " lambda")]  # sides 0 and 1
    rows += [
        (i, f"noise{i}a noise{i}b noise{i}c noise{i}d noise{i}e")
        for i in range(2, 30)
    ]
    d = tmp_path / "er_docs"
    docs = _docs(spark, rows).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    docs.write.parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        docs.limit(0).write.parquet(str(d / f"{t}.parquet"))
    out = all_entries()["er_sorted_neighborhood"].fn(spark, str(d)).collect()
    assert [(r.left_id, r.right_id) for r in out] == [(0, 1)]
    assert out[0].jacc > 0.8


def test_no_single_partition_window_in_plan(spark, sf_dir):
    # The global rank must come from the two-phase prefix scan: every
    # window in the executed plan is partitioned (by the prefix-sum
    # bucket), never a global ORDER BY over one partition.
    df = all_entries()["er_sorted_neighborhood"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__bucket" in line, f"unpartitioned window: {line.strip()}"
