"""Sorted-neighborhood record linkage (plans/er_queries.py): candidate
volume bound, cross-side invariant, planted-pair recall, and the
no-single-partition-window plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.plans.er_queries import (
    _ER_WINDOW,
    _rank_by,
    _window_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_candidate_volume_is_n_times_w(spark):
    # 40 records, all sharing one blocking key (worst-case hot key for
    # LSH banding): SNM still emits exactly n*w - w*(w+1)/2 ordered
    # neighbor pairs per pass — candidate volume is data-INDEPENDENT.
    n, w = 40, _ER_WINDOW
    keyed = spark.createDataFrame(
        [(i, i % 2, "k") for i in range(n)], "doc_id long, side long, k1 string"
    )
    pairs = _window_pairs(_rank_by(keyed, "k1"), w)
    # ordered neighbor pairs within w, kept iff sides differ (sides
    # alternate in rank order here, so odd offsets only)
    expect = sum(
        1
        for a in range(n)
        for off in range(1, w + 1)
        if a + off < n and off % 2 == 1
    )
    got = pairs.count()
    assert got == expect
    assert got <= n * w  # the data-independent SNM bound


def test_ranks_match_global_sort_order(spark):
    keyed = spark.createDataFrame(
        [(1, 1, "banana"), (2, 0, "apple"), (3, 1, "cherry"), (4, 0, "apple")],
        "doc_id long, side long, k1 string",
    )
    got = {
        r.doc_id: r.rk for r in _rank_by(keyed, "k1").collect()
    }
    # global order: (apple,2) (apple,4) (banana,1) (cherry,3)
    assert got == {2: 0, 4: 1, 1: 2, 3: 3}


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
