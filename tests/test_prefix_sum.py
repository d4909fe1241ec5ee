"""Two-phase exclusive prefix sum vs the single-partition window oracle."""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import exclusive_prefix_sum


def _oracle(spark, df):
    win = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, -1)
    return {
        r.id: r.cum
        for r in df.select(
            "id", F.coalesce(F.sum("v").over(win), F.lit(0)).alias("cum")
        ).collect()
    }


def test_matches_global_window(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(1 << 20), rng.randrange(100)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "k", "v"])
    bucket = F.floor(F.col("k") / F.lit(1 << 16))  # monotone coarsening of k
    got = {
        r.id: r.cum_before
        for r in exclusive_prefix_sum(df, "v", ["k", "id"], bucket).collect()
    }
    assert got == _oracle(spark, df)


def test_empty_and_single_bucket(spark):
    df = spark.createDataFrame([(1, 10, 5), (2, 20, 7), (3, 30, 1)], ["id", "k", "v"])
    got = {
        r.id: r.cum_before
        for r in exclusive_prefix_sum(df, "v", ["k", "id"], F.lit(0)).collect()
    }
    assert got == {1: 0, 2: 5, 3: 12}


def test_preserves_columns_and_rowcount(spark):
    df = spark.createDataFrame([(i, i * 3 % 17, 1) for i in range(40)], ["id", "k", "v"])
    out = exclusive_prefix_sum(df, "v", ["k", "id"], F.floor(F.col("k") / 4))
    assert set(out.columns) == {"id", "k", "v", "cum_before"}
    assert out.count() == 40
    # exclusive: the max cum_before equals total minus that row's value
    assert out.agg(F.max("cum_before")).first()[0] == 39
