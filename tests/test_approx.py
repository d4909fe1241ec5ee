"""Approximate aggregates: HLL sketch results must stay within the declared
error bound of the exact answer (the property the driver's rows-only check
can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.sources import load_table


def test_approx_dau_within_bound(spark, sf_dir):
    rows = {
        r.day_no: r
        for r in all_entries()["approx_distinct_users_daily"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.day_no: r.dau
        for r in (
            load_table(spark, sf_dir, "events")
            .withColumn("day_no", F.expr("ts_us div 86400000000"))
            .groupBy("day_no")
            .agg(F.countDistinct("user_id").alias("dau"))
            .collect()
        )
    }
    assert set(rows) == set(exact)
    for day, r in rows.items():
        assert r.exact_dau == exact[day], (day, r.exact_dau, exact[day])
        assert r.hll_within_bounds, (day, r)


def test_hll_sketch_merge_across_partitions(spark, sf_dir):
    """hll_sketch_agg partial sketches union to the same estimate as one
    global sketch, and land within HLL error of the exact count — the
    mergeability that lets 1000 executors sketch independently and combine
    driver-side without a second scan (the sketch IS the reference's
    associative reduce contract, applied to distinct-counting)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]

    direct = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est

    merged = (
        ev.withColumn("part", F.col("event_id") % 7)
        .groupBy("part")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct  # merge order must not change the estimate
    assert abs(merged - exact) <= max(2, 0.05 * exact)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx, exact = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("a"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
    ).collect()[0]
    assert abs(approx - exact) <= 0.02 * exact
