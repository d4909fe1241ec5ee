"""Approximate aggregates: HLL sketch results must stay within the declared
error bound of the exact answer (the property the driver's rows-only check
can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.sources import load_table


def test_approx_dau_within_bound(spark, sf_dir):
    approx = {
        r.day_no: r.approx_dau
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
    assert set(approx) == set(exact)
    for day, est in approx.items():
        assert abs(est - exact[day]) <= max(1, 0.05 * exact[day]), (day, est, exact[day])
