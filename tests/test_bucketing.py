"""Bucketed-table co-located join: the storage-layout answer to the shuffle.

Two fact tables bucketed (and sorted) on the SAME key into the same bucket
count join WITHOUT any Exchange — each task zips bucket i with bucket i.
At 100 TB this converts the nightly fact-to-fact join from a full network
shuffle of both sides into a local merge per bucket; it is the persistent
form of the reference's "partition by key once, then merge aligned chunks"
flow (SURVEY.md §3.2), kept across jobs instead of per run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_bucketed"
    )
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "ord_bucketed"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    li = spark.table("li_bucketed")
    ords = spark.table("ord_bucketed")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about bucketing,
        # not about the small fixture fitting in a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(ords, li.l_orderkey == ords.o_orderkey).groupBy(
            "o_custkey"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself reads aligned buckets: no Exchange below the join —
        # the only Exchange allowed is the one for the groupBy on o_custkey
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        # and it still computes the right answer
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.agg(F.sum("n")).first()[0] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
