"""AQE skew-join handling, demonstrated end-to-end: a hot key whose shuffle
partition dwarfs the rest must be split by AdaptiveSparkPlan into multiple
tasks (SortMergeJoin(skew=true)) — the runtime half of the skew story whose
compile-time half is operators/skew.py (salting splits WITHIN a key; AQE
splits oversized partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    # make local-sized data look skewed to AQE
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    # force a sort-merge join so skew splitting (not broadcast) handles it
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_sort_merge_join(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        # 150k rows, ~90% on key 0; right side has every key once.
        left = spark.range(150_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 997)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = left.join(right, "k")
        # collect() (not count()) — count() finalizes a DIFFERENT AQE plan;
        # only executing THIS frame marks its own plan final.
        assert len(joined.collect()) == 150_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
