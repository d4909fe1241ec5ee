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


def test_aqe_skew_split_fires_on_zipfian_join_and_matches_salted(spark):
    """The decision-rule demonstration (documented in operators/skew.py):
    a realistic zipfian key distribution (frequency ~ 1/rank via inverse
    CDF, head key ~10% of 600k rows) must (a) trigger AQE's runtime skew
    split — SortMergeJoin(skew=true) asserted in the EXECUTED plan — with
    no code change, and (b) produce byte-identical aggregates through the
    explicit salted_join fallback. AQE is the default remedy for JOIN
    skew; salting remains for aggregation skew (AQE never splits a groupBy
    key) and AQE-less plans (streaming, broadcast-disabled engines)."""
    from map_reduce_ruby_spark.operators.skew import salted_join

    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        n_keys = 1000
        # inverse-CDF zipf: rank = floor(n_keys^u) with u uniform in [0,1)
        # gives P(rank <= x) = log(x)/log(n_keys), i.e. frequency ~ 1/rank —
        # rank 1 alone draws ~1/ln(1000) ~ 14% of all rows
        u = (F.pmod(F.hash("id"), F.lit(1_000_000)) / 1_000_000.0)
        fact = spark.range(600_000).select(
            F.floor(F.pow(F.lit(float(n_keys)), u)).cast("long").alias("k"),
            (F.col("id") % 97).alias("payload"),
        )
        dim = spark.range(n_keys + 1).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
        )
        # (a) the bare join: AQE splits the zipf head's partition at runtime
        joined = fact.join(dim, "k")
        assert len(joined.collect()) == 600_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "skew=true" in plan, plan

        # (b) the nuance the decision rule documents: a same-key aggregate
        # DOWNSTREAM of the join suppresses the split (splitting would break
        # the co-partitioning the aggregate reuses, i.e. add a shuffle) —
        # unless forceOptimizeSkewedJoin accepts that trade
        def agg_of(frame):
            return frame.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("payload") + F.col("attr")).alias("s"),
            )

        plain = agg_of(fact.join(dim, "k"))
        plain_rows = {tuple(r) for r in plain.collect()}
        suppressed = plain._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in suppressed, suppressed

        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        forced = agg_of(fact.join(dim, "k"))
        assert {tuple(r) for r in forced.collect()} == plain_rows
        fplan = forced._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in fplan, fplan

        # (c) the explicit fallback is result-identical
        salted = agg_of(salted_join(fact, dim, ["k"]))
        assert {tuple(r) for r in salted.collect()} == plain_rows
    finally:
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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
