"""Distributed exclusive prefix sum over a global ordering — WITHOUT the
single-partition window Spark would otherwise use.

``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with no PARTITION BY
collapses to one partition (Spark even warns); at 100 TB that is a
one-executor bottleneck. The classic fix is the two-phase scan:

1. bucket every row by a MONOTONE coarsening of the sort order (the caller
   supplies ``bucket_col`` — e.g. the high bits of a uniform hash key, or a
   date for time-ordered data);
2. aggregate per-bucket totals (tiny: one row per bucket), collect them to
   the driver, compute exclusive bucket offsets, broadcast them back;
3. run the window scan WITHIN each bucket (parallel across buckets) and add
   the bucket's offset.

Cost: one narrow agg + one broadcast join + per-bucket windows. Driver
traffic is O(n_buckets), independent of data size — pick bucket counts in
the hundreds-to-thousands.

Used by the corpus token-budget query (plans/pipeline_queries.py): "keep
documents, in deterministic hash order, until the budget is exhausted".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def exclusive_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    bucket_col: Column,
    out_col: str = "cum_before",
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one in the global ``order_cols`` ordering.

    ``bucket_col`` MUST order consistently with ``order_cols``: every row in
    bucket i sorts before every row in bucket j for i < j (e.g.
    ``floor(key / width)`` when ``order_cols[0]`` is ``key``). This is what
    lets bucket totals stand in for "everything in earlier buckets".
    """
    bucketed = df.withColumn("__bucket", bucket_col)

    totals = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("__total"))
        .collect()
    )
    if not totals:
        # empty input: no buckets to offset — the scan is identically 0
        # (createDataFrame cannot infer a schema from zero offset rows)
        return bucketed.withColumn(out_col, F.lit(0).cast("long")).drop("__bucket")
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["__bucket"]):
        offsets.append((row["__bucket"], running))
        running += row["__total"]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(offsets, ["__bucket", "__offset"])

    win = (
        W.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(value_col).over(win), F.lit(0))
    return (
        bucketed.join(F.broadcast(offset_df), "__bucket")
        .withColumn(out_col, (F.col("__offset") + within).cast("long"))
        .drop("__bucket", "__offset")
    )
