"""Bucketed (pre-partitioned) tables: the shuffle-free repeated-join layout.

At 100 TB, a fact-to-fact join (lineitem x orders) shuffles both sides EVERY
query. Bucketing pays that shuffle once at write time: both tables are
hash-bucketed (and sorted) on the join key, so every subsequent join or
aggregation on that key is exchange-free — the scan itself satisfies the
required distribution. This is the DataFrame face of the reference's
"partition -> file" shuffle handoff (Mapper#shuffle, O11/O12): partition
placement persisted as a physical layout instead of re-derived per query.

Usage::

    write_bucketed(orders,   "orders_b",   "o_orderkey", 16, path)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 16, path)
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # executed plan: SortMergeJoin over two bucketed scans, ZERO Exchange

Bucket counts must match across tables meant to co-join; pick them so a
bucket of the biggest table fits an executor core's working set (e.g. 100 TB
/ 2 GB ≈ 50k buckets, rounded to a power of two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) table at an explicit path.

    Works with the default in-memory catalog — bucketing metadata lives in
    the session catalog, data in plain parquet part files per bucket.
    """
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).mode("overwrite").format("parquet").saveAsTable(table)
