"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``map_reduce_ruby_spark.plans.catalog``: every implemented
operator registers itself there with a Spark plan fn and (where expressible)
a DuckDB oracle SQL twin. See SURVEY.md §2 for the inventory being covered.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q1_pricing_summary: scan → filter → 8-aggregate groupBy — exercises
    parquet pushdown, partial aggregation, and exact decimal summing.
    """
    from map_reduce_ruby_spark.plans import all_entries

    return all_entries()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from map_reduce_ruby_spark.plans import all_entries

    return {name: e.fn for name, e in all_entries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query (omitted → rows-only check)."""
    from map_reduce_ruby_spark.plans import all_entries

    return {name: e.oracle for name, e in all_entries().items() if e.oracle is not None}
