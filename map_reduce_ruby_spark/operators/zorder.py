"""Z-order (Morton) layout: multi-dimensional clustering for scan pruning.

A table range-partitioned and sorted on ONE column prunes scans on that
column only; a 2-D box query on (a, b) still reads every file for the
``b`` predicate. Interleaving the bits of both columns into a single Morton
code and laying files out by code ranges makes every file a small rectangle
in (a, b) space — parquet footer min/max stats then prune MOST files for a
selective box on EITHER or BOTH dimensions. This is the layout trick behind
Delta/Iceberg ``ZORDER BY`` / ``sort_order`` clustering, expressed here with
plain DataFrame primitives:

    z = interleave_bits(rank_a, rank_b)      # pure column expr, codegen'd
    df.repartitionByRange(n, z)              # range shuffle on z (sampled
                                             # boundaries — scales to any n)
    .sortWithinPartitions(z)                 # rectangles tight per file
    .write.parquet(...)

Inputs are first normalized to fixed-width unsigned ranks (value - min,
scaled into ``bits`` bits) so skewed/negative domains interleave evenly; the
(min, scale) normalization constants come from one tiny agg over the frame.

The reference has no storage layout at all (chunk files are transient,
SURVEY.md §2.2); this operator exists for the 100 TB posture, where "which
files does a predicate touch" IS the query cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative integer columns (``bits`` bits each):
    result bit 2i holds a's bit i, bit 2i+1 holds b's bit i. A chain of
    shift/mask/or terms — stays inside whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` re-laid-out so that writing it produces one z-range
    rectangle per output partition. Columns must be numeric; rows are
    unchanged (same multiset), only placement and order move."""
    stats = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    ).collect()[0]
    top = (1 << bits) - 1

    def rank(c: str, lo, hi) -> Column:
        span = float(hi - lo) if hi > lo else 1.0
        return ((F.col(c) - F.lit(lo)) / F.lit(span) * top).cast("long")

    z = interleave_bits(
        rank(col_a, stats.amin, stats.amax),
        rank(col_b, stats.bmin, stats.bmax),
        bits,
    )
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
