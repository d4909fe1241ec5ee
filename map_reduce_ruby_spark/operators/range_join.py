"""Range (point-in-interval) join — an operator the reference lacks and Spark
only executes as BroadcastNestedLoopJoin unless one side is tiny.

``range_join(points, intervals, point_col, start_col, end_col, bin_width)``:
inner-join every point row to every interval row with
``start <= point <= end``.

Plan shape (the bucketed range-join trick used by every engine that scales
this — see e.g. the interval-bin formulation in the Spark SQL docs' range
join guidance): pick a ``bin_width``, map each point to ONE bin
``floor(point / bin_width)``, explode each interval into the bins it
overlaps (``sequence(floor(start/w), floor(end/w))``), then equi-join on the
bin and re-apply the exact ``BETWEEN`` as a residual filter.

Scale: the join becomes a hash/sort-merge equi-join on the bin key — shuffle
partitioned, AQE-skew-splittable — instead of an O(|points| x |intervals|)
nested loop. Interval fan-out is ``len/bin_width + 1`` rows per interval, so
``bin_width`` should be on the order of the median interval length: big
enough to bound fan-out, small enough that a bin's point population stays a
partition-sized unit. Both inputs stay distributed — neither side needs to
fit in memory (contrast with broadcasting the intervals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``start_col <= point_col <= end_col`` (both ends inclusive), executed as
    a bin-bucketed equi-join. Numeric (long-castable) columns only; the
    output carries all columns of both inputs.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column name collision between sides: {sorted(overlap)}")

    def _bin(c: Column) -> Column:
        return F.floor(c.cast("long") / F.lit(bin_width)).cast("long")

    p = points.withColumn("__bin", _bin(F.col(point_col)))
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(_bin(F.col(start_col)), _bin(F.col(end_col)))),
    )
    joined = p.join(iv, "__bin").filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bin")
