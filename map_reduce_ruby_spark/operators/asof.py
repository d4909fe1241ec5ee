"""As-of (point-in-time) join — an operator Spark lacks natively, composed
from union + window so it scales: ONE shuffle on the join key, no range
explosion, no per-key collect.

``asof_join(left, right, on, left_ts, right_ts)``: for every left row, attach
the most recent right row with ``right_ts <= left_ts`` (backward direction,
inclusive — the pandas ``merge_asof`` default and kdb+ ``aj`` semantics).

Plan shape: tag both sides, union by a common schema, window-sort each key
group by (ts, side-tag), and carry the last non-null right payload forward
with ``last(..., ignorenulls=True)``. At 100 TB this is exactly one hash
shuffle on ``on`` + an in-partition sort — contrast with the naive
``left.join(right, right_ts <= left_ts)`` + groupBy-max plan, whose
intermediate is O(|left| x |matching right|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join. Right payload columns come back
    null-filled when no right row precedes the left timestamp."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    # Common unioned schema: key, ts, side tag, left payload, right payload.
    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right (0) sorts before left (1) at equal ts
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    w = (
        W.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l.unionByName(r).select(
        "__key",
        "__ts",
        "__side",
        *left_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        F.col("__key").alias(on),
        F.col("__ts").alias(left_ts),
        *left_payload,
        *[F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
