"""Order-independent exact aggregation helpers.

Floating-point sums depend on addition order, which differs between Spark
partitions/runs and the DuckDB oracle. Every money/measure aggregate in the
catalog therefore goes through fixed-point arithmetic: per-row values are cast
to DECIMAL (deterministic per-row double math, then an exact decimal sum), and
only the final result is cast back to DOUBLE. Each helper has a ``*_sql`` twin
emitting the equivalent DuckDB expression so Spark result and oracle result
are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / 6 decimals comfortably covers the synthetic measures (prices
# < 1e6) even summed over 100 TB partitions: Spark widens sum(decimal(18,6))
# to decimal(28,6) internally (no overflow-to-null at realistic row counts).
_DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum of a double expression -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def dec2dbl_sql(expr: str) -> str:
    """DuckDB DECIMAL -> DOUBLE with ONE correctly-rounded conversion.

    DuckDB's direct ``CAST(dec AS DOUBLE)`` on a scale>0 decimal is
    two-step — ``(double)int128_units / (double)10^scale`` — and each
    step rounds, so once the unit count crosses 2^53 (observed at the
    sf100 fixture: SUM(l_extendedprice) ~ 2.86e12 = 2.86e18 micro-units)
    the result can be 1 ulp off the nearest double. Spark's
    ``Decimal.toDouble`` (BigDecimal.doubleValue) is correctly rounded at
    any magnitude, so the two engines diverge exactly at scale. Routing
    through a string (STRING — the alias BOTH dialects parse, since two
    shared-dialect entries run this text through Spark SQL as well) makes
    DuckDB's conversion a single strtod — the same correctly-rounded
    value Spark produces (probed across magnitudes in SCALING.md round
    9). Scale-0 decimals (exact integer cents summed as decimal(38,0))
    never had the problem: one integer->double conversion is already
    single-step."""
    return f"CAST(CAST({expr} AS STRING) AS DOUBLE)"


def dsum_sql(expr: str, alias: str) -> str:
    return (
        f"{dec2dbl_sql(f'SUM(CAST({expr} AS DECIMAL(18,6)))')} AS {alias}"
    )


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: decimal sum / count, one double division at the end."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    ).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"{dec2dbl_sql(f'SUM(CAST({expr} AS DECIMAL(18,6)))')}"
        f" / COUNT({expr}) AS {alias}"
    )


def cents_sum(col: Column | str, alias: str) -> Column:
    """Exact sum via integer cents (for RDD-side parity jobs that sum in
    Python: round(x*100) sums exactly in int64 on both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * 100).cast("long")) / 100.0).alias(alias)


def cents_sum_sql(expr: str, alias: str) -> str:
    return f"SUM(CAST(ROUND(({expr}) * 100) AS BIGINT)) / 100.0 AS {alias}"


def cents_sum_sql_double(expr: str, alias: str) -> str:
    """``cents_sum_sql`` with an explicit DOUBLE cast on the final division.

    Use this twin for ENGINE-side Spark SQL text: Spark types
    ``BIGINT / 100.0`` as DECIMAL (and hashes with decimal scale, e.g.
    ``123.450000``), while DuckDB's identical text compares as DOUBLE —
    numerically equal values then fail representation hashing. The DataFrame
    helper ``cents_sum`` already emits double; this keeps raw-SQL plans on
    the same representation instead of each call site hand-casting.
    """
    return f"CAST(SUM(CAST(ROUND(({expr}) * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS {alias}"
