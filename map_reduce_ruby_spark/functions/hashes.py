"""Engine-portable deterministic hashes.

The dedup / LSH operators need hash functions that produce the SAME value in
Spark and in the DuckDB oracle. Neither engine's native ``hash()`` is portable,
so everything is built on md5 hex (identical in both):

    h32(s) = int(md5(s).hexdigest()[:8], 16)    -- a uniform 32-bit value

Spark:  ``conv(substring(md5(s), 1, 8), 16, 10)`` cast to long
DuckDB: ``('0x' || substr(md5(s), 1, 8))::UBIGINT``

Seeded family for MinHash: ``h32(seed || ':' || s)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column, seed: int | str | None = None) -> Column:
    """32-bit md5-based hash of a string column (Spark side)."""
    s = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str, seed: int | str | None = None) -> str:
    """The identical hash as a DuckDB SQL expression."""
    s = f"'{seed}:' || {expr}" if seed is not None else expr
    return f"(('0x' || substr(md5({s}), 1, 8))::UBIGINT)::BIGINT"


def h60(col: Column, seed: int | str | None = None) -> Column:
    """60-bit md5-based hash (first 15 hex chars): the wide-signature
    variant for SimHash, where 32 portable bits are not enough to band
    adaptively. 60 bits keeps the value (and any sum of single-bit
    weights up to 1<<59) comfortably inside a signed 64-bit long on both
    engines."""
    s = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str, seed: int | str | None = None) -> str:
    """The identical 60-bit hash as a DuckDB SQL expression."""
    s = f"'{seed}:' || {expr}" if seed is not None else expr
    return f"(('0x' || substr(md5({s}), 1, 15))::UBIGINT)::BIGINT"
