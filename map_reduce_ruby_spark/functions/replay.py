"""Replay a bounded collected artifact as a LITERAL struct array.

The ANN family scores a small query set against the whole corpus. Expressing
that as ``corpus.join(broadcast(queries), non_equi)`` plans a
BroadcastNestedLoopJoin — correct here (the broadcast side is bounded), but
indistinguishable in a plan audit from an accidental quadratic join. The
scale-honest alternative: collect the bounded side ONCE (the same
bounded-artifact rule as the IVF centroids / knn_pandas_udf query matrix),
embed it as a literal ``array(named_struct(...))``, and ``explode`` it on
the scan side. The physical plan becomes Scan -> Generate -> Project: one
corpus pass, no join operator at all, and the catalog-wide
no-BNLJ/no-Cartesian audit holds with an EMPTY allowlist.

Literals are built as SQL text and parsed engine-side with one ``F.expr``
(a 64-term Column chain costs ~130 py4j round-trips — the established text
rule from the similarity plans); ``repr(float)`` round-trips doubles
exactly, so replayed values are bit-identical to the collected ones.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(v, field: str = "?") -> str:
    if isinstance(v, bool):
        raise TypeError(
            f"field {field!r}: boolean literals are not replayed; cast to int first"
        )
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, float):
        # repr(nan)/repr(inf) would render 'nanD'/'infD', which the engine
        # rejects with an opaque parse error far from here — fail at the
        # caller with the offending field named instead
        if not math.isfinite(v):
            raise ValueError(
                f"field {field!r}: non-finite float {v!r} cannot be replayed "
                "as a literal; filter or impute before collecting"
            )
        return f"{v!r}D"
    if isinstance(v, str):
        # single quotes double inside SQL string literals; backslashes are
        # escape introducers in Spark SQL string literals and must be doubled
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if v is None:
        raise ValueError(
            f"field {field!r} is NULL: a bare NULL literal has no type inside "
            "named_struct — drop or impute the field before collecting"
        )
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_fmt(x, field) for x in v) + ")"
    raise TypeError(f"field {field!r}: unsupported literal type {type(v)!r}: {v!r}")


def literal_struct_array(rows) -> Column:
    """Collected Rows -> ``array(named_struct('f', v, ...), ...)`` Column.

    Field order and names come from the rows (all rows must share the
    schema); ints become BIGINT literals, floats DOUBLE (finite only —
    nan/inf raise with the field named), strings STRING (quote/backslash
    escaped), lists ARRAY. NULL fields raise: a bare NULL has no type
    inside named_struct. Caller guarantees the row count is bounded (this
    is a broadcast-sized artifact, typically <= a few hundred rows)."""
    if not rows:
        raise ValueError("literal_struct_array needs at least one row")
    structs = ", ".join(
        "named_struct("
        + ", ".join(f"'{k}', {_fmt(v, k)}" for k, v in row.asDict().items())
        + ")"
        for row in rows
    )
    return F.expr(f"array({structs})")
