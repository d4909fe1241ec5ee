"""DataFrame adapter for the map/reduce protocol (SURVEY.md §7.2 step 5).

The RDD-based ``Job`` is the full-fidelity surface (heterogeneous keys,
Ruby-comparable ordering). When keys/values fit a declared schema — the
overwhelmingly common case — the same reduce contract runs DataFrame-native,
which keeps Catalyst/AQE/codegen in play:

- ``reduce_by_key(df, keys, values, reduce_fn)``: arbitrary binary
  associative+commutative fold (the reference's ``reduce(key, v1, v2)``,
  README.md:42-50) executed per key group in Arrow batches via
  ``applyInPandas``.
- Fast path: if every value's fold is a recognized primitive ("sum", "min",
  "max", "count", "any"), the plan compiles to built-in JVM aggregates with
  map-side partial aggregation — identical semantics, ~10-100x less Python.

Scale: the fast path is a plain shuffled aggregate. The general path groups
with ``applyInPandas`` — one shuffle on the keys; per-group state is one
pandas frame, so callers with giant single keys should pre-combine with
``salted_agg`` (operators/skew.py) or supply a primitive fold.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ReduceFn = Callable[[Any, Any, Any], Any]

_PRIMITIVES: dict[str, Callable[[str], F.Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "any": F.first,
}


def reduce_by_key(
    df: DataFrame,
    keys: list[str],
    values: dict[str, ReduceFn | str],
    sort_output: bool = False,
) -> DataFrame:
    """Group ``df`` by ``keys`` and fold each value column.

    ``values`` maps column name -> either a primitive name ("sum"/"min"/
    "max"/"count"/"any") or a binary fold ``(key, v1, v2) -> v`` applied
    pairwise left-to-right within each group (contract: associative +
    commutative, exactly the reference's).
    """
    prim = {c: f for c, f in values.items() if isinstance(f, str)}
    custom = {c: f for c, f in values.items() if not isinstance(f, str)}
    unknown = [f for f in prim.values() if f not in _PRIMITIVES]
    if unknown:
        raise ValueError(f"unknown primitive fold(s) {unknown}; use one of {list(_PRIMITIVES)}")

    if not custom:
        out = df.groupBy(*keys).agg(
            *[_PRIMITIVES[f](c).alias(c) for c, f in prim.items()]
        )
    else:
        out_schema = df.select(
            *keys, *[F.col(c) for c in values]
        ).schema

        def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
            key_vals = {k: pdf[k].iloc[0] for k in keys}
            key_arg = key_vals[keys[0]] if len(keys) == 1 else tuple(key_vals.values())
            row: dict[str, Any] = dict(key_vals)
            for c, fn in custom.items():
                acc = None
                first = True
                for v in pdf[c]:
                    acc = v if first else fn(key_arg, acc, v)
                    first = False
                row[c] = acc
            for c, f in prim.items():
                s = pdf[c]
                row[c] = {
                    "sum": s.sum,
                    "min": s.min,
                    "max": s.max,
                    "count": s.count,
                    "any": lambda: s.iloc[0],
                }[f]()
            return pd.DataFrame([row])

        out = (
            df.select(*keys, *[F.col(c) for c in values])
            .groupBy(*keys)
            .applyInPandas(fold_group, schema=out_schema)
        )

    if sort_output:
        out = out.sortWithinPartitions(*keys)
    return out


def pairs_df(df: DataFrame, key_cols: Iterable[str], value_cols: Iterable[str]) -> DataFrame:
    """SQL-facing view of the pair-stream model: STRUCT key / STRUCT value
    columns (SURVEY.md §1.4 DataFrame mapping)."""
    return df.select(
        F.struct(*[F.col(c) for c in key_cols]).alias("key"),
        F.struct(*[F.col(c) for c in value_cols]).alias("value"),
    )
