"""Query catalog: every implemented operator as a (spark_fn, oracle_sql) pair.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Each entry's Spark function takes ``(spark, sf_dir)`` and returns a
DataFrame whose column names exactly match the oracle's aliases (the driver
sorts columns by name before hashing). ``oracle`` is ANSI SQL runnable by
DuckDB against the pre-registered parquet views; ``None`` marks genuinely
non-SQL-expressible operators (driver then records a rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "CatalogEntry"] = {}


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: SparkFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query."""

    def wrap(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        _REGISTRY[name] = CatalogEntry(name=name, fn=fn, oracle=oracle, doc=doc, tags=tuple(tags))
        return fn

    return wrap


def all_entries() -> dict[str, CatalogEntry]:
    """Import every query module (side-effect: registration) and return the
    registry in a stable order."""
    from map_reduce_ruby_spark.plans import (  # noqa: F401
        dedup_queries,
        dsir_queries,
        er_queries,
        events_queries,
        mapreduce_queries,
        operator_queries,
        pipeline_queries,
        relational_queries,
        similarity_queries,
        streaming_queries,
        text_queries,
        tpch_more_queries,
    )

    return dict(sorted(_REGISTRY.items()))
