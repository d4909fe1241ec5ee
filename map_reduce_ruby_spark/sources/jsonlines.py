"""Reference chunk-format interop: line-delimited ``json([key, value])``.

The reference's only persistent representation is one
``JSON.generate([key, value])`` per line, keys sorted within a file
(reference lib/map_reduce/mapper.rb:115,131-135; parsed back at
lib/map_reduce/mergeable.rb:67). These helpers read/write that exact format so
outputs are byte-comparable with reference-produced chunks.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator

from pyspark import RDD
from pyspark.sql import SparkSession


def write_chunk(path: str, pairs: Iterable[tuple[Any, Any]]) -> None:
    """Write pairs (assumed already key-sorted by the caller) in chunk format."""
    with open(path, "w", encoding="utf-8") as f:
        for k, v in pairs:
            f.write(json.dumps([k, v], separators=(",", ":"), ensure_ascii=False))
            f.write("\n")


def read_chunk(path: str) -> Iterator[tuple[Any, Any]]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                k, v = json.loads(line)
                yield (k, v)


def chunks_rdd(spark: SparkSession, paths: list[str]) -> RDD:
    """Distributed read of chunk files -> RDD[(key, value)]."""
    return spark.sparkContext.textFile(",".join(paths)).map(
        lambda line: tuple(json.loads(line))
    )
