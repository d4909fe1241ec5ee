"""Hash partitioners with reproducible placement.

The reference's default placement is
``SHA1(JSON.generate(key)).hexdigest[0..4].to_i(16) % num_partitions``
(reference lib/map_reduce/hash_partitioner.rb:28-30) — i.e. the first FIVE hex
chars of the SHA1 of the canonical JSON of the key. ``HashPartitioner`` is
bit-identical to that (conformance test ports
spec/map_reduce/hash_partitioner_spec.rb).

``Md5Partitioner`` is the same construction over MD5 — provided because the
DuckDB oracle can compute md5 in pure SQL (DuckDB 1.0 lacks sha1), so
partition-assignment queries can be hash-checked end-to-end.

Any callable ``key -> int`` is accepted wherever a partitioner is expected
(reference README.md:197-221 documents the same pluggability).
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable

from map_reduce_ruby_spark.core.keys import canonical_json

PartitionFn = Callable[[Any], int]


class HashPartitioner:
    """SHA1-of-canonical-JSON placement, bit-identical to the reference."""

    def __init__(self, num_partitions: int = 32):
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        self.num_partitions = num_partitions

    def __call__(self, key: Any) -> int:
        digest = hashlib.sha1(canonical_json(key).encode("utf-8")).hexdigest()
        return int(digest[:5], 16) % self.num_partitions

    def __repr__(self) -> str:
        return f"HashPartitioner({self.num_partitions})"


class Md5Partitioner:
    """MD5 variant (first 8 hex chars) — oracle-computable in DuckDB SQL as
    ``('0x' || substr(md5(key_json), 1, 8))::UBIGINT % n``."""

    def __init__(self, num_partitions: int = 32):
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        self.num_partitions = num_partitions

    def __call__(self, key: Any) -> int:
        digest = hashlib.md5(canonical_json(key).encode("utf-8")).hexdigest()
        return int(digest[:8], 16) % self.num_partitions

    def __repr__(self) -> str:
        return f"Md5Partitioner({self.num_partitions})"
