"""Core semantic layer: the reference's map/reduce contract on Spark RDDs.

What is faithfully rebuilt (SURVEY.md §7.0): the user protocol
(map yields (key, value) pairs; optional binary reduce), Ruby ``<=>`` key
comparability (raise on incomparable), canonical-JSON key encoding, SHA1
hash-partition placement, combiner optionality, duplicate-preserving
sorted-within-partition output, JSON-lines chunk interop.

What is delegated to Spark (never reimplemented): memory-bounded buffering,
sorted spill files, k-way merge, bounded fan-in, temp-file lifecycle — all of
reference lib/map_reduce/{mapper,reducer,mergeable,priority_queue,temp_path}.rb's
mechanics are Spark's sort-based shuffle.
"""

from map_reduce_ruby_spark.core.keys import (
    IncomparableKeyError,
    SortKey,
    canonical_json,
    ruby_cmp,
)
from map_reduce_ruby_spark.core.partitioner import HashPartitioner, Md5Partitioner
from map_reduce_ruby_spark.core.job import Job
from map_reduce_ruby_spark.core.compat import InvalidChunkLimit, Mapper, Reducer
from map_reduce_ruby_spark.core.df_adapter import pairs_df, reduce_by_key

__all__ = [
    "pairs_df",
    "reduce_by_key",
    "IncomparableKeyError",
    "SortKey",
    "canonical_json",
    "ruby_cmp",
    "HashPartitioner",
    "Md5Partitioner",
    "Job",
    "Mapper",
    "Reducer",
    "InvalidChunkLimit",
]
