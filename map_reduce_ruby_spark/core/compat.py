"""Drop-in ``Mapper`` / ``Reducer`` façade: the reference's EXACT two-class
worker API (reference lib/map_reduce/mapper.rb, lib/map_reduce/reducer.rb),
so a user of the reference can port their worker code by changing imports —
the Spark ``Job`` underneath replaces spill/merge/shuffle mechanics.

Reference worker flow (reference README.md:55-91) and its analog here:

    Ruby                                     Python
    ----                                     ------
    mapper = Mapper.new(impl, partitioner:)  Mapper(impl, spark, partitioner=...)
    mapper.map(input)  # many times          mapper.map(input)
    mapper.shuffle(chunk_limit:) { |parts| } mapper.shuffle(block) or
                                             with-block-less dict return
    reducer = Reducer.new(impl)              Reducer(impl, spark)
    path = reducer.add_chunk  # download     path = reducer.add_chunk()
    reducer.reduce(chunk_limit:) { |k, v| }  for k, v in reducer.reduce(): ...

Fidelity details:
- ``chunk_limit < 2`` raises ``InvalidChunkLimit``
  (reference lib/map_reduce.rb:18, mapper.rb:77, reducer.rb:72); beyond the
  guard the value is ignored — merge fan-in is Spark's concern.
- ``memory_limit`` is accepted and ignored (Spark's UnsafeExternalSorter does
  real memory accounting; reference mapper.rb:21's JSON-size budget is the
  hand-rolled version of the same thing).
- A ``Reducer`` with no ``reduce`` on the implementation works while keys are
  distinct and raises ``AttributeError`` (Ruby ``NoMethodError``) only when
  two equal keys actually meet — lazily, exactly like the reference
  (spec/map_reduce/reducer_spec.rb:37-62).
- Partition files are the reference's JSON-lines chunk format
  (``json([key, value])`` per line, key-sorted), byte-compatible both ways.

SCALE LIMIT (deliberate): ``Mapper.map`` buffers inputs on the driver —
faithful to the reference worker, which also accumulates inputs process-
locally before shuffling, and right for the façade's porting purpose. It is
NOT the 100 TB path: a pipeline feeding millions of inputs should hand
``Job.run`` an RDD/DataFrame directly (the map function then runs inside
Spark tasks against a distributed source), or write reference-format chunks
to shared storage via ``Job.shuffle_to_files(shared_storage=True)``.
"""

from __future__ import annotations

import os
import tempfile
import threading
from typing import Any, Callable, Iterator

from pyspark.sql import SparkSession

from map_reduce_ruby_spark.core.job import Job, MapReduceError
from map_reduce_ruby_spark.core.partitioner import HashPartitioner


class InvalidChunkLimit(MapReduceError):
    """chunk_limit must be >= 2 (reference lib/map_reduce.rb:18)."""


def _check_chunk_limit(chunk_limit: int) -> None:
    if chunk_limit < 2:
        raise InvalidChunkLimit(f"chunk_limit must be >= 2, got {chunk_limit}")


class Mapper:
    """Reference ``MapReduce::Mapper`` (lib/map_reduce/mapper.rb): buffer
    inputs via ``map``, then ``shuffle`` to a partition->file map."""

    def __init__(
        self,
        implementation: Any,
        spark: SparkSession,
        partitioner: Callable[[Any], int] | None = None,
        memory_limit: int | None = None,  # accepted for API parity; unused
    ):
        self._impl = implementation
        self._spark = spark
        self._partitioner = partitioner or HashPartitioner(32)
        self._inputs: list[Any] = []
        # O19 thread-safe ingestion: the reference's Mapper is a monitor
        # (reference lib/map_reduce/mapper.rb:7 MonitorMixin, :45 synchronize)
        # so workers may feed one mapper from many threads. CPython's GIL
        # makes a bare list.append atomic, but that is an implementation
        # detail — an explicit lock pins the contract.
        self._ingest_lock = threading.Lock()

    def map(self, *args: Any, **kwargs: Any) -> None:
        """Buffer one input per call; ALL args of one call reach ONE
        ``implementation.map(*args, **kwargs)`` invocation (reference
        mapper.rb:43 forwards the full argument list). The user's ``map``
        runs lazily at shuffle time, inside Spark tasks. Safe to call
        concurrently from multiple threads (reference mapper.rb:45
        ``synchronize``)."""
        with self._ingest_lock:
            self._inputs.append((args, kwargs))

    def shuffle(
        self,
        block: Callable[[dict[int, str]], None] | None = None,
        chunk_limit: int = 32,
        out_dir: str | None = None,
    ) -> dict[int, str] | None:
        """Run map -> [combine] -> partition -> sort and materialize one
        JSON-lines file per non-empty partition (reference mapper.rb:76-96).

        With ``block``: call it with {partition: path} then DELETE the files
        (the reference's yield-then-cleanup ``ensure``). Without: return the
        map; the caller owns the files.
        """
        _check_chunk_limit(chunk_limit)
        impl_map = self._impl.map
        reduce_fn = getattr(self._impl, "reduce", None)
        n_parts = getattr(self._partitioner, "num_partitions", 32)
        job = Job(
            map_fn=lambda ak: impl_map(*ak[0], **ak[1]),
            reduce_fn=reduce_fn,
            partitioner=self._partitioner,
            num_partitions=n_parts,
        )
        out = out_dir or tempfile.mkdtemp(prefix="mr_shuffle_")
        # No-reduce mode defaults to FIFO-stable duplicates: the façade
        # advertises byte-compatible chunk files, and the reference's merge
        # keeps equal-key duplicates in input order
        # (lib/map_reduce/priority_queue.rb:35,50-53, pinned by
        # spec/map_reduce/mapper_spec.rb:89-125). With a reduce impl the
        # flag is moot (keys are unique after the fold) and costs nothing.
        partitions = job.shuffle_to_files(
            self._spark, self._inputs, out, stable=reduce_fn is None
        )
        if block is None:
            return partitions
        try:
            block(partitions)
            return None
        finally:
            for path in partitions.values():
                if os.path.exists(path):
                    os.unlink(path)


class Reducer:
    """Reference ``MapReduce::Reducer`` (lib/map_reduce/reducer.rb):
    register chunk files, then stream the merged+reduced pairs."""

    def __init__(self, implementation: Any, spark: SparkSession):
        self._impl = implementation
        self._spark = spark
        self._chunks: list[str] = []

    def add_chunk(self) -> str:
        """Allocate and register an empty temp path for the caller to fill
        (reference reducer.rb:34-42 — e.g. with a downloaded partition
        chunk)."""
        fd, path = tempfile.mkstemp(prefix="mr_chunk_", suffix=".jsonl")
        os.close(fd)
        self._chunks.append(path)
        return path

    def reduce(self, chunk_limit: int = 32) -> Iterator[tuple[Any, Any]]:
        """Merge all registered chunks and yield key-sorted (key, value)
        pairs (reference reducer.rb:69-100; Enumerator form == this
        generator). Temp chunks are deleted when the stream is exhausted or
        closed, even on error (the reference's ``ensure``)."""
        _check_chunk_limit(chunk_limit)
        reduce_fn = getattr(self._impl, "reduce", None)
        try:
            paths = [p for p in self._chunks if os.path.getsize(p) > 0]
            if paths:
                rdd = Job.reduce_files(
                    self._spark, paths, reduce_fn, num_partitions=1
                )
                prev_key, have_prev = None, False
                for key, value in rdd.toLocalIterator():
                    if reduce_fn is None and have_prev and prev_key == key:
                        # Lazy NoMethodError parity: only when duplicates meet
                        raise AttributeError(
                            "implementation has no 'reduce' but duplicate "
                            f"keys met in the reducer (key={key!r}) — "
                            "reference raises NoMethodError here "
                            "(spec/map_reduce/reducer_spec.rb:37-62)"
                        )
                    prev_key, have_prev = key, True
                    yield key, value
        finally:
            for p in self._chunks:
                if os.path.exists(p):
                    os.unlink(p)
            self._chunks.clear()
