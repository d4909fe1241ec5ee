"""The reference chunk format as a first-class Spark data source.

``spark.read.format("mr_chunks").load(path)`` / ``df.write.format("mr_chunks")``
over the reference's only persistent representation — one
``JSON.generate([key, value])`` per line, keys sorted within a file
(reference lib/map_reduce/mapper.rb:115,131-135, parsed back at
lib/map_reduce/mergeable.rb:67) — via the PySpark 4 Python DataSource API.
A reference user's existing chunk files (the ones their workers upload to S3
between phases) load straight into a DataFrame, and DataFrame results write
back out as files the reference's Reducer#add_chunk flow can ingest.

Schema is ``key_json string, value_json string``: the chunk model is
schemaless (JSON-typed keys/values, FIXTURES.md §A), so each side is carried
as its canonical compact JSON text — lossless for every legal reference
value, and `F.from_json` peels it into typed columns when the user declares
a schema. Read parallelism is one Spark partition per chunk file (chunk files
are independently sorted runs — the same unit the reference merges); writes
produce one sorted-run file per task partition.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CHUNK_SCHEMA = "key_json string, value_json string"


def _canon(obj) -> str:
    # Matches the reference's JSON.generate byte layout (jsonlines.py).
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def _resolve_files(path: str) -> list[str]:
    if os.path.isdir(path):
        names = (os.path.join(path, n) for n in os.listdir(path))
        return sorted(p for p in names if os.path.isfile(p) and not os.path.basename(p).startswith(("_", ".")))
    if any(ch in path for ch in "*?["):
        return sorted(p for p in _glob.glob(path) if os.path.isfile(p))
    return [path]


class _ChunkFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ChunkReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mr_chunks source requires a path")

    def partitions(self):
        return [_ChunkFilePartition(p) for p in _resolve_files(self.path)]

    def read(self, partition: _ChunkFilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    k, v = json.loads(line)
                    yield (_canon(k), _canon(v))


class _ChunkStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: tail a directory of chunk files.

    Offset = {"n": k} — the first k files in lexicographic order are
    committed. Contract (documented, matching the writer's chunk-%05d
    naming): new files must sort AFTER already-ingested ones, which is how
    a reference deployment's upload step names them. Each file is ingested
    exactly once; readBetweenOffsets replays a committed window for
    recovery, so restarts under a checkpoint neither skip nor duplicate.
    This is the streaming face of the reference's Reducer#add_chunk flow
    (reference lib/map_reduce/reducer.rb:34-42): instead of registering
    chunks one call at a time, the engine watches the drop directory.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mr_chunks stream requires a path")

    def initialOffset(self) -> dict:
        return {"n": 0, "last": None}

    @staticmethod
    def _validate(files: list[str], off: dict) -> None:
        """The offset carries the BOUNDARY FILENAME next to the count: if a
        committed file was deleted, or a file arrived that sorts before the
        boundary, the count would silently slice the wrong window — the name
        check turns both contract violations into a loud error instead."""
        n = off.get("n", 0)
        last = off.get("last")
        if n == 0 or last is None:
            return
        if n > len(files) or os.path.basename(files[n - 1]) != last:
            raise ValueError(
                f"mr_chunks stream offset violated: expected file #{n} to be "
                f"{last!r} (committed boundary); directory now has "
                f"{[os.path.basename(f) for f in files[:n]]} — a committed "
                "chunk file was removed or a new file sorted before the "
                "boundary (files must arrive with increasing names)"
            )

    def _rows(self, files: list[str]) -> list[tuple]:
        rows: list[tuple] = []
        for path in files:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        k, v = json.loads(line)
                        rows.append((_canon(k), _canon(v)))
        return rows

    def read(self, start: dict):
        files = _resolve_files(self.path)
        self._validate(files, start)
        end = {
            "n": len(files),
            "last": os.path.basename(files[-1]) if files else None,
        }
        return iter(self._rows(files[start["n"] :])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _resolve_files(self.path)
        self._validate(files, end)
        return iter(self._rows(files[start["n"] : end["n"]]))


class _ChunkCommit(WriterCommitMessage):
    pass


class _ChunkWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mr_chunks sink requires a path")

    def write(self, iterator) -> _ChunkCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"chunk-{pid:05d}.jsonl")
        # write under a '.'-prefixed temp name (invisible to _resolve_files
        # and to the streaming reader), then rename: a concurrent tailer can
        # never observe a half-written chunk file
        tmp = os.path.join(self.path, f".chunk-{pid:05d}.jsonl.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"[{row.key_json},{row.value_json}]\n")
        os.replace(tmp, out)
        return _ChunkCommit()

    def commit(self, messages) -> None:
        # driver-side success marker ('_'-prefixed => skipped by readers):
        # consumers gate on it to distinguish a completed write from a
        # killed-mid-flight one
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass


class ChunkDataSource(DataSource):
    """format("mr_chunks"): reference chunk files <-> DataFrame."""

    @classmethod
    def name(cls) -> str:
        return "mr_chunks"

    def schema(self) -> str:
        return CHUNK_SCHEMA

    def reader(self, schema) -> _ChunkReader:
        return _ChunkReader(self.options)

    def simpleStreamReader(self, schema) -> _ChunkStreamReader:
        return _ChunkStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> _ChunkWriter:
        return _ChunkWriter(self.options)


def register_chunk_source(spark) -> None:
    """Idempotently register the mr_chunks format on this session."""
    spark.dataSource.register(ChunkDataSource)
