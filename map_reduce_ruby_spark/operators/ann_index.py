"""Durable ANN index artifacts: the IVF/PQ family's persisted form.

The MinHash near-dup path already has a real stored index
(operators/dedup_index.py — bucketed band table; probe joins pay zero
corpus-side exchange). This module gives the vector-ANN family the same
property: ``build_ivf_index`` / ``build_pq_index`` train deterministically,
and their outputs — cell assignments, centroids, PQ codes, codebooks — are
materialized to parquet so a RESTARTED session (or another cluster) probes
the stored index without retraining. A session-memoized ``.cache()`` was the
round-5 stand-in; a restart retrained — this is the real thing, mirroring
the reference's deploy story of persisting intermediate artifacts between
phases (/root/reference/README.md:60-84, reducer.rb add_chunk ingest).

Layout (all under one index root):

    <root>/cells/cell=<c>/*.parquet   (id, e)   — PARTITIONED by cell id
    <root>/centroids/*.parquet        (cell, ce)
    <root>/pq_codes/*.parquet         (id, code0..code{n_sub-1})
    <root>/pq_books/*.parquet         (m, code, cw)

``cells`` is directory-PARTITIONED on the probe key rather than bucketed:
an IVF probe touches ``nprobe``/k of the cells, and the probe join's
broadcast side (queries x probed cells) drives DYNAMIC PARTITION PRUNING —
the stored corpus scan reads ONLY the probed cells' files. Bucketing
co-locates equi-join keys for shuffle-free big-big joins (the minhash band
index's access pattern); partition pruning cuts IO for tiny-probe joins
(this access pattern). At 100 TB with k = 1024 cells and nprobe = 128, a
query batch reads ~1/8th of the corpus bytes instead of all of them.

Determinism: the builders are bit-deterministic (strided seeds, scaled-int64
centroid sums), so stored == rebuilt == the DuckDB oracle's SQL rebuild —
the ``knn_ivf_persisted`` catalog entry is gated on the SAME composed oracle
as ``knn_ivf``, proving the stored index interchangeable with the derived
one. tests/test_ann_index.py adds the restart property: reload from disk,
search, byte-equal results, no retrain (file mtimes untouched).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.ivf import build_ivf_index
from map_reduce_ruby_spark.operators.pq import build_pq_index

# Builder-version tokens, baked into every index's _META.json and checked at
# load/exists time. /tmp-cached index roots outlive the process (the
# knn_ivf_persisted entry keys its cache on fixture content), so WITHOUT a
# version gate, a later change to build_ivf_index / adaptive_cell_count would
# silently load an index built by OLD code and diverge from the oracle. Bump
# on ANY change to the builder's algorithm or default parameters.
IVF_INDEX_VERSION = 2
PQ_INDEX_VERSION = 2

_META_NAME = "_META.json"


def _read_meta(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _META_NAME), encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _publish_atomic(tmp: str, path: str, valid) -> None:
    """Atomically publish a fully-staged index directory: a reader can NEVER
    observe a half-written index because the root appears in one rename.
    Concurrent builders race safely — first complete publish wins, the loser
    discards its staging dir. A pre-existing root that fails ``valid()``
    (stale version, crashed legacy writer) is replaced."""
    try:
        os.rename(tmp, path)
        return
    except OSError:
        pass
    if os.path.isdir(path) and not valid(path):
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
            return
        except OSError:
            pass
    # a concurrent builder published a valid index between our checks — keep
    # the winner, discard ours
    shutil.rmtree(tmp, ignore_errors=True)


def _ivf_meta(k: int | None) -> dict:
    return {
        "format": "ivf_index",
        "version": IVF_INDEX_VERSION,
        "k": "adaptive" if k is None else int(k),
        "iterations": 2,
    }


def read_index_meta(path: str) -> dict | None:
    """The index's _META.json (version, build params, ingested batch count)
    or None. ``batches`` counts committed ingests: 1 after write_ivf_index,
    +1 per append_ivf_batch — callers caching an incrementally-maintained
    index check it to detect a crashed half-append (parquet append commits
    its files atomically, but the batch's MEMBERSHIP in the index is only
    durable once the meta bump lands)."""
    return _read_meta(path)


def ivf_index_exists(path: str, k: int | None = None) -> bool:
    """Fully committed (parquet _SUCCESS markers) AND built by the CURRENT
    builder with the same parameters (_META.json match) — a content-keyed
    cache hit on an index trained by older code or other params is a miss,
    not a silent stale load."""
    meta = _read_meta(path)
    return (
        os.path.exists(os.path.join(path, "cells", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "centroids", "_SUCCESS"))
        and meta is not None
        and {f: v for f, v in meta.items() if f != "batches"} == _ivf_meta(k)
    )


def write_ivf_index(
    spark: SparkSession, vectors: DataFrame, path: str, k: int | None = None
) -> None:
    """Train (deterministic k-means, scale-adaptive k when ``k=None``) and
    persist. The index is staged under a sibling temp root and published by
    ONE atomic rename — concurrent or crashed builders can never expose a
    torn index (the non-atomic two-directory overwrite this replaces
    could). Rebuilding is an idempotent full refresh; ``append_ivf_batch``
    is the incremental ingest path (assign-only, centroids untouched)."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    assignments, centroids = build_ivf_index(vectors, k=k, iterations=2)
    (
        assignments.write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(tmp, "cells"))
    )
    cdf = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)], "cell long, ce array<double>"
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_ivf_meta(k), batches=1), f)
    # the durable table replaces the in-session cache the builder returned
    assignments.unpersist()
    _publish_atomic(tmp, path, lambda p: ivf_index_exists(p, k))


def append_ivf_batch(spark: SparkSession, vectors: DataFrame, path: str) -> None:
    """Incremental ingest: assign a NEW batch to the STORED centroids and
    append its rows into their cell partitions — no retrain, no corpus
    rewrite. This is the IVF maintenance model (FAISS add-after-train;
    centroids move only on scheduled full rebuilds) and the reference's
    add_chunk-per-batch deploy story (reference lib/map_reduce/reducer.rb:
    34-42) applied to the index artifact: each day's batch lands in the
    standing structure, paying cost proportional to the BATCH.

    Mechanics: one narrow assignment scan over the batch (literal-centroid
    argmin, operators/ivf.py assign_cells — no join, no shuffle), then a
    parquet append into the cell-partitioned layout: existing cell FILES
    are never touched (pinned by an mtime test), the new files join their
    cell directories and partition pruning covers old and new rows alike.
    The meta's ``batches`` counter is bumped LAST (atomic rewrite): a
    crashed append leaves the counter un-bumped, so a cache keyed on the
    expected batch count refuses the torn state instead of silently
    serving an index missing its newest batch."""
    import uuid as _uuid

    from map_reduce_ruby_spark.operators.ivf import assign_cells

    meta = _read_meta(path)
    if meta is None or not os.path.exists(os.path.join(path, "cells", "_SUCCESS")):
        raise ValueError(f"{path!r} does not hold a committed IVF index")
    crows = (
        spark.read.parquet(os.path.join(path, "centroids")).orderBy("cell").collect()
    )
    centroids = [list(r.ce) for r in crows]
    assign_cells(vectors, centroids).write.partitionBy("cell").mode("append").parquet(
        os.path.join(path, "cells")
    )
    # commit point for the batch's membership: atomic meta rewrite
    new_meta = dict(meta, batches=int(meta.get("batches", 1)) + 1)
    tmp = os.path.join(path, f".{_META_NAME}.{_uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_meta, f)
    os.replace(tmp, os.path.join(path, _META_NAME))


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """(assignments(id, e, cell), centroids) read from storage — no
    training jobs, no corpus scan until a consumer runs. Centroids are the
    bounded collected artifact (k x dim doubles) every probe embeds as
    literals, exactly as the in-session build returns them."""
    cells = spark.read.parquet(os.path.join(path, "cells")).select(
        "id", "e", F.col("cell").cast("long").alias("cell")
    )
    crows = spark.read.parquet(os.path.join(path, "centroids")).orderBy("cell").collect()
    centroids = [list(r.ce) for r in crows]
    return cells, centroids


def _pq_meta(dim: int, n_sub: int, k: int) -> dict:
    return {
        "format": "pq_index",
        "version": PQ_INDEX_VERSION,
        "dim": int(dim),
        "n_sub": int(n_sub),
        "k": int(k),
    }


def pq_index_exists(
    path: str, dim: int | None = None, n_sub: int = 8, k: int = 16
) -> bool:
    """Committed AND current-version (same _META.json policy as IVF). With
    ``dim=None`` the dim field is not compared (callers that only know the
    path can still validate version/params)."""
    if not (
        os.path.exists(os.path.join(path, "pq_codes", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "pq_books", "_SUCCESS"))
    ):
        return False
    meta = _read_meta(path)
    if meta is None:
        return False
    expect = _pq_meta(meta.get("dim", -1) if dim is None else dim, n_sub, k)
    return {f: v for f, v in meta.items() if f != "batches"} == expect


def write_pq_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    dim: int,
    n_sub: int = 8,
    k: int = 16,
) -> None:
    """Train the per-subspace codebooks and persist codes + codebooks (same
    staged-build + atomic-rename publish as write_ivf_index). The codes
    table is the 8-bytes-per-vector artifact the ADC scan reads; the
    codebooks are a bounded (n_sub x k x sub_dim) side table."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    codes, books = build_pq_index(vectors, dim=dim, n_sub=n_sub, k=k)
    codes.write.mode("overwrite").parquet(os.path.join(tmp, "pq_codes"))
    rows = [
        (m, c, list(cw)) for m, book in enumerate(books) for c, cw in enumerate(book)
    ]
    bdf = spark.createDataFrame(rows, "m long, code long, cw array<double>")
    bdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "pq_books"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_pq_meta(dim, n_sub, k), batches=1), f)
    codes.unpersist()
    _publish_atomic(tmp, path, lambda p: pq_index_exists(p, dim, n_sub, k))


def append_pq_batch(spark: SparkSession, vectors: DataFrame, path: str) -> None:
    """Incremental PQ ingest — the append_ivf_batch model applied to the
    compressed artifact: the new batch is ENCODED against the STORED
    codebooks (one narrow argmin projection per subspace, no training) and
    its codes appended to the codes table; the codebooks and every
    pre-existing codes file are untouched. Because encode-with-fixed-books
    is deterministic, incremental codes are bit-identical to what a full
    re-encode would produce for the same rows. The meta batch counter
    bumps LAST (atomic rewrite) as the batch's membership commit point."""
    import uuid as _uuid

    from map_reduce_ruby_spark.operators.pq import encode_with_books

    meta = _read_meta(path)
    if meta is None or not os.path.exists(os.path.join(path, "pq_codes", "_SUCCESS")):
        raise ValueError(f"{path!r} does not hold a committed PQ index")
    _codes, books = load_pq_index(spark, path)
    dim = int(meta["dim"])
    encode_with_books(vectors, books, dim).write.mode("append").parquet(
        os.path.join(path, "pq_codes")
    )
    new_meta = dict(meta, batches=int(meta.get("batches", 1)) + 1)
    tmp = os.path.join(path, f".{_META_NAME}.{_uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_meta, f)
    os.replace(tmp, os.path.join(path, _META_NAME))


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[list[float]]]]:
    """(codes(id, code0..), codebooks) read from storage, shaped exactly
    like build_pq_index's return so pq_search/ivf_pq_search accept either."""
    codes = spark.read.parquet(os.path.join(path, "pq_codes"))
    brows = spark.read.parquet(os.path.join(path, "pq_books")).orderBy("m", "code").collect()
    n_sub = max(int(r.m) for r in brows) + 1 if brows else 0
    books: list[list[list[float]]] = [[] for _ in range(n_sub)]
    for r in brows:
        books[int(r.m)].append(list(r.cw))
    return codes, books
