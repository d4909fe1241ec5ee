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


def _publish_atomic(tmp: str, path: str) -> None:
    """Atomically publish a fully-staged directory: a reader can NEVER
    observe a half-written artifact because it appears in one rename.
    TRUE-REFRESH semantics (write_* documents 'rebuilding is an idempotent
    full refresh'): a pre-existing destination — stale build, crashed
    writer, or an index over OLDER data — is REPLACED, never silently kept
    (keeping it would serve stale neighbors with no error). Concurrent
    same-content builders race benignly (the builders are deterministic, so
    either winner is correct); any other failure raises instead of
    pretending the publish happened."""
    try:
        os.rename(tmp, path)
        return
    except OSError:
        pass
    shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError as e:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"could not publish staged index {tmp!r} -> {path!r}: {e}"
        ) from e


def _ivf_meta(k: int | None) -> dict:
    return {
        "format": "ivf_index",
        "version": IVF_INDEX_VERSION,
        "k": "adaptive" if k is None else int(k),
        "iterations": 2,
    }


def read_index_meta(path: str) -> dict | None:
    """The index's _META.json (version, build params, committed ingest list)
    or None. ``ingests`` lists the committed per-batch partition ids
    (``ingest=<n>`` directories under the data root) and ``batches`` ==
    len(ingests): each append stages its batch as a separate ingest
    partition and only the meta rewrite (atomic) makes it a member —
    loads filter the scan to committed ingests (partition-pruned). A
    crashed append therefore leaves an unlisted orphan partition — not
    duplicate rows — and RETRYING the append is safe: the retry replaces
    the orphan and commits it exactly once (no double-ingest is possible,
    unlike an in-place parquet append where data lands before the marker)."""
    return _read_meta(path)


def ivf_index_exists(path: str, k: int | None = None) -> bool:
    """Fully committed (parquet _SUCCESS markers) AND built by the CURRENT
    builder with the same parameters (_META.json match) — a content-keyed
    cache hit on an index trained by older code or other params is a miss,
    not a silent stale load."""
    meta = _read_meta(path)
    return (
        os.path.exists(os.path.join(path, "cells", "ingest=1", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "centroids", "_SUCCESS"))
        and meta is not None
        and {f: v for f, v in meta.items() if f not in ("batches", "ingests")}
        == _ivf_meta(k)
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
        .parquet(os.path.join(tmp, "cells", "ingest=1"))
    )
    cdf = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)], "cell long, ce array<double>"
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_ivf_meta(k), batches=1, ingests=[1]), f)
    # the durable table replaces the in-session cache the builder returned
    assignments.unpersist()
    _publish_atomic(tmp, path)


def append_ivf_batch(spark: SparkSession, vectors: DataFrame, path: str) -> None:
    """Incremental ingest: assign a NEW batch to the STORED centroids and
    append its rows into their cell partitions — no retrain, no corpus
    rewrite. This is the IVF maintenance model (FAISS add-after-train;
    centroids move only on scheduled full rebuilds) and the reference's
    add_chunk-per-batch deploy story (reference lib/map_reduce/reducer.rb:
    34-42) applied to the index artifact: each day's batch lands in the
    standing structure, paying cost proportional to the BATCH.

    Mechanics: one narrow assignment scan over the batch (assign_cells —
    no join, no shuffle), staged into a dot-prefixed temp dir (invisible
    to partition discovery even mid-write), published by one rename as
    the next ``ingest=<n>`` partition under the cells root, then an
    atomic meta rewrite listing n in ``ingests`` — that rewrite IS the
    batch's membership commit. Existing ingest partitions are never
    touched (pinned by an mtime test); loads scan the ONE cells root with
    an ingest-membership partition filter, so both partition levels
    (ingest, cell) prune. Crash-retry is IDEMPOTENT: a crash before the
    meta rewrite leaves an unlisted orphan partition the load filters
    out, and the retry replaces it and commits exactly once."""
    from map_reduce_ruby_spark.operators.ivf import assign_cells

    meta = _read_meta(path)
    if meta is None or not os.path.exists(
        os.path.join(path, "cells", "ingest=1", "_SUCCESS")
    ):
        raise ValueError(f"{path!r} does not hold a committed IVF index")
    crows = (
        spark.read.parquet(os.path.join(path, "centroids")).orderBy("cell").collect()
    )
    centroids = [list(r.ce) for r in crows]

    ingests = [int(i) for i in meta.get("ingests", [1])]
    new_id = max(ingests) + 1
    stage = os.path.join(path, "cells", f".stage-{uuid.uuid4().hex}")
    assign_cells(vectors, centroids).select("id", "e", "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(stage)
    _publish_atomic(stage, os.path.join(path, "cells", f"ingest={new_id}"))
    # commit point for the batch's membership: atomic meta rewrite
    new_meta = dict(meta, batches=len(ingests) + 1, ingests=ingests + [new_id])
    tmp = os.path.join(path, f".{_META_NAME}.{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_meta, f)
    os.replace(tmp, os.path.join(path, _META_NAME))


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """(assignments(id, e, cell), centroids) read from storage — no
    training jobs, no corpus scan until a consumer runs. ONE scan of the
    cells root, partition-filtered to the meta's COMMITTED ingest ids:
    orphan partitions from a crashed append never enter the plan (the
    filter is a partition filter, so they cost no IO either). Centroids
    are the bounded collected artifact (k x dim doubles) every probe
    embeds as literals, exactly as the in-session build returns them."""
    meta = _read_meta(path) or {}
    ingests = [int(i) for i in meta.get("ingests", [1])]
    cells = (
        spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("ingest").isin(ingests))
        .select("id", "e", F.col("cell").cast("long").alias("cell"))
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
        os.path.exists(os.path.join(path, "pq_codes", "ingest=1", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "pq_books", "_SUCCESS"))
    ):
        return False
    meta = _read_meta(path)
    if meta is None:
        return False
    expect = _pq_meta(meta.get("dim", -1) if dim is None else dim, n_sub, k)
    return {
        f: v for f, v in meta.items() if f not in ("batches", "ingests")
    } == expect


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
    codes.write.mode("overwrite").parquet(os.path.join(tmp, "pq_codes", "ingest=1"))
    rows = [
        (m, c, list(cw)) for m, book in enumerate(books) for c, cw in enumerate(book)
    ]
    bdf = spark.createDataFrame(rows, "m long, code long, cw array<double>")
    bdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "pq_books"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_pq_meta(dim, n_sub, k), batches=1, ingests=[1]), f)
    codes.unpersist()
    _publish_atomic(tmp, path)


def append_pq_batch(spark: SparkSession, vectors: DataFrame, path: str) -> None:
    """Incremental PQ ingest — the append_ivf_batch model applied to the
    compressed artifact: the new batch is ENCODED against the STORED
    codebooks (one narrow argmin projection per subspace, no training),
    staged dot-prefixed, published by one rename as the next ``ingest=<n>``
    partition under the codes root, and committed by the atomic meta
    rewrite listing it. Codebooks and every pre-existing codes file are
    untouched; crash-retry is idempotent (an unlisted orphan partition is
    replaced, never double-counted). Encode-with-fixed-books is
    deterministic, so incremental codes are bit-identical to a full
    re-encode of the same rows."""
    from map_reduce_ruby_spark.operators.pq import encode_with_books

    meta = _read_meta(path)
    if meta is None or not os.path.exists(
        os.path.join(path, "pq_codes", "ingest=1", "_SUCCESS")
    ):
        raise ValueError(f"{path!r} does not hold a committed PQ index")
    _codes, books = load_pq_index(spark, path)
    dim = int(meta["dim"])

    ingests = [int(i) for i in meta.get("ingests", [1])]
    new_id = max(ingests) + 1
    stage = os.path.join(path, "pq_codes", f".stage-{uuid.uuid4().hex}")
    encode_with_books(vectors, books, dim).write.mode("overwrite").parquet(stage)
    _publish_atomic(stage, os.path.join(path, "pq_codes", f"ingest={new_id}"))
    new_meta = dict(meta, batches=len(ingests) + 1, ingests=ingests + [new_id])
    tmp = os.path.join(path, f".{_META_NAME}.{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_meta, f)
    os.replace(tmp, os.path.join(path, _META_NAME))


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[list[float]]]]:
    """(codes(id, code0..), codebooks) read from storage, shaped exactly
    like build_pq_index's return so pq_search/ivf_pq_search accept either.
    One scan of the codes root, partition-filtered to committed ingests
    (orphans from a crashed append never enter the plan)."""
    meta = _read_meta(path) or {}
    ingests = [int(i) for i in meta.get("ingests", [1])]
    codes = (
        spark.read.parquet(os.path.join(path, "pq_codes"))
        .filter(F.col("ingest").isin(ingests))
        .drop("ingest")
    )
    brows = spark.read.parquet(os.path.join(path, "pq_books")).orderBy("m", "code").collect()
    n_sub = max(int(r.m) for r in brows) + 1 if brows else 0
    books: list[list[list[float]]] = [[] for _ in range(n_sub)]
    for r in brows:
        books[int(r.m)].append(list(r.cw))
    return codes, books
