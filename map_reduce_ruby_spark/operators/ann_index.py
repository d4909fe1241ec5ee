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
# on ANY change to the builder's algorithm or default parameters — or to the
# on-disk layout (v3: per-ingest partition dirs).
IVF_INDEX_VERSION = 3
PQ_INDEX_VERSION = 3

# The shared artifact-store protocol (meta versioning, staged-atomic
# keep-winner publish, append lock, orphan reclamation, OPTIMIZE/VACUUM)
# lives in operators/artifact_store.py; these names are re-exported here
# for compatibility with existing importers.
from map_reduce_ruby_spark.operators.artifact_store import (  # noqa: F401
    _META_NAME,
    _AppendLock,
    _clean_orphan_stages,
    _compact_data_root,
    _data_committed,
    _publish_atomic,
    _read_meta,
    _verify_meta_unchanged,
    read_index_meta,
    vacuum_index,
)


# Session-scoped memo of LOADED index artifacts, keyed on (session, path,
# the meta's committed-ingest list, the meta file's stat). What it saves is
# DRIVER time, not compute: every load re-lists the data root (up to
# |ingests| x |cells| small files for IVF — partition discovery is
# single-threaded driver work), re-reads parquet footers for schema, and
# re-collects the centroid/codebook side table. The round-10 scaling block
# measured the warm probe path driver-bound on exactly this
# (knn_ivf_persisted ran FASTER on 8 cores than 32: ratio 0.42 — fixed
# driver cost, zero parallel compute). Reusing the DataFrame object reuses
# its InMemoryFileIndex, so a warm probe pays none of it. Correctness: any
# append/compact rewrites _META.json atomically (new ingests + new
# mtime/size), so the key rotates and a stale entry is never served;
# vacuum only deletes RETIRED generations, which a live entry's scan never
# listed. Bounded FIFO — entries hold no pinned cache, just plan objects.
from collections import OrderedDict

_LOAD_MEMO: OrderedDict = OrderedDict()
_LOAD_MEMO_CAP = 16


def _meta_stat(path: str):
    try:
        st = os.stat(os.path.join(path, _META_NAME))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _memo_get(key):
    return _LOAD_MEMO.get(key)


def _memo_put(key, value) -> None:
    _LOAD_MEMO[key] = value
    while len(_LOAD_MEMO) > _LOAD_MEMO_CAP:
        _LOAD_MEMO.popitem(last=False)


def _ivf_meta(k: int | None) -> dict:
    return {
        "format": "ivf_index",
        "version": IVF_INDEX_VERSION,
        "k": "adaptive" if k is None else int(k),
        "iterations": 2,
    }




def ivf_index_exists(path: str, k: int | None = None) -> bool:
    """Fully committed (parquet _SUCCESS markers on every ingest partition
    the meta lists) AND built by the CURRENT builder with the same
    parameters (_META.json match) — a content-keyed cache hit on an index
    trained by older code or other params is a miss, not a silent stale
    load."""
    meta = _read_meta(path)
    return (
        _data_committed(path, "cells")
        and os.path.exists(os.path.join(path, "centroids", "_SUCCESS"))
        and meta is not None
        and {f: v
        for f, v in meta.items()
        if f not in ("batches", "ingests", "batch_ids", "retired")}
        == _ivf_meta(k)
    )


def write_ivf_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    k: int | None = None,
    replace: bool = False,
) -> None:
    """Train (deterministic k-means, scale-adaptive k when ``k=None``) and
    persist. The index is staged under a sibling temp root and published by
    ONE atomic rename — concurrent or crashed builders can never expose a
    torn index.

    CONTENT-ADDRESSED paths (the default, ``replace=False``): a path is
    bound to its inputs — the deterministic builder means a VALID existing
    index at the path already holds these bytes, so the publish keeps the
    winner and discards the staging copy (never deleting a live index out
    from under concurrent readers). Rebuilding over DIFFERENT data at the
    same path requires ``replace=True``, which removes the old index first
    and is therefore NOT safe under concurrent readers of that path.
    ``append_ivf_batch`` is the incremental ingest path (assign-only,
    centroids untouched)."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    assignments, centroids = build_ivf_index(vectors, k=k, iterations=2)
    (
        # repartition ON cell before the partitionBy write: without it every
        # writing task emits one file into every cell dir it holds rows for
        # (up to tasks x k files — measured ~8k at sf0.1/k=256), and LOADS
        # pay that count back as single-threaded driver partition discovery.
        # Clustered, the tree holds ~1 file per cell. Same rows either way.
        assignments.repartition(F.col("cell"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(tmp, "cells", "ingest=1"))
    )
    cdf = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)], "cell long, ce array<double>"
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_ivf_meta(k), batches=1, ingests=[1], batch_ids=[]), f)
    # the durable table replaces the in-session cache the builder returned
    assignments.unpersist()
    if replace:
        shutil.rmtree(path, ignore_errors=True)
    _publish_atomic(tmp, path, keep_if_valid=lambda p: ivf_index_exists(p, k))


def append_ivf_batch(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    batch_id: str | None = None,
) -> None:
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
    (ingest, cell) prune.

    EXACTLY-ONCE under retries: appends serialize on an in-root lock
    (concurrent appends of different batches would both claim the same
    ingest id), dead writers' staged leftovers are reclaimed under the
    lock, a crash BEFORE the meta rewrite leaves an unlisted orphan the
    retry replaces — and passing a stable ``batch_id`` makes the retry
    idempotent even when the crash landed AFTER the commit (an already-
    committed id is a no-op, not a double-ingest)."""
    from map_reduce_ruby_spark.operators.ivf import assign_cells

    if not _data_committed(path, "cells"):
        raise ValueError(f"{path!r} does not hold a committed IVF index")

    with _AppendLock(path):
        meta = _read_meta(path)  # re-read under the lock
        done = list(meta.get("batch_ids", []))
        if batch_id is not None and batch_id in done:
            return  # this batch already committed: idempotent retry
        _clean_orphan_stages(os.path.join(path, "cells"))

        crows = (
            spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("cell")
            .collect()
        )
        centroids = [list(r.ce) for r in crows]

        ingests = [int(i) for i in meta.get("ingests", [1])]
        new_id = max(ingests) + 1
        stage = os.path.join(path, "cells", f".stage-{uuid.uuid4().hex}")
        # clustered write — ~1 file per cell per ingest (see write_ivf_index)
        assign_cells(vectors.select("id", "e"), centroids).repartition(
            F.col("cell")
        ).write.partitionBy("cell").mode("overwrite").parquet(stage)
        _verify_meta_unchanged(path, meta)  # the assign job was the long part
        # a pre-existing ingest=<n> dir here is OUR crashed predecessor's
        # uncommitted orphan (ids are monotonic under the lock): replace it
        _publish_atomic(stage, os.path.join(path, "cells", f"ingest={new_id}"))
        # commit point for the batch's membership: atomic meta rewrite
        new_meta = dict(
            meta,
            # logical ingest count, NOT len(ingests): compaction merges the
            # physical partitions but the batch history keeps counting
            batches=int(meta.get("batches", len(ingests))) + 1,
            ingests=ingests + [new_id],
            batch_ids=done + ([batch_id] if batch_id is not None else []),
        )
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
    meta = _read_meta(path)
    if meta is None or "ingests" not in meta:
        # a flat pre-v3 layout would otherwise die later with an opaque
        # unresolved-'ingest'-column error deep inside the scan
        raise ValueError(
            f"{path!r} is not a current-layout IVF index (missing meta or "
            "pre-per-ingest layout); rebuild with write_ivf_index"
        )
    ingests = [int(i) for i in meta["ingests"]]
    key = ("ivf", id(spark), path, tuple(ingests), _meta_stat(path))
    hit = _memo_get(key)
    if hit is not None:
        return hit
    cells = (
        spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("ingest").isin(ingests))
        .select("id", "e", F.col("cell").cast("long").alias("cell"))
    )
    crows = spark.read.parquet(os.path.join(path, "centroids")).orderBy("cell").collect()
    centroids = [list(r.ce) for r in crows]
    _memo_put(key, (cells, centroids))
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
        _data_committed(path, "pq_codes")
        and os.path.exists(os.path.join(path, "pq_books", "_SUCCESS"))
    ):
        return False
    meta = _read_meta(path)
    if meta is None:
        return False
    expect = _pq_meta(meta.get("dim", -1) if dim is None else dim, n_sub, k)
    return {
        f: v
        for f, v in meta.items()
        if f not in ("batches", "ingests", "batch_ids", "retired")
    } == expect


def write_pq_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    dim: int,
    n_sub: int = 8,
    k: int = 16,
    replace: bool = False,
) -> None:
    """Train the per-subspace codebooks and persist codes + codebooks (same
    staged-build + atomic-rename publish and content-addressed keep-winner
    semantics as write_ivf_index; ``replace=True`` for rebuilding over
    different data at the same path — not reader-safe). The codes table is
    the 8-bytes-per-vector artifact the ADC scan reads; the codebooks are
    a bounded (n_sub x k x sub_dim) side table."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    codes, books = build_pq_index(vectors, dim=dim, n_sub=n_sub, k=k)
    codes.write.mode("overwrite").parquet(os.path.join(tmp, "pq_codes", "ingest=1"))
    rows = [
        (m, c, list(cw)) for m, book in enumerate(books) for c, cw in enumerate(book)
    ]
    bdf = spark.createDataFrame(rows, "m long, code long, cw array<double>")
    bdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "pq_books"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(dict(_pq_meta(dim, n_sub, k), batches=1, ingests=[1], batch_ids=[]), f)
    codes.unpersist()
    if replace:
        shutil.rmtree(path, ignore_errors=True)
    _publish_atomic(
        tmp, path, keep_if_valid=lambda p: pq_index_exists(p, dim, n_sub, k)
    )


def append_pq_batch(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    batch_id: str | None = None,
) -> None:
    """Incremental PQ ingest — the append_ivf_batch model applied to the
    compressed artifact: the new batch is ENCODED against the STORED
    codebooks (one narrow argmin projection per subspace, no training),
    staged dot-prefixed, published by one rename as the next ``ingest=<n>``
    partition under the codes root, and committed by the atomic meta
    rewrite listing it. Same exactly-once machinery as append_ivf_batch:
    serialized on the in-root lock, orphan stages reclaimed, and a stable
    ``batch_id`` makes post-commit crash retries a no-op. Encode-with-
    fixed-books is deterministic, so incremental codes are bit-identical
    to a full re-encode of the same rows."""
    from map_reduce_ruby_spark.operators.pq import encode_with_books

    if not _data_committed(path, "pq_codes"):
        raise ValueError(f"{path!r} does not hold a committed PQ index")

    with _AppendLock(path):
        meta = _read_meta(path)  # re-read under the lock
        done = list(meta.get("batch_ids", []))
        if batch_id is not None and batch_id in done:
            return  # already committed: idempotent retry
        _clean_orphan_stages(os.path.join(path, "pq_codes"))

        _codes, books = load_pq_index(spark, path)
        dim = int(meta["dim"])

        ingests = [int(i) for i in meta.get("ingests", [1])]
        new_id = max(ingests) + 1
        stage = os.path.join(path, "pq_codes", f".stage-{uuid.uuid4().hex}")
        encode_with_books(vectors, books, dim).write.mode("overwrite").parquet(stage)
        _verify_meta_unchanged(path, meta)  # the encode job was the long part
        _publish_atomic(stage, os.path.join(path, "pq_codes", f"ingest={new_id}"))
        new_meta = dict(
            meta,
            # logical ingest count, NOT len(ingests): compaction merges the
            # physical partitions but the batch history keeps counting
            batches=int(meta.get("batches", len(ingests))) + 1,
            ingests=ingests + [new_id],
            batch_ids=done + ([batch_id] if batch_id is not None else []),
        )
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
    meta = _read_meta(path)
    if meta is None or "ingests" not in meta:
        raise ValueError(
            f"{path!r} is not a current-layout PQ index (missing meta or "
            "pre-per-ingest layout); rebuild with write_pq_index"
        )
    ingests = [int(i) for i in meta["ingests"]]
    key = ("pq", id(spark), path, tuple(ingests), _meta_stat(path))
    hit = _memo_get(key)
    if hit is not None:
        return hit
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
    _memo_put(key, (codes, books))
    return codes, books



def compact_ivf_index(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> bool:
    """OPTIMIZE for the durable IVF index: merge every committed ingest
    partition into ONE new generation — same rows, a bounded file count.

    Why this exists: ``append_ivf_batch`` is deliberately cheap (each batch
    lands as its own ``ingest=<n>`` partition; nothing is rewritten), so a
    year of daily ingests leaves 365 partition trees each holding up to k
    tiny cell files — at 100 TB the probe's scan cost becomes file-open
    overhead and task-scheduling churn instead of IO (the classic
    small-files problem; Delta/Iceberg ship OPTIMIZE for exactly this).
    Compaction is the other half of the append contract: appends stay
    O(batch), and a scheduled compact folds the accumulated generations
    back into one, sized ``target_file_bytes`` per output file (range-
    clustered on (cell, id): cells stay contiguous, oversize cells split).

    Mechanics mirror the append protocol exactly: serialized on the in-root
    lock, staged dot-prefixed (invisible to partition discovery mid-write),
    published by ONE rename as the next ingest id, committed by the atomic
    meta rewrite that lists only the merged generation. Readers planned
    BEFORE the commit keep reading the old ingest dirs — compaction never
    deletes them (that is ``vacuum_index``'s job, behind a grace window), so
    it is safe under concurrent readers, unlike ``replace=True`` rebuilds.
    Row multiset is unchanged and search results are bit-identical (pinned
    by tests and by the ``knn_ivf_compacted`` catalog entry, gated on the
    same split oracle as ``knn_ivf_incremental``: a compaction that
    dropped, duplicated, or perturbed anything hash-mismatches).
    Returns True when a merge happened (False: already one generation)."""
    return _compact_data_root(
        spark, path, "cells", ("cell",), target_file_bytes
    )


def compact_pq_index(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> bool:
    """``compact_ivf_index`` for the PQ codes root (unpartitioned data —
    the merge bounds the FILE count; codes are 8 bytes/vector so one
    generation is a handful of files). Codebooks are untouched: they are a
    bounded side table written once at train time."""
    return _compact_data_root(spark, path, "pq_codes", (), target_file_bytes)



# --- composed IVFADC artifact ------------------------------------------------

IVFADC_INDEX_VERSION = 1


def _ivfadc_meta(k: int | None, n_sub: int, pk: int) -> dict:
    return {
        "format": "ivfadc_index",
        "version": IVFADC_INDEX_VERSION,
        "k": "adaptive" if k is None else int(k),
        "n_sub": int(n_sub),
        "pk": int(pk),
    }


def ivfadc_index_exists(
    path: str,
    k: int | None = None,
    n_sub: int = 8,
    pk: int = 16,
    ivf_path: str | None = None,
    pq_path: str | None = None,
) -> bool:
    """Committed, current-version, AND current w.r.t. its COMPONENTS: the
    composed table is a materialized view of (IVF cells x PQ codes), so
    its meta snapshots the component generations it was built from — an
    append or compaction on either component makes the composed artifact
    a MISS (rebuild), never a silently stale serve."""
    meta = _read_meta(path)
    if meta is None or not _data_committed(path, "codes"):
        return False
    identity = {
        f: v
        for f, v in meta.items()
        if f in ("format", "version", "k", "n_sub", "pk")
    }
    if identity != _ivfadc_meta(k, n_sub, pk):
        return False
    comp = meta.get("components", {})
    for root, key in ((ivf_path, "ivf_ingests"), (pq_path, "pq_ingests")):
        if root is None:
            continue
        cmeta = _read_meta(root)
        if cmeta is None or comp.get(key) != cmeta.get("ingests"):
            return False
    return True


def write_ivfadc_index(
    spark: SparkSession,
    ivf_path: str,
    pq_path: str,
    path: str,
    k: int | None = None,
    n_sub: int = 8,
    pk: int = 16,
    replace: bool = False,
) -> None:
    """Materialize the composed FAISS IVFADC table — (id, cell,
    code0..code{n_sub-1}) — from the two component artifacts, PARTITIONED
    BY cell. The components remain the source of truth (train/append/
    compact happen there); this is the SERVING layout: the probe's
    broadcast-cell join drives dynamic partition pruning on the composed
    scan, so a query batch reads ~nprobe/k of the codes bytes — the
    property the per-query id-join of the two components cannot have
    (it re-reads every code row per session). One join at build time,
    amortized over every probe until a component generation changes
    (recorded in the meta; ivfadc_index_exists then reports a miss).
    Same staged-atomic keep-winner publish as the sibling artifacts."""
    # Snapshot the component generations BEFORE building, filter the
    # scans to exactly that snapshot, and record the SAME snapshot in the
    # composed meta — recording a re-read taken after the build would let
    # a concurrent component append land between build and publish and
    # produce a composed artifact that is stale but reports current.
    ivf_meta, pq_meta = _read_meta(ivf_path), _read_meta(pq_path)
    if not (ivf_meta and ivf_meta.get("ingests")):
        raise ValueError(f"{ivf_path!r} does not hold a committed IVF index")
    if not (pq_meta and pq_meta.get("ingests")):
        raise ValueError(f"{pq_path!r} does not hold a committed PQ index")
    comp = {
        "ivf_ingests": ivf_meta["ingests"],
        "pq_ingests": pq_meta["ingests"],
    }
    # bare data scans, partition-filtered to the snapshot (load_ivf_index/
    # load_pq_index would also collect centroids/codebooks to the driver —
    # jobs the writer has no use for)
    cells = (
        spark.read.parquet(os.path.join(ivf_path, "cells"))
        .filter(F.col("ingest").isin([int(i) for i in comp["ivf_ingests"]]))
        .select("id", F.col("cell").cast("long").alias("cell"))
    )
    codes = (
        spark.read.parquet(os.path.join(pq_path, "pq_codes"))
        .filter(F.col("ingest").isin([int(i) for i in comp["pq_ingests"]]))
        .drop("ingest")
    )
    composed = cells.join(codes, "id")
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    # clustered write — ~1 file per cell (see write_ivf_index)
    composed.repartition(F.col("cell")).write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "codes", "ingest=1"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(
            dict(_ivfadc_meta(k, n_sub, pk), batches=1, ingests=[1],
                 batch_ids=[], components=comp),
            f,
        )
    if replace:
        shutil.rmtree(path, ignore_errors=True)
    _publish_atomic(
        tmp,
        path,
        keep_if_valid=lambda p: ivfadc_index_exists(
            p, k, n_sub, pk, ivf_path=ivf_path, pq_path=pq_path
        ),
    )


def load_ivfadc_index(
    spark: SparkSession,
    path: str,
    ivf_path: str | None = None,
    pq_path: str | None = None,
) -> DataFrame:
    """(id, cell, code0..) scanned from the composed artifact, partition-
    filtered to committed ingests — shaped exactly like
    build_ivf_pq_index's return so ivf_pq_search accepts it directly.

    As strict as the ``ivfadc_index_exists`` gate on identity: raises on a
    missing artifact, a foreign format, or a different IVFADC_INDEX_VERSION
    — a caller that skips the exists gate (or races a concurrent rebuild
    past it) must never silently serve a stale or foreign-format table.
    Pass ``ivf_path``/``pq_path`` to additionally re-verify the recorded
    component 'ingests' snapshots at load time (a component append or
    compaction since the compose makes this load raise instead of serving
    a stale view)."""
    meta = _read_meta(path)
    if meta is None or "ingests" not in meta:
        raise ValueError(f"{path!r} is not a current-layout IVFADC index")
    if (
        meta.get("format") != "ivfadc_index"
        or meta.get("version") != IVFADC_INDEX_VERSION
    ):
        raise ValueError(
            f"{path!r} does not hold a current-version IVFADC index "
            f"(found format={meta.get('format')!r} "
            f"version={meta.get('version')!r}, "
            f"want ivfadc_index v{IVFADC_INDEX_VERSION})"
        )
    comp = meta.get("components", {})
    for root, key in ((ivf_path, "ivf_ingests"), (pq_path, "pq_ingests")):
        if root is None:
            continue
        cmeta = _read_meta(root)
        if cmeta is None or comp.get(key) != cmeta.get("ingests"):
            raise ValueError(
                f"{path!r} is stale w.r.t. its component {root!r}: composed "
                f"from {key}={comp.get(key)!r} but the component now holds "
                f"ingests={None if cmeta is None else cmeta.get('ingests')!r} "
                "— rebuild the composed table (write_ivfadc_index)"
            )
    ingests = [int(i) for i in meta["ingests"]]
    # memo key carries the COMPONENT meta stats too: a component append/
    # compact after this load must re-raise the staleness error above on
    # the next call, never serve the memoized composed scan
    key = (
        "ivfadc",
        id(spark),
        path,
        tuple(ingests),
        _meta_stat(path),
        None if ivf_path is None else _meta_stat(ivf_path),
        None if pq_path is None else _meta_stat(pq_path),
    )
    hit = _memo_get(key)
    if hit is not None:
        return hit
    scan = spark.read.parquet(os.path.join(path, "codes"))
    code_cols = [c for c in scan.columns if c.startswith("code")]
    out = (
        scan.filter(F.col("ingest").isin(ingests))
        .select("id", F.col("cell").cast("long").alias("cell"), *code_cols)
    )
    _memo_put(key, out)
    return out
