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

_META_NAME = "_META.json"
_APPEND_LOCK = ".append.lock"
_LOCK_STALE_SEC = 3600.0  # a lock older than this belongs to a dead writer


def _read_meta(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _META_NAME), encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _publish_atomic(tmp: str, path: str, keep_if_valid=None) -> None:
    """Atomically publish a fully-staged directory: a reader can NEVER
    observe a half-written artifact because it appears in one rename.

    When the destination already exists:

    - ``keep_if_valid(path)`` True  -> KEEP the existing artifact and
      discard the staging copy. This is correct under the module's
      content-addressed contract (a path is bound to its inputs — same
      path means a deterministic builder produced the same bytes), and it
      is what makes concurrent builders safe: the loser never deletes a
      live index out from under the winner's readers.
    - ``keep_if_valid(path)`` False (or no validator) -> the existing
      directory is a torn/stale/legacy artifact: REPLACE it. Replacement
      is not reader-safe, but nothing should be reading an invalid root.

    A publish that still cannot land RAISES and leaves the staged copy on
    disk (named in the error) — failing must never destroy BOTH the old
    artifact and the fresh build."""
    try:
        os.rename(tmp, path)
        return
    except OSError:
        pass
    if keep_if_valid is not None and keep_if_valid(path):
        shutil.rmtree(tmp, ignore_errors=True)
        return
    shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError as e:
        raise RuntimeError(
            f"could not publish staged artifact to {path!r}: {e}; the staged "
            f"copy is preserved at {tmp!r}"
        ) from e


_LOCK_HEARTBEAT_SEC = 60.0  # live holders refresh the lock mtime this often


class _AppendLock:
    """Single-writer guard for the maintenance critical section (O_EXCL
    lock file inside the index root). Concurrent appenders of DIFFERENT
    batches would otherwise both derive the same next ingest id from the
    same meta and one batch's committed rows would be replaced by the
    other's; a concurrent compaction would commit a meta that unlists a
    just-committed batch. Writers serialize; a LIVE holder heartbeats the
    lock's mtime (a maintenance job may legitimately run longer than the
    stale window — a Spark rewrite of a year's generations is hours), so
    only a genuinely DEAD writer's lock ages past _LOCK_STALE_SEC and is
    broken. (The reference's reducer ingest is single-consumer too —
    reducer.rb add_chunk; this makes that assumption explicit and safe
    instead of implicit and corrupting.)"""

    def __init__(self, path: str, name: str = _APPEND_LOCK):
        self._lock = os.path.join(path, name)
        self._hb_stop = None
        self._hb = None

    def __enter__(self):
        import threading
        import time

        deadline = time.time() + _LOCK_STALE_SEC
        while True:
            try:
                fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(self._lock)
                except OSError:
                    continue  # holder just released; retry immediately
                if age > _LOCK_STALE_SEC:
                    try:  # break a dead writer's lock
                        os.unlink(self._lock)
                    except OSError:
                        pass
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"append lock {self._lock!r} held too long"
                    ) from None
                time.sleep(0.1)

        lock_path = self._lock
        self._hb_stop = threading.Event()

        def _beat(stop=self._hb_stop):
            while not stop.wait(_LOCK_HEARTBEAT_SEC):
                try:
                    os.utime(lock_path)
                except OSError:
                    return  # lock gone: we were broken or released

        self._hb = threading.Thread(target=_beat, daemon=True)
        self._hb.start()
        return self

    def __exit__(self, *exc):
        if self._hb_stop is not None:
            self._hb_stop.set()
        try:
            os.unlink(self._lock)
        except OSError:
            pass
        return False


def _clean_orphan_stages(data_root: str) -> None:
    """Under the append lock, any .stage-* dir is a dead writer's leftover
    (the live writer is us): reclaim instead of accumulating forever."""
    try:
        names = os.listdir(data_root)
    except OSError:
        return
    for name in names:
        if name.startswith(".stage-"):
            shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)


def _verify_meta_unchanged(path: str, snapshot: dict | None) -> None:
    """CAS guard before the irreversible publish/commit steps. The lock
    plus heartbeat makes a broken lock mean a dead writer — but a writer
    stalled past the stale window (VM pause) can resume after another
    writer broke its lock and committed: committing from the stale
    snapshot would then unlist (or clobber) the other writer's batch.
    Re-reading the meta right before publishing closes that window to
    milliseconds: a moved meta aborts THIS operation (its staged output
    becomes a reclaimable orphan) instead of corrupting the index."""
    if _read_meta(path) != snapshot:
        raise RuntimeError(
            f"concurrent maintenance detected on {path!r}: the index meta "
            "changed while this writer held (or believed it held) the "
            "append lock; this operation was aborted before publishing — "
            "retry it"
        )


def _ivf_meta(k: int | None) -> dict:
    return {
        "format": "ivf_index",
        "version": IVF_INDEX_VERSION,
        "k": "adaptive" if k is None else int(k),
        "iterations": 2,
    }


def read_index_meta(path: str) -> dict | None:
    """The index's _META.json (version, build params, committed ingest list)
    or None. ``ingests`` lists the committed physical partition ids
    (``ingest=<n>`` directories under the data root) and ``batches`` the
    LOGICAL ingest count — equal until a compaction merges the physical
    list down to one generation while the history keeps counting. Each
    append stages its batch as a separate ingest
    partition and only the meta rewrite (atomic) makes it a member —
    loads filter the scan to committed ingests (partition-pruned). A
    crashed append therefore leaves an unlisted orphan partition — not
    duplicate rows — and RETRYING the append is safe: the retry replaces
    the orphan and commits it exactly once (no double-ingest is possible,
    unlike an in-place parquet append where data lands before the marker)."""
    return _read_meta(path)


def _data_committed(path: str, data_root_name: str) -> bool:
    """Every ingest partition the meta lists as committed is present with
    its parquet _SUCCESS marker. Compaction renumbers the committed list
    (ingest=1 need not exist on a compacted index), so membership comes
    from the meta, never a hard-coded first id."""
    meta = _read_meta(path)
    if meta is None or not meta.get("ingests"):
        return False
    return all(
        os.path.exists(
            os.path.join(path, data_root_name, f"ingest={int(i)}", "_SUCCESS")
        )
        for i in meta["ingests"]
    )


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
        assignments.write.partitionBy("cell")
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
        assign_cells(vectors.select("id", "e"), centroids).write.partitionBy(
            "cell"
        ).mode("overwrite").parquet(stage)
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


def _compact_data_root(
    spark: SparkSession,
    path: str,
    data_root_name: str,
    partition_cols: tuple[str, ...],
    target_file_bytes: int = 128 << 20,
    range_cols: tuple[str, ...] = ("id",),
) -> bool:
    """Shared OPTIMIZE step for the per-ingest index layouts. Returns True
    when a merge happened, False for the single-ingest no-op."""
    with _AppendLock(path):
        meta = _read_meta(path)
        if meta is None or not meta.get("ingests"):
            raise ValueError(
                f"{path!r} is not a current-layout index (missing meta or "
                "pre-per-ingest layout); nothing to compact"
            )
        ingests = [int(i) for i in meta["ingests"]]
        if len(ingests) <= 1:
            return False  # already one generation: nothing to merge
        root = os.path.join(path, data_root_name)
        _clean_orphan_stages(root)

        # One scan of the committed ingests (partition-filtered, orphans
        # never enter the plan), rewritten as ONE new ingest partition.
        merged = (
            spark.read.parquet(root)
            .filter(F.col("ingest").isin(ingests))
            .drop("ingest")
        )
        new_id = max(ingests) + 1
        stage = os.path.join(root, f".stage-{uuid.uuid4().hex}")
        # Size the output by BYTES, not by task count (the Delta/Iceberg
        # OPTIMIZE policy): an unclustered partitioned write would emit one
        # file per (task x cell) — reproducing the small-files problem it
        # is merging away — while a plain one-task-per-cell cluster caps
        # both file size and scan parallelism at k (a 100 GB cell would be
        # one 100 GB file read by one task). Range partitioning on
        # (cell, id) keeps each cell's rows contiguous, splits cells
        # larger than the target into consecutive id-ordered files (parquet
        # footer min/max on id stays prunable), and merges many small cells
        # into few writer tasks.
        total_bytes = 0
        for i in ingests:
            for r, _dd, fs in os.walk(os.path.join(root, f"ingest={i}")):
                for f in fs:
                    if f.endswith(".parquet"):
                        try:
                            total_bytes += os.path.getsize(os.path.join(r, f))
                        except OSError:
                            pass
        target = max(1, -(-total_bytes // int(target_file_bytes)))
        clustered = merged.repartitionByRange(target, *partition_cols, *range_cols)
        writer = (
            clustered.write.partitionBy(*partition_cols)
            if partition_cols
            else clustered.write
        )
        writer.mode("overwrite").parquet(stage)
        _verify_meta_unchanged(path, meta)  # the rewrite job was the long part
        # a pre-existing ingest=<new_id> dir is a crashed appender's
        # uncommitted orphan (ids are monotonic under the lock): replace it
        _publish_atomic(stage, os.path.join(root, f"ingest={new_id}"))

        # Commit point: the meta now lists ONLY the merged generation.
        # ``batches``/``batch_ids`` are logical ingest history and survive
        # compaction — an already-committed batch_id must stay a no-op on
        # retry even after its rows moved into the merged partition. The
        # merged-away generations are stamped ``retired`` AT THIS COMMIT:
        # vacuum's grace window must run from the moment readers stopped
        # being directed at them, never from the partition's write mtime
        # (a 30-day-old generation retired a second ago still has readers).
        import time

        retired = dict(meta.get("retired", {}))
        retired.update({str(i): time.time() for i in ingests})
        new_meta = dict(meta, ingests=[new_id], retired=retired)
        tmp = os.path.join(path, f".{_META_NAME}.{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(new_meta, f)
        os.replace(tmp, os.path.join(path, _META_NAME))
        return True


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


def vacuum_index(path: str, grace_sec: float = 86400.0) -> list[str]:
    """Reclaim UNLISTED ingest partitions and dead stage dirs whose grace
    window has passed — the VACUUM to ``compact_*_index``'s OPTIMIZE.

    Compaction unlists the merged-away generations but leaves their bytes,
    because a reader that planned its scan before the meta rewrite may
    still be reading them; the grace window (default 24 h, far beyond any
    query's lifetime) lets those readers drain before the bytes go. The
    window runs from the RETIRED timestamp compaction stamps into the meta
    at its commit — the moment readers stopped being directed at the
    generation — never from the partition's write mtime: a 30-day-old
    generation retired one second ago still has in-flight readers, and an
    mtime-based age would delete it under them. Only true orphans (crashed
    appends' never-listed partitions and dead stage dirs, which no reader
    can reach through the meta) age by mtime. Runs under the append lock
    so it can never race a live writer's stage dir; reclaimed retired
    stamps are pruned from the meta. Returns the removed paths."""
    import time

    removed: list[str] = []
    with _AppendLock(path):
        meta = _read_meta(path)
        if meta is None or not meta.get("ingests"):
            raise ValueError(f"{path!r} is not a current-layout index")
        committed = {f"ingest={int(i)}" for i in meta["ingests"]}
        retired: dict = meta.get("retired", {})
        reclaimed_ids: set[str] = set()
        now = time.time()
        for data_root_name in ("cells", "pq_codes", "postings"):
            root = os.path.join(path, data_root_name)
            try:
                names = os.listdir(root)
            except OSError:
                continue
            for name in names:
                if name in committed:
                    continue
                if not (name.startswith("ingest=") or name.startswith(".stage-")):
                    continue
                full = os.path.join(root, name)
                ingest_id = (
                    name.split("=", 1)[1] if name.startswith("ingest=") else None
                )
                if ingest_id is not None and ingest_id in retired:
                    age = now - float(retired[ingest_id])
                else:
                    try:
                        age = now - os.path.getmtime(full)
                    except OSError:
                        continue  # concurrently removed
                if age >= grace_sec:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
                    if ingest_id is not None:
                        reclaimed_ids.add(ingest_id)
        if reclaimed_ids:
            new_meta = dict(
                meta,
                retired={
                    i: t for i, t in retired.items() if i not in reclaimed_ids
                },
            )
            tmp = os.path.join(path, f".{_META_NAME}.{uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(new_meta, f)
            os.replace(tmp, os.path.join(path, _META_NAME))
    return removed


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
    composed.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(tmp, "codes", "ingest=1")
    )
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


def load_ivfadc_index(spark: SparkSession, path: str) -> DataFrame:
    """(id, cell, code0..) scanned from the composed artifact, partition-
    filtered to committed ingests — shaped exactly like
    build_ivf_pq_index's return so ivf_pq_search accepts it directly."""
    meta = _read_meta(path)
    if meta is None or "ingests" not in meta:
        raise ValueError(f"{path!r} is not a current-layout IVFADC index")
    ingests = [int(i) for i in meta["ingests"]]
    scan = spark.read.parquet(os.path.join(path, "codes"))
    code_cols = [c for c in scan.columns if c.startswith("code")]
    return (
        scan.filter(F.col("ingest").isin(ingests))
        .select("id", F.col("cell").cast("long").alias("cell"), *code_cols)
    )
