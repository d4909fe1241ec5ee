"""Persisted MinHash band index: build once, dedup every future ingest
against it.

``dedup_incremental_minhash`` (plans/dedup_queries.py) demonstrates the
incremental join shape with the corpus index derived in-query; THIS module is
the production form of the same contract: the band index is materialized to
storage (bucketed on ``band_hash``, the join key) so a daily ingest pays

    minhash(batch) + join(batch_bands, stored_index)

— cost tracking the BATCH, never re-sketching the corpus. Bucketing the
stored side means the per-ingest join needs no corpus-side exchange: the
scan satisfies the distribution (see operators/bucketing.py; the same
layout-as-persisted-shuffle idea as the reference's Mapper#shuffle
partition->file handoff, lib/map_reduce/mapper.rb:100-121 — placement paid
once, reused every run).

The index schema is exactly ``_minhash_bands``'s output
(doc_id, band_idx, band_hash), so the in-query and persisted paths are
interchangeable — pinned by tests/test_dedup_index.py, which asserts the
persisted-path result equals dedup_incremental_minhash's derived-path
result row-for-row.

Writers (append, compact) serialize on a per-table maintenance lock in the
Spark SQL warehouse directory — the one location that stays stable while
compaction moves the table's data location. Without it, a compactor's scan
could list files before a concurrent append lands and the location flip
would silently drop that batch's bands. (Same single-writer model as the
ANN indexes' in-root append lock; the reference's reducer ingest is
single-consumer too, reducer.rb add_chunk.)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.artifact_store import (
    _AppendLock,
    _publish_atomic,
)

# Sidecar recording the writer's bucket spec next to _SUCCESS, so a fresh
# process ATTACHING the index (register_minhash_index) recreates the
# exact layout instead of guessing — "the bucket spec is the table's
# identity, never a caller-supplied guess" (_table_bucket_count).
_BUCKET_SPEC = "_BUCKET_SPEC.json"


def _maintenance_lock(spark: SparkSession, table: str) -> _AppendLock:
    """Per-table writer lock, homed in the warehouse dir (stable across
    the location flips compaction performs; shared in deployments that
    share a warehouse). O_EXCL + heartbeat semantics from _AppendLock."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    os.makedirs(wh, exist_ok=True)
    return _AppendLock(wh, name=f".{table}.maintenance.lock")


def _table_bucket_count(spark: SparkSession, table: str) -> int:
    """The table's OWN bucket count, read from the catalog — the bucket
    spec is the table's identity, never a caller-supplied guess: writing
    with a mismatched count would silently change the layout and break
    the one-merged-file-per-bucket contract."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    raise ValueError(f"{table!r} is not a bucketed table")


def write_minhash_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 16,
    replace: bool = False,
) -> None:
    """Materialize the MinHash band index for ``docs`` (doc_id, text) as a
    bucketed table: bucketed + sorted on band_hash so future probe joins
    are corpus-shuffle-free.

    The data lands via STAGED build + one-rename publish with
    content-addressed keep-winner semantics (artifact_store rules): two
    processes cold-building the same path can never delete each other's
    in-flight or live files — the loser discards its staging copy and
    attaches the winner's. ``replace=True`` rebuilds over DIFFERENT data
    at the same path (not reader-safe; only the per-invocation reset
    entries use it). The writer's bucket spec is recorded in a sidecar so
    a fresh process can attach the exact layout."""
    import shutil

    from map_reduce_ruby_spark.plans.dedup_queries import _bands_for_docs

    spark = docs.sparkSession
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    stage_table = f"{table}_stage_{uuid.uuid4().hex[:8]}"
    (
        # Pre-partition the bands on the BUCKET key before the bucketed
        # write: repartition(n, col) is the same pmod(murmur3) placement
        # the native bucketed writer uses, so each writer task holds
        # exactly one bucket and emits ONE file — without it every task
        # writes a file into every bucket it holds rows for (tasks x
        # n_buckets small files per generation). The sketch still runs at
        # full scan parallelism BEFORE the exchange.
        _bands_for_docs(docs)
        .repartition(n_buckets, F.col("band_hash"))
        .write.bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .option("path", tmp)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(stage_table)
    )
    spark.sql(f"DROP TABLE {stage_table}")  # external: files remain at tmp
    with open(os.path.join(tmp, _BUCKET_SPEC), "w", encoding="utf-8") as f:
        json.dump({"n_buckets": int(n_buckets)}, f)
    if replace:
        if spark.catalog.tableExists(table):
            spark.sql(f"DROP TABLE {table}")
        shutil.rmtree(path, ignore_errors=True)
    _publish_atomic(
        tmp,
        path,
        keep_if_valid=lambda p: os.path.exists(os.path.join(p, "_SUCCESS")),
    )
    if spark.catalog.tableExists(table):
        spark.sql(f"DROP TABLE {table}")
    register_minhash_index(spark, table, path)


def register_minhash_index(
    spark: SparkSession, table: str, path: str, n_buckets: int | None = None
) -> None:
    """ATTACH a completed band-index directory as ``table`` in THIS
    process's catalog — the cross-process reuse path. ``tableExists`` is
    per-process (each Spark app has its own catalog), so a fresh process
    finding the content-addressed ``path`` already built must register
    the existing files, NOT rebuild: ``write_minhash_index``'s
    mode=overwrite deletes the live files first, and a sibling process
    whose readers planned against them dies with FILED_READ_FILE
    mid-scan (observed exactly that under two concurrent suites). The
    DDL recreates the bucket spec the writer used — read from the
    ``_BUCKET_SPEC`` sidecar the writer published, never a caller guess
    (a mismatched count would silently mis-place rows and drop matches) —
    so probe joins stay bucketed and corpus-shuffle-free (asserted equal
    row-for-row and plan-shape in tests/test_dedup_index.py)."""
    if n_buckets is None:
        spec_path = os.path.join(path, _BUCKET_SPEC)
        try:
            with open(spec_path, encoding="utf-8") as f:
                n_buckets = int(json.load(f)["n_buckets"])
        except FileNotFoundError:
            # pre-sidecar layout: every historical writer used the default.
            # ONLY absence falls back — the sidecar is published atomically
            # with the artifact (same one-rename), so a present-but-
            # unparseable spec means corruption, and guessing 16 over a
            # non-16-bucket layout would silently mis-place rows and drop
            # matches. Corruption must surface, not degrade.
            n_buckets = 16
        except (OSError, ValueError, KeyError) as e:
            raise ValueError(
                f"corrupt {_BUCKET_SPEC} at {path!r}: refusing to guess a "
                f"bucket spec over an existing layout ({e})"
            ) from e
    spark.sql(
        f"CREATE TABLE {table} (doc_id BIGINT, band_idx INT, band_hash STRING) "
        f"USING parquet CLUSTERED BY (band_hash) SORTED BY (band_hash) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


# Committed-batch-id record, DATA-COLOCATED in the index directory (like
# _BUCKET_SPEC): a fresh build publishes a directory with no record, so a
# rebuilt table can never inherit stale ids from a prior incarnation of
# the same name (a warehouse-homed record would leak exactly that), and
# the record travels with the content-addressed path across processes.
# Compaction copies it into the new generation before the location flip.
_BATCHES_RECORD = "_BATCHES.json"


def _table_location(spark: SparkSession, table: str) -> str:
    loc = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .filter(F.col("col_name") == "Location")
        .collect()[0][1]
    )
    return loc[len("file:"):] if loc.startswith("file:") else loc


def _committed_batch_ids(spark: SparkSession, table: str) -> list[str]:
    """Batch ids already appended into ``table``'s live generation (call
    under the maintenance lock for a read that can't race a writer)."""
    try:
        rec = os.path.join(_table_location(spark, table), _BATCHES_RECORD)
        with open(rec, encoding="utf-8") as f:
            return list(json.load(f)["batch_ids"])
    except FileNotFoundError:
        return []


def _commit_batch_id(spark: SparkSession, table: str, batch_id: str) -> None:
    rec = os.path.join(_table_location(spark, table), _BATCHES_RECORD)
    ids = _committed_batch_ids(spark, table)
    if batch_id in ids:
        return
    tmp = f"{rec}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"batch_ids": ids + [batch_id]}, f)
    os.replace(tmp, rec)


def append_minhash_batch(
    docs: DataFrame, table: str, batch_id: str | None = None
) -> None:
    """Incremental index maintenance: sketch ONLY the new batch and append
    its (doc_id, band_idx, band_hash) rows into the persisted band index —
    the corpus is never re-sketched and its existing bucket files are never
    rewritten (pinned by an mtime test). Appending with the table's OWN
    bucket spec keeps the bucketed layout: new files join their band_hash
    buckets, so probe joins stay corpus-shuffle-free over old and new rows
    alike. Serializes on the per-table maintenance lock: an append racing
    a compaction could otherwise land its files in the old generation an
    instant before the location flip and be silently dropped. Because
    banding has no trained state (unlike IVF centroids), the
    incrementally-maintained index is EXACTLY the full rebuild — the
    dedup_index_append catalog entry is gated on that equality.

    ``batch_id`` makes retries idempotent, matching the other stores'
    append protocol (nb_store append_nb_batch, ann_index append_ivf_batch):
    an id already committed to the data-colocated batch record is a
    no-op, so a crash-rerun can't double a batch's bands and the
    maintained index keeps the full-rebuild MULTISET equality, not just
    the duplicate-invariant probe equality. The id commits AFTER the data
    lands (a crash exactly between the table append and the record rename
    re-appends once on retry — the same post-commit window every
    data+marker store has; probe results are duplicate-invariant, so the
    window costs bytes, never wrong rows). ``None`` keeps the
    unconditional-append behavior for callers with their own exactly-once
    layer (the streaming entries' checkpoint)."""
    from map_reduce_ruby_spark.plans.dedup_queries import _bands_for_docs

    spark = docs.sparkSession
    with _maintenance_lock(spark, table):
        if batch_id is not None and batch_id in _committed_batch_ids(
            spark, table
        ):
            return
        n_buckets = _table_bucket_count(spark, table)
        (
            # one file per bucket per append (see write_minhash_index)
            _bands_for_docs(docs)
            .repartition(n_buckets, F.col("band_hash"))
            .write.bucketBy(n_buckets, "band_hash")
            .sortBy("band_hash")
            .mode("append")
            .format("parquet")
            .saveAsTable(table)
        )
        if batch_id is not None:
            _commit_batch_id(spark, table, batch_id)


def compact_minhash_index(spark: SparkSession, table: str, dst_path: str) -> str:
    """OPTIMIZE for the persisted band index — the same lifecycle step the
    ANN indexes get from compact_ivf_index: each ``append_minhash_batch``
    adds its own files into every bucket, so a year of daily ingests turns
    each bucket into hundreds of small files and the probe join's scan
    cost becomes file-open overhead instead of IO.

    The rewrite is ZERO-shuffle: with the bucketed scan forced on (the
    planner's autoBucketedScan would demote it here — it sees no join
    needing the distribution — and that demotion also elides the
    bucket-aligned exchange a repartition would add, scattering buckets
    across tasks), each task reads exactly one bucket's many files and
    writes its ONE merged file; the source layout IS the shuffle, already
    paid at append time. Parallelism is the bucket count by construction —
    the right trade for an IO-bound merge. The bucket count is read from
    the table's own catalog spec, so the layout can never silently change.

    The swap is a single-statement POINTER FLIP: the merged generation is
    written to ``dst_path`` under a temp catalog name (a crash here leaves
    the live table untouched; stale temp tables from dead compactors are
    dropped on the next run), then ``ALTER TABLE ... SET LOCATION`` moves
    the LIVE table's data pointer in one metastore operation — there is no
    instant at which the table doesn't exist, a crash leaves it pointing
    at exactly one complete generation, and a post-crash append lands in
    whichever generation the pointer names (never a fresh empty table).
    Readers holding pre-flip DataFrames keep reading the OLD generation's
    files, which stay on disk at the returned old location until the
    caller reclaims them after a drain window — the vacuum_index model.
    Serializes on the per-table maintenance lock against appends. Row
    multiset is unchanged — gated by the dedup_index_compacted catalog
    entry on the same full-rebuild oracle as dedup_index_append; the probe
    plan stays bucketed and corpus-shuffle-free (plan-asserted in tests).
    Returns the old generation's storage location."""
    with _maintenance_lock(spark, table):
        # reclaim dead compactors' temp catalog entries (their data dirs
        # are the caller's dst_path choices; files are never deleted here)
        for r in spark.sql(f"SHOW TABLES LIKE '{table}_compact_*'").collect():
            spark.sql(f"DROP TABLE IF EXISTS {r.tableName}")

        old_loc = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .filter(F.col("col_name") == "Location")
            .collect()[0][1]
        )
        n_buckets = _table_bucket_count(spark, table)
        tmp_table = f"{table}_compact_{uuid.uuid4().hex[:8]}"
        conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        saved = spark.conf.get(conf_key, "true")
        spark.conf.set(conf_key, "false")
        try:
            (
                spark.table(table)
                .write.bucketBy(n_buckets, "band_hash")
                .sortBy("band_hash")
                .option("path", dst_path)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp_table)
            )
        finally:
            spark.conf.set(conf_key, saved)
        # carry the committed-batch-id record into the new generation
        # BEFORE the flip (appends serialize on this lock, so the record
        # is stable here; a crash before the ALTER leaves the live table
        # and its record untouched at the old location)
        src_rec = os.path.join(
            old_loc[len("file:"):] if old_loc.startswith("file:") else old_loc,
            _BATCHES_RECORD,
        )
        if os.path.exists(src_rec):
            import shutil

            shutil.copyfile(src_rec, os.path.join(dst_path, _BATCHES_RECORD))
        # commit point: one metastore statement moves the data pointer
        spark.sql(f"ALTER TABLE {table} SET LOCATION '{dst_path}'")
        spark.sql(f"DROP TABLE {tmp_table}")  # external: dst files remain
        spark.sql(f"REFRESH TABLE {table}")
        return old_loc


def dedup_against_index(
    spark: SparkSession, batch: DataFrame, table: str
) -> DataFrame:
    """Near-dup check of a new batch (doc_id, text) against the PERSISTED
    index: returns (doc_id, dup_of, n_shared_bands) for batch docs sharing
    >= 1 band bucket with a stored corpus doc. The batch side is sketched
    fresh (small); the index side is a bucketed scan — no corpus shuffle,
    no corpus re-sketch."""
    from map_reduce_ruby_spark.plans.dedup_queries import _bands_for_docs

    idx = spark.table(table)
    probe = _bands_for_docs(batch)
    return (
        probe.join(
            idx.select(
                F.col("doc_id").alias("c_doc"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .groupBy(F.col("doc_id"))
        .agg(
            F.min("c_doc").alias("dup_of"),
            F.countDistinct("band_idx").alias("n_shared_bands"),
        )
    )
