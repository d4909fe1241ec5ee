"""Bucketed (pre-partitioned) tables: the shuffle-free repeated-join layout.

At 100 TB, a fact-to-fact join (lineitem x orders) shuffles both sides EVERY
query. Bucketing pays that shuffle once at write time: both tables are
hash-bucketed (and sorted) on the join key, so every subsequent join or
aggregation on that key is exchange-free — the scan itself satisfies the
required distribution. This is the DataFrame face of the reference's
"partition -> file" shuffle handoff (Mapper#shuffle, O11/O12): partition
placement persisted as a physical layout instead of re-derived per query.

Usage::

    write_bucketed(orders,   "orders_b",   "o_orderkey", 16, path)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 16, path)
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # executed plan: SortMergeJoin over two bucketed scans, ZERO Exchange

Bucket counts must match across tables meant to co-join; pick them so a
bucket of the biggest table fits an executor core's working set (e.g. 100 TB
/ 2 GB ≈ 50k buckets, rounded to a power of two).

Publish lifecycle (same rules as the band index, operators/dedup_index.py):
the data is STAGED under a temp root and published by ONE rename with
content-addressed keep-winner semantics — two processes cold-building the
same path can never delete each other's live or in-flight files; the loser
discards its staging copy and ATTACHES the winner's bytes. The writer's
layout (key, bucket count, sort, column DDL) is recorded in a sidecar so a
fresh process can re-register the exact spec (``register_bucketed``) —
guessing a different bucket count would silently change row placement and
corrupt every co-located join. ``replace=True`` is the only destructive
mode (rebuild over DIFFERENT data at the same path) and is NOT reader-safe
across processes; give such a path a per-process component.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from map_reduce_ruby_spark.operators.artifact_store import _publish_atomic

# Sidecar recording the writer's full layout next to _SUCCESS (the band
# index's _BUCKET_SPEC pattern, plus the column DDL so attaching needs no
# parquet-footer sniff).
_LAYOUT_SPEC = "_LAYOUT_SPEC.json"


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    replace: bool = False,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) table at an explicit path.

    Works with the default in-memory catalog — bucketing metadata lives in
    the session catalog, data in plain parquet part files per bucket.

    Staged build + one-rename keep-winner publish: if ``path`` already
    holds a completed layout (``_SUCCESS`` AND the layout sidecar present;
    a sidecar-less directory is a legacy/torn artifact and is replaced),
    this build's staging copy is discarded and the existing files are
    attached instead (raising if the published layout differs from the
    requested one) —
    a concurrent or earlier builder's readers are never killed by a
    delete-then-rewrite. Pass ``replace=True`` only for per-process reset
    paths (it drops the table and removes the live files first).
    """
    import shutil

    spark = df.sparkSession
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    stage_table = f"{table}_stage_{uuid.uuid4().hex[:8]}"
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", tmp).mode("overwrite").format("parquet").saveAsTable(
        stage_table
    )
    spark.sql(f"DROP TABLE {stage_table}")  # external: files remain at tmp
    spec = {
        "key": key,
        "n_buckets": int(n_buckets),
        "sorted": bool(sort),
        "ddl": ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ),
    }
    with open(os.path.join(tmp, _LAYOUT_SPEC), "w", encoding="utf-8") as f:
        json.dump(spec, f)
    if replace:
        if spark.catalog.tableExists(table):
            spark.sql(f"DROP TABLE {table}")
        shutil.rmtree(path, ignore_errors=True)
    # A complete layout needs BOTH markers: _SUCCESS (data finished) and the
    # layout sidecar (spec attachable). A directory with only _SUCCESS is a
    # legacy/torn artifact — keeping it would discard this fresh build and
    # then fail register_bucketed's hard sidecar requirement, losing both.
    _publish_atomic(
        tmp,
        path,
        keep_if_valid=lambda p: all(
            os.path.exists(os.path.join(p, m)) for m in ("_SUCCESS", _LAYOUT_SPEC)
        ),
    )
    # When keep-winner attached an EXISTING layout, its spec governs row
    # placement — a caller who asked for a different (key, buckets, sort)
    # must hear about it loudly: mismatched bucket layouts across co-joined
    # tables silently mis-place rows in every downstream join.
    with open(os.path.join(path, _LAYOUT_SPEC), encoding="utf-8") as f:
        published = json.load(f)
    mismatch = {
        k: (spec[k], published.get(k))
        for k in ("key", "n_buckets", "sorted")
        if published.get(k) != spec[k]
    }
    if mismatch:
        raise ValueError(
            f"bucketed table at {path!r} already published with a different "
            f"layout {mismatch} (requested, published); same-path builds are "
            "content-addressed — use a new path (or replace=True on a "
            "per-process path) to change the layout"
        )
    if spark.catalog.tableExists(table):
        spark.sql(f"DROP TABLE {table}")
    register_bucketed(spark, table, path)


def register_bucketed(spark: SparkSession, table: str, path: str) -> None:
    """ATTACH a completed bucketed-table directory as ``table`` in THIS
    process's catalog — the cross-process reuse path (the catalog is
    per-process; the files are not). The DDL recreates the WRITER's exact
    layout from the published sidecar; a corrupt sidecar raises rather
    than guessing a spec that would silently mis-place rows in every
    co-located join (register_minhash_index's rule)."""
    spec_path = os.path.join(path, _LAYOUT_SPEC)
    try:
        with open(spec_path, encoding="utf-8") as f:
            spec = json.load(f)
        ddl, key = spec["ddl"], spec["key"]
        n_buckets = int(spec["n_buckets"])
        sort_clause = f"SORTED BY ({key}) " if spec["sorted"] else ""
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no {_LAYOUT_SPEC} at {path!r}: not a published bucketed table"
        ) from None
    except (OSError, ValueError, KeyError) as e:
        raise ValueError(
            f"corrupt {_LAYOUT_SPEC} at {path!r}: refusing to guess a "
            f"bucket layout ({e})"
        ) from e
    spark.sql(
        f"CREATE TABLE {table} ({ddl}) USING parquet "
        f"CLUSTERED BY ({key}) {sort_clause}"
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
