"""Small-file compaction — the table-maintenance operator every long-lived
lake needs: streaming ingests and per-batch sinks leave thousands of tiny
files per partition, and at 100 TB the scan cost becomes file-open overhead
plus useless task scheduling (one task per 2 KB file) instead of I/O.

Compaction here is the Delta/Iceberg OPTIMIZE primitive expressed with plain
DataFrame ops:

    read small files -> repartitionByRange(target_files, sort_cols)
                     -> sortWithinPartitions(sort_cols)
                     -> write to a new generation directory

Range partitioning (sampled boundaries — scales to any file count) makes
every output file a contiguous slice of the sort key, so parquet footer
min/max stats prune compacted files for range predicates — compaction and
clustering in one pass. The write goes to a NEW directory (generation), not
in place: readers of the old generation are never disturbed, and the swap is
a metadata operation (atomic rename / table pointer flip), which is exactly
how the table formats commit OPTIMIZE.

The reference has no storage layout at all (chunk files are transient,
SURVEY.md §2.2); this exists for the 100 TB posture alongside
operators/zorder.py (which clusters 2-D; compaction clusters 1-D and fixes
file sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_files: int,
    sort_cols: list[str],
) -> DataFrame:
    """Rewrite the parquet table at ``src_dir`` into ``dst_dir`` as
    ``target_files`` range-clustered, internally sorted files. Returns the
    compacted DataFrame (read back from ``dst_dir``) so callers can verify
    or chain. Row multiset is unchanged — compaction moves bytes, never
    meaning."""
    df = spark.read.parquet(src_dir)
    (
        df.repartitionByRange(target_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    return spark.read.parquet(dst_dir)
