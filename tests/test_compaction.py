"""Small-file compaction: many tiny files -> few range-clustered sorted
files, same rows, prunable by footer stats."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.compaction import compact
from map_reduce_ruby_spark.sources import load_table


def _parquet_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def test_compact_small_files_preserves_rows_and_clusters(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "small_files")
    # simulate a chatty ingest: 64 tiny files
    ev.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    dst = str(tmp_path / "compacted")
    back = compact(spark, src, dst, target_files=4, sort_cols=["event_id"])

    files = _parquet_files(dst)
    assert len(files) == 4
    # same multiset of rows
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )
    # each output file is internally sorted and files cover disjoint ranges —
    # the property parquet footer min/max pruning needs
    ranges, total = [], 0
    for path in files:
        pdf = spark.read.parquet(path).toPandas()
        if len(pdf):
            ids = pdf["event_id"].tolist()
            assert ids == sorted(ids), "file not internally sorted"
            ranges.append((ids[0], ids[-1]))
            total += len(pdf)
    assert total == ev.count()
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file ranges overlap — range clustering broken"

    # and a selective range predicate on the sort key scans fewer rows than
    # the table: the pruned scan must read at most one file's worth
    one_file = spark.read.parquet(files[0])
    lo, hi = one_file.agg(F.min("event_id"), F.max("event_id")).first()
    pruned = back.filter(F.col("event_id").between(lo, hi))
    assert pruned.count() == one_file.count()
