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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_minhash_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 16,
) -> None:
    """Materialize the MinHash band index for ``docs`` (doc_id, text) as a
    bucketed table: bucketed + sorted on band_hash so future probe joins are
    corpus-shuffle-free. Re-running overwrites (idempotent full rebuild; an
    append-mode daily maintenance writes only the new batch's bands)."""
    from map_reduce_ruby_spark.plans.dedup_queries import _bands_for_docs

    bands = _bands_for_docs(docs)
    (
        bands.write.bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def append_minhash_batch(docs: DataFrame, table: str, n_buckets: int = 16) -> None:
    """Incremental index maintenance: sketch ONLY the new batch and append
    its (doc_id, band_idx, band_hash) rows into the persisted band index —
    the corpus is never re-sketched and its existing bucket files are never
    rewritten (pinned by an mtime test). Appending with the SAME bucket
    spec keeps the bucketed layout: new files join their band_hash buckets,
    so probe joins stay corpus-shuffle-free over old and new rows alike.
    Because banding has no trained state (unlike IVF centroids), the
    incrementally-maintained index is EXACTLY the full rebuild — the
    dedup_index_append catalog entry is gated on that equality."""
    from map_reduce_ruby_spark.plans.dedup_queries import _bands_for_docs

    (
        _bands_for_docs(docs)
        .write.bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .mode("append")
        .format("parquet")
        .saveAsTable(table)
    )


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
