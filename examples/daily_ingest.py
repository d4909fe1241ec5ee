"""Daily-ingest lifecycle over the persisted indexes — the reference's
add_chunk-per-batch deploy story (reference lib/map_reduce/reducer.rb:34-42,
README.md:60-84: artifacts persist between phases, each batch lands
incrementally) applied to a training-data pipeline's standing structures.

Day 0 builds the corpus indexes ONCE; every later day pays cost proportional
to ITS batch, never re-sketching or retraining the corpus:

    day 0:  write_minhash_index(corpus)        # bucketed band table
            write_ivf_index(corpus_vectors)    # k-means cells + centroids

    day N:  dedup_against_index(batch)         # probe: batch-side cost only
            append_minhash_batch(survivors)    # bands of the KEPT docs only
            append_ivf_batch(batch_vectors)    # assign-only, no retrain
            append_bm25_batch(survivors)       # postings + additive stats
                                               # (each append commits as its
                                               #  own ingest partition —
                                               #  crash-retry is exactly-once)

    weekly: compact_*_index(...)               # OPTIMIZE: merge the accumulated
            vacuum_index(..., grace)           # generations; reclaim after the
                                               # reader drain window

Run with:
    python examples/daily_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from pyspark.sql import functions as F

    from map_reduce_ruby_spark.operators import (
        adaptive_nprobe,
        append_bm25_batch,
        append_ivf_batch,
        bm25_search,
        compact_ivf_index,
        ivf_search,
        load_ivf_index,
        read_index_meta,
        vacuum_index,
        write_bm25_index,
        write_ivf_index,
    )
    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        dedup_against_index,
        write_minhash_index,
    )
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="daily_ingest_example", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="daily_ingest_")

    # ---- day 0: the standing corpus and its indexes ------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    write_minhash_index(corpus, "daily_mh_idx", os.path.join(root, "mh"))
    bm25_path = os.path.join(root, "bm25")
    write_bm25_index(spark, corpus, bm25_path)

    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    n = vecs.count()
    day0_vecs = vecs.filter(F.col("id") < n // 2)
    ivf_path = os.path.join(root, "ivf")
    write_ivf_index(spark, day0_vecs, ivf_path, k=None)
    print(f"day 0: indexed {corpus.count()} docs, {day0_vecs.count()} vectors")

    # ---- day 1: a batch arrives --------------------------------------------
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    # 1. near-dup probe against the STANDING index: batch-side cost only
    dups = dedup_against_index(spark, batch, "daily_mh_idx")
    dup_ids = [r.doc_id for r in dups.select("doc_id").collect()]
    survivors = batch.filter(~F.col("doc_id").isin(dup_ids or [-1]))
    print(f"day 1: batch {batch.count()} docs -> {len(dup_ids)} near-dups vs "
          f"corpus, {survivors.count()} kept")

    # 2. the kept docs' bands join the standing band index (no corpus
    #    re-sketch), and their postings join the BM25 index — whose global
    #    stats (N, total tokens) update as additive meta counters
    append_minhash_batch(survivors, "daily_mh_idx")
    append_bm25_batch(spark, survivors, bm25_path, batch_id="day-1")

    # 3. the day's vectors join the ANN index (assign-only, no retrain)
    day1_vecs = vecs.filter(F.col("id") >= n // 2)
    append_ivf_batch(spark, day1_vecs, ivf_path)
    meta = read_index_meta(ivf_path)
    print(f"day 1: IVF index now holds {meta['batches']} committed ingests "
          f"({meta['ingests']})")

    # 4. and the maintained index serves searches over old + new alike
    assignments, centroids = load_ivf_index(spark, ivf_path)
    queries = vecs.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), F.col("e").alias("qe")
    )
    hits = ivf_search(
        assignments, centroids, queries, top_k=3, nprobe=adaptive_nprobe(len(centroids))
    )
    n_hits = hits.count()
    assert assignments.count() == n, "index must span both ingests"
    print(f"search over the maintained index: {n_hits} results for 5 queries")

    # 5. lexical retrieval over the maintained inverted index
    lex = bm25_search(spark, bm25_path, ("data", "query", "join"), top_k=5)
    print(f"bm25 over the maintained index: {lex.count()} results")

    # ---- scheduled maintenance: OPTIMIZE + VACUUM --------------------------
    # appends deliberately land one generation per batch; compaction merges
    # them back (bytes-sized files, cells/buckets stay prunable) and vacuum
    # reclaims the retired generations AFTER a drain window — here 0 because
    # this process holds the only readers
    compact_ivf_index(spark, ivf_path)
    removed = vacuum_index(ivf_path, grace_sec=0.0)
    meta = read_index_meta(ivf_path)
    print(f"compacted: IVF ingests {meta['ingests']}, reclaimed "
          f"{len(removed)} retired generations; logical batches "
          f"{meta['batches']}")
    assignments, centroids = load_ivf_index(spark, ivf_path)
    assert assignments.count() == n, "compaction must preserve every row"
    print("DAILY INGEST LIFECYCLE COMPLETE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
