"""End-to-end pretraining-data pipeline over the documents corpus — the
catalog's building blocks chained the way a real ingest runs them. The
reference engine covers only the map/shuffle/reduce step of such a pipeline
(its README's word-count worker); everything else here is the Spark-native
capability surface built on top.

Stages (each one is a catalog query family — see CATALOG.md for the
oracle-gated twins):

    1. quality gate      text_quality_score-style heuristics, keep passing docs
    2. exact dedup       md5 fingerprint, keep lowest doc_id      (dedup_exact)
    3. near dedup        MinHash-LSH candidate pairs, drop higher ids
                                                           (dedup_minhash_lsh)
    4. decontamination   n-gram overlap vs a held-out eval set
                                                   (contamination_ngram_overlap)
    5. NB language filter   hashed-ngram Naive Bayes trained on a labeled
                            seed slice; keep docs predicted as the target
                            language                        (text_nb_langid)
    6. DSIR selection    importance weights target-vs-raw + Gumbel top-k
                         resampling            (corpus_dsir_weights/_select)
    7. chunk             32-token sliding windows, 8 overlap  (doc_chunk_overlap)
    8. chunk dedup       drop identical chunks by content hash     (dedup_exact)
    9. epoch shuffle     seeded-hash shard + in-shard order (corpus_global_shuffle)
   10. materialize       one parquet per shard, partitioned write

Run with:
    python examples/pretraining_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import h32
from map_reduce_ruby_spark.plans.dedup_queries import dedup_exact, dedup_minhash_lsh
from map_reduce_ruby_spark.session import get_spark
from map_reduce_ruby_spark.sources import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark(app_name="pretraining_pipeline", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: length + mean-word-length heuristics (cheap column
    # expressions; the oracle-gated scoring lives in text_quality_score).
    toks = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    quality = docs.withColumn("n_tokens", F.size(toks)).filter(
        (F.col("n_chars") >= 60) & (F.col("n_tokens") >= 12)
    )
    n1 = quality.count()

    # 2. exact dedup: keep the lowest doc_id per normalized fingerprint.
    keep_exact = (
        dedup_exact(spark, sf_dir)
        .select(F.col("keep_doc_id").alias("doc_id"))
    )
    exact = quality.join(keep_exact, "doc_id", "left_semi")
    n2 = exact.count()

    # 3. near dedup: MinHash-LSH pairs; drop the higher id of every pair.
    drops = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    near = exact.join(drops, "doc_id", "left_anti")
    n3 = near.count()

    # 4. decontamination: drop docs sharing any 5-gram with the "eval set"
    # (here: the 5 highest doc_ids, standing in for a benchmark suite).
    eval_docs = docs.orderBy(F.desc("doc_id")).limit(5).select("doc_id", "text")
    def grams(df):
        t = F.filter(F.split("text", r"\s+"), lambda w: w != "")
        base = df.select("doc_id", t.alias("tok"))
        idx = F.when(
            F.size("tok") >= 5, F.sequence(F.lit(1), F.size("tok") - 4)
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        g = F.expr(
            "concat_ws(' ', "
            + ", ".join(f"element_at(tok, pos + {j})" for j in range(5))
            + ")"
        )
        return base.select("doc_id", F.explode(idx).alias("pos"), "tok").select(
            "doc_id", g.alias("gram")
        )

    eval_grams = grams(eval_docs).select("gram").distinct()
    # Eval docs in the corpus share their own grams, so they land in
    # `contaminated` and are dropped from the training set along with every
    # doc overlapping them — exempting them here would train on the
    # benchmark verbatim.
    contaminated = (
        grams(near.select("doc_id", "text"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = near.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()

    # 5. model-based LANGUAGE filter: train the hashed-ngram Naive Bayes
    # on a labeled seed slice (doc_id % 5 != 0 stands in for the small
    # human-labeled set a real pipeline has) and keep only documents the
    # model predicts as the target language. Scoring is a broadcast-model
    # join + per-doc argmax — the corpus is featurized once and never
    # joined against itself (text_nb_langid's plan shape).
    from map_reduce_ruby_spark.plans.dsir_queries import (
        _TARGET_LANG,
        dsir_weights_for,
        gram_buckets_for,
        nb_scores_from_model,
    )

    db_all = gram_buckets_for(clean.select("doc_id", "lang", "text")).cache()
    seed_db = db_all.filter(F.col("doc_id") % 5 != 0)
    cb = seed_db.groupBy(F.col("lang").alias("cls"), "b").agg(
        F.sum("cnt").alias("c_cb")
    )
    nd_c = (
        seed_db.select("doc_id", "lang")
        .distinct()
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("nd_c"))
    )
    lang_ids = (
        nb_scores_from_model(db_all, cb, nd_c)
        .filter(F.col("pred") == _TARGET_LANG)
        .select("doc_id")
    )
    in_lang = clean.join(lang_ids, "doc_id", "left_semi")
    n5 = in_lang.count()

    # 6. DSIR data SELECTION (Xie et al.): importance weights of the
    # target slice vs the raw corpus over hashed n-gram buckets, then
    # Gumbel top-k — sampling-without-replacement proportional to
    # importance, keeping half the surviving corpus. TakeOrdered top-k,
    # never a global window; the importance model is a <=256-row
    # broadcast.
    w = dsir_weights_for(db_all.join(in_lang.select("doc_id"), "doc_id", "left_semi"))
    u = (
        h32(F.col("doc_id").cast("string"), seed="dsir") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = w.select(
        "doc_id",
        (
            F.col("weight_milli")
            + F.round(-F.log(-F.log(u)) * 1000).cast("long")
        ).alias("skey_milli"),
    )
    # k == 0 when nothing survived the language filter: limit(0) keeps the
    # pipeline degrading gracefully (empty corpus -> empty shards) instead
    # of tripping the n6 == k invariant on a forced 1-row ask.
    k = (n5 + 1) // 2
    sel_ids = (
        scored.orderBy(F.desc("skey_milli"), "doc_id").limit(k).select("doc_id")
    )
    selected = in_lang.join(sel_ids, "doc_id", "left_semi")
    n6 = selected.count()
    db_all.unpersist()

    # 7. chunk: 32-token sliding windows with 8-token overlap — the
    # training unit becomes the chunk, not the document. The chunk
    # arithmetic is the SHARED helper behind doc_chunk_overlap (one
    # definition; narrow ops only, no shuffle).
    from map_reduce_ruby_spark.plans.pipeline_queries import chunk_token_arrays

    toked = selected.select("doc_id", toks.alias("toks"))
    chunks = chunk_token_arrays(toked).select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", "chunk").alias("text"),
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"),
    )
    n7 = chunks.count()

    # 8. chunk-level exact dedup: overlapping windows of near-identical docs
    # produce identical chunks — keep the lowest (doc_id, chunk_idx) per
    # content hash (same keep-first rule as dedup_exact, one hash shuffle).
    from pyspark.sql import Window as W

    w = W.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    chunks_kept = (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n8 = chunks_kept.count()

    # 9. shard + epoch order: seeded-hash shard, deterministic in-shard
    # order (the corpus_global_shuffle layout), token counts carried along.
    key = F.concat_ws(":", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string"))
    sharded = chunks_kept.select(
        "doc_id",
        "chunk_idx",
        "text",
        "n_tokens",
        (h32(key, seed=7) % 4).alias("shard"),
        h32(key, seed=11).alias("ord_hash"),
    )

    # 10. materialize: partitioned parquet, one directory per shard, sorted
    # within shard by the epoch order (sortWithinPartitions after a shard
    # repartition — at scale this is the final shuffle of the ingest).
    (
        sharded.repartition(4, "shard")
        .sortWithinPartitions("ord_hash", "doc_id", "chunk_idx")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    n9 = back.count()
    tokens = back.agg(F.sum("n_tokens")).collect()[0][0]

    print(f"corpus:        {n0} docs")
    print(f"quality gate:  {n1} kept")
    print(f"exact dedup:   {n2} kept")
    print(f"near dedup:    {n3} kept")
    print(f"decontam:      {n4} kept")
    print(f"NB lang filter:{n5} kept")
    print(f"DSIR select:   {n6} kept")
    print(f"chunked:       {n7} chunks")
    print(f"chunk dedup:   {n8} kept")
    print(f"materialized:  {n9} chunks / {tokens} tokens -> {out_dir}")
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 >= n6
    assert n6 == k  # DSIR keeps exactly the Gumbel top-k
    assert n7 >= n6  # every kept doc (>= 12 tokens) yields >= 1 chunk
    assert n7 >= n8 == n9
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
