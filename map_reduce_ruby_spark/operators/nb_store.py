"""Durable Naive Bayes classifier model: the persisted-artifact lifecycle
applied to the data-selection family.

``text_nb_langid`` (plans/dsir_queries.py) trains its hashed-ngram model
in-query; THIS module is the stored form a filtering pipeline maintains:
build the class-conditional count tables once, append each day's labeled
batch, compact on schedule, and classify any future document stream by
loading the counts — never re-featurizing the training corpus.

Naive Bayes is the best-case artifact for incremental maintenance: the
ENTIRE model is sufficient statistics that ADD — class-bucket gram counts
(rows) and per-class document counts (meta counters) — so the
incrementally-maintained model is bit-identical to a full retrain, the
same argument as BM25's N/total_len meta counters (text_index.py) and
stronger than IVF (whose centroids legitimately freeze at batch-1). The
``text_nb_persisted`` catalog entry gates exactly that equality: stored
build(A)+append(B) must classify a probe slice identically to the DuckDB
oracle's from-scratch train over A ∪ B.

Layout (one model root; the shared artifact-store protocol — O_EXCL+
heartbeat maintenance lock, dot-prefixed staging, one-rename publish,
atomic meta commit, orphan-stage reclamation, retired-stamped vacuum):

    <root>/counts/ingest=<n>/*.parquet   (cls, b, c_cb)
    <root>/_META.json   {format, version, n_buckets, class_docs, ingests,
                         batches, batch_ids, retired}

The counts root is tiny by construction (<= n_classes x n_buckets rows
per ingest), so there is no partition-pruning story to tell — the scale
property lives in what is ABSENT: classification never touches the
training corpus, only the counts (broadcast) and the probe batch.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.artifact_store import (
    _META_NAME,
    _AppendLock,
    _clean_orphan_stages,
    _compact_data_root,
    _data_committed,
    _publish_atomic,
    _read_meta,
    _verify_meta_unchanged,
    _write_meta_atomic,
)

NB_MODEL_VERSION = 1


def _nb_meta(n_buckets: int) -> dict:
    return {
        "format": "nb_model",
        "version": NB_MODEL_VERSION,
        "n_buckets": int(n_buckets),
    }


def _counts_from_db(db: DataFrame) -> DataFrame:
    """(cls, b, c_cb) class-bucket gram counts from a (doc_id, lang, b,
    cnt) feature frame — the additive row half of the model's sufficient
    statistics."""
    return db.groupBy(F.col("lang").alias("cls"), "b").agg(
        F.sum("cnt").alias("c_cb")
    )


def _class_docs_from_db(db: DataFrame) -> dict[str, int]:
    """{cls: n_docs} from the feature frame — the additive meta-counter
    half (the prior's sufficient statistics), bounded by |classes|.
    Counting FROM the feature frame matches the in-query trainer and its
    oracle (a zero-token doc is invisible to either)."""
    return {
        r.cls: int(r.n)
        for r in db.select("doc_id", F.col("lang").alias("cls"))
        .distinct()
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def nb_model_exists(path: str, n_buckets: int) -> bool:
    """Committed (every meta-listed ingest has its _SUCCESS) AND built by
    the current builder with the same bucket count — the stale-cache
    policy shared with bm25_index_exists/ivf_index_exists."""
    meta = _read_meta(path)
    return (
        _data_committed(path, "counts")
        and meta is not None
        and {
            f: v
            for f, v in meta.items()
            if f
            not in ("batches", "ingests", "batch_ids", "retired", "class_docs")
        }
        == _nb_meta(n_buckets)
    )


def write_nb_model(
    spark: SparkSession, docs: DataFrame, path: str, n_buckets: int
) -> None:
    """Build and persist the model for labeled ``docs`` (doc_id, lang,
    text): counts staged under a temp root, published by ONE rename with
    content-addressed keep-winner semantics (a concurrent builder's loser
    never deletes a live model out from under the winner's readers)."""
    from map_reduce_ruby_spark.plans.dsir_queries import gram_buckets_for

    # ONE featurize pass feeds both statistic halves (cached, not
    # recomputed per derivation — the batch scan is the whole cost here)
    db = gram_buckets_for(docs).cache()
    try:
        class_docs = _class_docs_from_db(db)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        _counts_from_db(db).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "counts", "ingest=1")
        )
    finally:
        db.unpersist()
    meta = dict(
        _nb_meta(n_buckets),
        class_docs=class_docs,
        batches=1,
        ingests=[1],
        batch_ids=[],
    )
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    _publish_atomic(
        tmp, path, keep_if_valid=lambda p: nb_model_exists(p, n_buckets)
    )


def append_nb_batch(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    batch_id: str | None = None,
) -> None:
    """Incremental maintenance: the batch's class-bucket counts land as
    the next ``ingest=<n>`` partition and the meta commit ADDS the
    batch's per-class document counts — every statistic commutes, so the
    maintained model EQUALS a full retrain (gated by text_nb_persisted).
    Same exactly-once machinery as append_bm25_batch: serialized+
    heartbeated lock, orphan-stage reclamation, CAS before publish,
    batch_id idempotency tokens."""
    if not _data_committed(path, "counts"):
        raise ValueError(f"{path!r} does not hold a committed NB model")

    with _AppendLock(path):
        meta = _read_meta(path)
        done = list(meta.get("batch_ids", []))
        if batch_id is not None and batch_id in done:
            return  # already committed: idempotent retry
        _clean_orphan_stages(os.path.join(path, "counts"))

        ingests = [int(i) for i in meta["ingests"]]
        new_id = max(ingests) + 1
        from map_reduce_ruby_spark.plans.dsir_queries import gram_buckets_for

        db = gram_buckets_for(docs).cache()  # one featurize pass, two stats
        try:
            batch_docs = _class_docs_from_db(db)
            stage = os.path.join(path, "counts", f".stage-{uuid.uuid4().hex}")
            _counts_from_db(db).coalesce(1).write.mode("overwrite").parquet(stage)
        finally:
            db.unpersist()
        _verify_meta_unchanged(path, meta)  # the count job was the long part
        _publish_atomic(stage, os.path.join(path, "counts", f"ingest={new_id}"))
        merged = dict(meta.get("class_docs", {}))
        for cls, n in batch_docs.items():
            merged[cls] = int(merged.get(cls, 0)) + n
        _write_meta_atomic(
            path,
            dict(
                meta,
                class_docs=merged,
                batches=int(meta.get("batches", len(ingests))) + 1,
                ingests=ingests + [new_id],
                batch_ids=done + ([batch_id] if batch_id is not None else []),
            ),
        )


def compact_nb_model(spark: SparkSession, path: str) -> bool:
    """OPTIMIZE: merge the per-ingest count partitions into one generation
    via the shared compactor (lock, CAS, stage, rename, retired-stamped
    meta commit). Duplicate (cls, b) rows across generations are expected
    — the loader SUMS them — so the merge is a plain row union; the
    additive class_docs meta survives untouched."""
    return _compact_data_root(
        spark, path, "counts", (), range_cols=("cls", "b")
    )


def load_nb_model(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, dict]:
    """(counts (cls, b, c_cb) summed across committed ingests, class_docs
    (cls, nd_c), meta). Orphan stages never enter the plan (partition
    filter on ingest); generations merge by summation, which is exactly
    why append never rewrites them."""
    meta = _read_meta(path)
    if meta is None or "ingests" not in meta:
        raise ValueError(
            f"{path!r} is not a current-layout NB model; rebuild with "
            "write_nb_model"
        )
    ingests = [int(i) for i in meta["ingests"]]
    counts = (
        spark.read.parquet(os.path.join(path, "counts"))
        .filter(F.col("ingest").isin(ingests))
        .groupBy("cls", "b")
        .agg(F.sum("c_cb").alias("c_cb"))
    )
    class_docs = spark.createDataFrame(
        [(cls, int(n)) for cls, n in sorted(meta["class_docs"].items())],
        "cls string, nd_c long",
    )
    return counts, class_docs, meta
