"""Durable NB model lifecycle: incremental maintenance must equal a full
retrain (every statistic is additive), appends must never rewrite
committed generations, batch ids must be idempotent, and compaction +
vacuum must be observationally invisible to classification."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.artifact_store import read_index_meta, vacuum_index
from map_reduce_ruby_spark.operators.nb_store import (
    append_nb_batch,
    compact_nb_model,
    load_nb_model,
    nb_model_exists,
    write_nb_model,
)
from map_reduce_ruby_spark.plans.dsir_queries import (
    _BUCKETS,
    gram_buckets_for,
    nb_scores_from_model,
)
from map_reduce_ruby_spark.sources import load_table


def _slices(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return (
        docs.filter(F.col("doc_id") % 5 >= 2),
        docs.filter(F.col("doc_id") % 5 == 1),
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 >= 1),
    )


def _classify(spark, path, probe):
    counts, class_docs, _ = load_nb_model(spark, path)
    return {
        r.doc_id: (r.pred, r.best_milli)
        for r in nb_scores_from_model(
            gram_buckets_for(probe), counts, class_docs
        ).collect()
    }


def test_append_equals_full_retrain_and_is_idempotent(spark, sf_dir, tmp_path):
    train_a, batch_b, probe, train_ab = _slices(spark, sf_dir)
    path = str(tmp_path / "nb_model")
    write_nb_model(spark, train_a, path, _BUCKETS)
    assert nb_model_exists(path, _BUCKETS)

    append_nb_batch(spark, batch_b, path, batch_id="b1")
    got = _classify(spark, path, probe)

    # the maintained model must equal training from scratch on A u B
    db_ab = gram_buckets_for(train_ab)
    full_cb = db_ab.groupBy(F.col("lang").alias("cls"), "b").agg(
        F.sum("cnt").alias("c_cb")
    )
    full_nd = (
        db_ab.select("doc_id", "lang")
        .distinct()
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("nd_c"))
    )
    want = {
        r.doc_id: (r.pred, r.best_milli)
        for r in nb_scores_from_model(
            gram_buckets_for(probe), full_cb, full_nd
        ).collect()
    }
    assert got == want and got

    # idempotent retry: same batch_id is a committed no-op
    meta_before = read_index_meta(path)
    append_nb_batch(spark, batch_b, path, batch_id="b1")
    assert read_index_meta(path) == meta_before
    assert _classify(spark, path, probe) == want


def test_append_never_rewrites_committed_generations(spark, sf_dir, tmp_path):
    train_a, batch_b, _probe, _ = _slices(spark, sf_dir)
    path = str(tmp_path / "nb_mtimes")
    write_nb_model(spark, train_a, path, _BUCKETS)
    gen1 = os.path.join(path, "counts", "ingest=1")
    before = {
        f: os.path.getmtime(os.path.join(gen1, f))
        for f in os.listdir(gen1)
        if f.endswith(".parquet")
    }
    assert before
    append_nb_batch(spark, batch_b, path, batch_id="b1")
    after = {
        f: os.path.getmtime(os.path.join(gen1, f))
        for f in os.listdir(gen1)
        if f.endswith(".parquet")
    }
    assert after == before, "append must only add a new ingest partition"
    meta = read_index_meta(path)
    assert meta["ingests"] == [1, 2] and meta["batches"] == 2


def test_compact_and_vacuum_are_invisible_to_classification(
    spark, sf_dir, tmp_path
):
    train_a, batch_b, probe, _ = _slices(spark, sf_dir)
    path = str(tmp_path / "nb_compact")
    write_nb_model(spark, train_a, path, _BUCKETS)
    append_nb_batch(spark, batch_b, path, batch_id="b1")
    want = _classify(spark, path, probe)

    assert compact_nb_model(spark, path) is True
    meta = read_index_meta(path)
    assert len(meta["ingests"]) == 1 and meta["batches"] == 2
    assert _classify(spark, path, probe) == want

    removed = vacuum_index(path, grace_sec=0.0)
    assert removed, "retired generations should be reclaimed at grace=0"
    assert _classify(spark, path, probe) == want
    # second compaction is the single-generation no-op
    assert compact_nb_model(spark, path) is False


def test_streaming_nb_ingest_survives_drop_loss(spark, sf_dir):
    """The ADVICE scenario: tmp cleanup deletes the slice-B drop while
    the persistent model survives. The regenerated drop may group doc_ids
    differently (minting batch ids the model never committed), so the
    model path is keyed to the drop's physical fingerprint — a rewritten
    drop rotates to a FRESH model fed exactly once, and the entry's
    result stays identical instead of silently double-counting B."""
    import os
    import shutil
    import tempfile

    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    e = all_entries()
    first = sorted(
        map(tuple, e["streaming_nb_ingest"].fn(spark, sf_dir).collect())
    )

    tag = table_fingerprint(sf_dir, "documents")
    drop = os.path.join(tempfile.gettempdir(), f"nb_stream_drop_{tag}")
    assert os.path.exists(drop)
    shutil.rmtree(drop)  # the tmp-cleanup event

    again = sorted(
        map(tuple, e["streaming_nb_ingest"].fn(spark, sf_dir).collect())
    )
    assert again == first, (
        "drop loss must never double slice B into the surviving model"
    )
