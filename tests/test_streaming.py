"""Streaming/batch equivalence: draining the finite events table through each
Structured Streaming plan with trigger(availableNow) must reproduce the batch
twin exactly (the Dataflow-model consistency property)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.sources import load_table
from map_reduce_ruby_spark.streaming import (
    run_stream_to_memory,
    streaming_events,
    streaming_sessionize,
    streaming_stateful_user_totals,
    streaming_tumbling_counts,
)


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf[sorted(pdf.columns)].sort_values(by=sorted(pdf.columns)).reset_index(drop=True)


def _tumbling_batch_expected(ev):
    """The batch twin of streaming_tumbling_counts — shared by the default-
    and RocksDB-state-store equivalence tests so both pin the SAME
    semantics."""
    return (
        ev.withColumn("bucket_start_s", F.expr("ts_us div 300000000") * 300)
        .groupBy("bucket_start_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
    )


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    got = run_stream_to_memory(
        streaming_tumbling_counts(streaming_events(spark, sf_dir)), "t_tumbling"
    )
    expected = _tumbling_batch_expected(load_table(spark, sf_dir, "events"))
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected))


def test_streaming_sessionize_equals_batch_session_count(spark, sf_dir):
    got = run_stream_to_memory(
        streaming_sessionize(streaming_events(spark, sf_dir)), "t_sessions"
    )
    # Batch twin: lag-based session starts; same gap (10 min) ⇒ same number of
    # sessions and events per user.
    from map_reduce_ruby_spark.plans.catalog import all_entries

    batch = all_entries()["events_sessionize"].fn(spark, sf_dir).toPandas()
    got_pdf = got.toPandas().groupby("user_id").agg(
        n_sessions=("session_start_s", "count"), n_events=("n_events", "sum")
    ).reset_index()
    merged = got_pdf.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged["n_sessions_s"] == merged["n_sessions_b"]).all()
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_streaming_stateful_totals_equals_batch(spark, sf_dir):
    got = run_stream_to_memory(
        streaming_stateful_user_totals(streaming_events(spark, sf_dir)),
        "t_totals",
        output_mode="update",
    ).toPandas()
    # update mode emits one row per user per micro-batch: keep the last.
    got = got.groupby("user_id").tail(1).sort_values("user_id").reset_index(drop=True)
    ev = load_table(spark, sf_dir, "events")
    expected = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """True late-data semantics: replay events as three micro-batches where
    the LAST batch is days older than the watermark; its rows must be dropped,
    not aggregated. (Three batches because since Spark 3.4 the late-event
    filter uses the watermark lagged by one micro-batch, so a drop first
    manifests in batch >= 2.)"""
    import os

    ev = load_table(spark, sf_dir, "events").select("ts_ns", "user_id", "value")
    m = ev.agg(F.max("ts_ns").alias("m")).first().m
    late_cutoff_ns = m - 3 * 24 * 3600 * 10**9  # 3 days before max
    mid_cutoff_ns = m - 24 * 3600 * 10**9  # last day
    batches = [
        ("b0", ev.filter(F.col("ts_ns") > mid_cutoff_ns)),
        ("b1", ev.filter((F.col("ts_ns") > late_cutoff_ns) & (F.col("ts_ns") <= mid_cutoff_ns))),
        ("b2_late", ev.filter(F.col("ts_ns") <= late_cutoff_ns)),
    ]
    counts = {name: df.count() for name, df in batches}
    assert all(c > 0 for c in counts.values())  # the synthetic month spans all

    stream_dir = str(tmp_path / "replay")
    os.makedirs(stream_dir)
    # FileStreamSource picks files oldest-modification-first; pin mtimes so
    # replay order == declaration order.
    for i, (name, df) in enumerate(batches):
        d = os.path.join(stream_dir, name)
        df.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(os.path.join(d, f), (1_000_000_000 + i, 1_000_000_000 + i))

    schema = spark.read.parquet(stream_dir + "/b0").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir + "/*")
    )
    counted = (
        raw.withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
        .withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_stream_to_memory(counted, "t_late_drop", output_mode="append")
    total = out.agg(F.sum("n")).first()[0]
    n_live = counts["b0"] + counts["b1"]
    # every b2 row is days below the watermark established by batches 0-1:
    # none may be counted; only the unfinalized tail of live windows may be
    # missing from the append output.
    assert total <= n_live, (total, counts)
    assert total >= n_live - 200, (total, counts)


def test_foreachbatch_idempotent_parquet_sink(spark, sf_dir, tmp_path):
    """The production sink pattern: foreachBatch writes each micro-batch to a
    batch-id-keyed path with overwrite — a retry of the same batch id lands
    on the same path (idempotent), which is how Structured Streaming gets
    effectively-exactly-once delivery onto object storage. Verified by (a)
    replaying a batch write and (b) the union of batch dirs equaling the
    source exactly."""
    import os

    out = str(tmp_path / "fb_sink")
    seen: list[int] = []

    def write_batch(batch_df, batch_id: int):
        seen.append(batch_id)
        (
            batch_df.select("event_id", "user_id", "event_type")
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"batch_id={batch_id}"))
        )

    q = (
        streaming_events(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen, "no micro-batches ran"

    back = spark.read.parquet(os.path.join(out, "batch_id=*"))
    ev = load_table(spark, sf_dir, "events")
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(F.sum("event_id")).first()[0]

    # retry-idempotence: re-running one batch id must not duplicate rows
    first_dir = os.path.join(out, f"batch_id={seen[0]}")
    staging = str(tmp_path / "replay_staging")
    spark.read.parquet(first_dir).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(first_dir)
    back2 = spark.read.parquet(os.path.join(out, "batch_id=*"))
    assert back2.count() == ev.count()


def test_checkpoint_restart_processes_only_new_files(spark, sf_dir, tmp_path):
    """Incremental replay: a file-stream query restarted with the SAME
    checkpoint must process only files that arrived since the last run —
    the property that makes a daily ingest incremental instead of
    reprocessing the lake every run."""
    import os

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    stream_dir = str(tmp_path / "incoming")
    os.makedirs(stream_dir)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # day 1: one file lands
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        stream_dir + "/day1"
    )
    batch_rows: list[int] = []

    def run_once():
        def sink(batch_df, batch_id):
            n = batch_df.count()
            if n:
                batch_rows.append(n)
                batch_df.write.mode("append").parquet(out)

        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 100)
            .parquet(stream_dir + "/*")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_day1 = sum(batch_rows)
    assert n_day1 == ev.filter(F.col("event_id") % 2 == 0).count()

    # day 2: a second file lands; restart from the same checkpoint
    batch_rows.clear()
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        stream_dir + "/day2"
    )
    run_once()
    n_day2 = sum(batch_rows)
    assert n_day2 == ev.filter(F.col("event_id") % 2 == 1).count(), (
        "restart reprocessed old files instead of only day2"
    )
    assert spark.read.parquet(out).count() == ev.count()


def test_rocksdb_state_store_matches_default(spark, sf_dir):
    """Streaming aggregation under the RocksDB state store provider — the
    production backend once keyed state outgrows executor heap (state lives
    off-heap/on-disk with incremental checkpoints) — must produce exactly
    the HDFS-backed default provider's results."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        got = run_stream_to_memory(
            streaming_tumbling_counts(streaming_events(spark, sf_dir)),
            "t_tumbling_rocksdb",
        )
        expected = _tumbling_batch_expected(load_table(spark, sf_dir, "events"))
        pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected))
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_index_ingest_idempotent_and_microbatched(spark, sf_dir):
    """streaming_index_ingest must be a pure function of the fixture: a
    second invocation (fresh checkpoint, index table overwritten) returns
    the identical result, and the drop directory really holds multiple
    files so maxFilesPerTrigger=1 yields multiple foreachBatch appends."""
    import glob
    import os
    import tempfile

    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    fn = all_entries()["streaming_index_ingest"].fn
    first = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    again = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert first == again and len(first) > 0

    tag = table_fingerprint(sf_dir, "documents")
    drop = os.path.join(tempfile.gettempdir(), f"mh_stream_drop_{tag}")
    parts = glob.glob(os.path.join(drop, "part-*.parquet"))
    assert len(parts) >= 2, parts  # several micro-batches, not one big append


def test_state_partitions_derived_from_keyspace_bounds():
    """The four sized streaming entries DERIVE their state partition count
    from their keyspace bound (VERDICT r10 item 7). Pins both the formula
    and the entries' bounds: all four resolve to the 8 partitions round 10
    measured as the knee — if an upstream constant (CMS grid, watermark
    span, cohort count) changes, the derived value tracks it."""
    import pytest as _pytest

    from map_reduce_ruby_spark.plans.streaming_queries import (
        _CMS_KEYS,
        _ENRICH_KEYS,
        _MV_KEYS,
        _TUMBLING_KEYS,
    )
    from map_reduce_ruby_spark.streaming import state_partitions_for

    assert (_TUMBLING_KEYS, _ENRICH_KEYS, _CMS_KEYS, _MV_KEYS) == (
        35, 10, 256, 155
    )
    for bound in (_TUMBLING_KEYS, _ENRICH_KEYS, _CMS_KEYS, _MV_KEYS):
        assert state_partitions_for(bound) == 8
    # the formula itself: ceil over keys_per_partition with a floor
    assert state_partitions_for(257) == 9
    assert state_partitions_for(1024) == 32
    assert state_partitions_for(1) == 8
    with _pytest.raises(ValueError):
        state_partitions_for(0)


def test_sized_stream_never_touches_shared_session_conf(spark, sf_dir):
    """A sized stream must scope its shuffle-partition override to its own
    session clone (VERDICT r10 item 8): the shared session's conf is never
    set, so a batch query planned concurrently can't inherit the stream's
    partition count. A poller thread reads the shared conf THROUGHOUT the
    drain — under the round-10 implementation (set + restore around
    start()) it reliably observed the override for the whole drain; now it
    must never see anything but the session default."""
    import threading

    default = spark.conf.get("spark.sql.shuffle.partitions")
    seen: set[str] = set()
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            seen.add(spark.conf.get("spark.sql.shuffle.partitions"))

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        # 5, not the entries' 8: the test session's default is ALSO 8
        # (conftest), and a value equal to the default couldn't distinguish
        # scoped from leaked conf
        got = run_stream_to_memory(
            lambda s: streaming_tumbling_counts(streaming_events(s, sf_dir)),
            "t_tumbling_scoped",
            state_partitions=5,
            spark=spark,
        )
        n = got.count()
    finally:
        stop.set()
        t.join(timeout=10)
    assert seen == {default}
    assert spark.conf.get("spark.sql.shuffle.partitions") == default
    assert n > 0
    # and the scoped result still equals the batch twin
    expected = _tumbling_batch_expected(load_table(spark, sf_dir, "events"))
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(expected))


def test_sized_stream_requires_builder():
    from map_reduce_ruby_spark.streaming import run_stream_to_memory as r

    with pytest.raises(ValueError, match="callable"):
        r(object(), "t_x", state_partitions=8)
