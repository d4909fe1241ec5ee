"""Persisted MinHash band index (operators/dedup_index.py): the stored-index
probe path must equal the in-query derived path (dedup_incremental_minhash),
and the probe join must be corpus-shuffle-free (bucketed scan on the index
side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.dedup_index import (
    dedup_against_index,
    write_minhash_index,
)
from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.sources import load_table


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return corpus, batch


def test_persisted_index_equals_derived_path(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    write_minhash_index(corpus, "mh_idx_eq", str(tmp_path / "idx"))
    got = dedup_against_index(spark, batch, "mh_idx_eq").toPandas()
    want = (
        all_entries()["dedup_incremental_minhash"].fn(spark, sf_dir).toPandas()
    )
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    got, want = key(got)[sorted(got.columns)], key(want)[sorted(want.columns)]
    assert got.equals(want), (len(got), len(want))


def test_probe_join_has_no_index_side_exchange(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    write_minhash_index(corpus, "mh_idx_plan", str(tmp_path / "idx2"))
    df = dedup_against_index(spark, batch, "mh_idx_plan")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the stored side must be read through its bucketed layout...
    assert "Bucketed: true" in plan, plan
    # ...and the CORPUS must never shuffle: the small sketched batch
    # broadcasts (or shuffles alone); every hash exchange in the plan
    # belongs to the final per-doc aggregate, keyed by doc_id
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "doc_id" in line, line
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_register_attaches_existing_index_without_rewrite(
    spark, sf_dir, tmp_path
):
    """A fresh process finding the content-addressed index already built
    must ATTACH it (register_minhash_index), never rebuild: overwrite
    deletes the live files under a sibling process's readers. Pinned:
    dropping the table from the catalog and registering over the same
    path leaves every data file byte-for-byte in place (mtimes) and the
    probe result and bucketed plan are identical."""
    import os

    from map_reduce_ruby_spark.operators.dedup_index import (
        register_minhash_index,
    )

    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "idx_attach")
    write_minhash_index(corpus, "mh_idx_attach", path)
    want = dedup_against_index(spark, batch, "mh_idx_attach").toPandas()
    files = {
        os.path.join(path, f): os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert files, "writer produced no data files"

    # simulate the fresh process: catalog entry gone, files remain
    spark.sql("DROP TABLE mh_idx_attach")
    register_minhash_index(spark, "mh_idx_attach", path)

    probe_df = dedup_against_index(spark, batch, "mh_idx_attach")
    got = probe_df.toPandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(got)[sorted(got.columns)].equals(key(want)[sorted(want.columns)])
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert {
        p: os.path.getmtime(p) for p in files
    } == files, "registration must not touch data files"


def test_second_cold_build_keeps_winner_files(spark, sf_dir, tmp_path):
    """Two processes cold-building the same content-addressed path must
    never delete each other's files: the second build stages its own
    copy, loses the publish, discards the staging copy, and attaches the
    winner's bytes (keep-winner). Simulated here with a second catalog
    table name standing in for the second process."""
    import os

    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "idx_winner")
    write_minhash_index(corpus, "mh_idx_w1", path)
    files = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    want = dedup_against_index(spark, batch, "mh_idx_w1").toPandas()

    write_minhash_index(corpus, "mh_idx_w2", path)  # the "loser" builder
    after = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert after == files, "loser must attach, never rewrite, the winner"
    got = dedup_against_index(spark, batch, "mh_idx_w2").toPandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(got)[sorted(got.columns)].equals(key(want)[sorted(want.columns)])


def test_register_reads_bucket_spec_sidecar(spark, sf_dir, tmp_path):
    """Attaching without an explicit bucket count must recreate the
    WRITER's spec from the published sidecar — a guessed default over an
    8-bucket layout would silently mis-place rows and drop matches."""
    from map_reduce_ruby_spark.operators.dedup_index import (
        _table_bucket_count,
        register_minhash_index,
    )

    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "idx_spec8")
    write_minhash_index(corpus, "mh_spec_reg", path, n_buckets=8)
    want = dedup_against_index(spark, batch, "mh_spec_reg").toPandas()
    spark.sql("DROP TABLE mh_spec_reg")

    register_minhash_index(spark, "mh_spec_reg", path)  # no count given
    assert _table_bucket_count(spark, "mh_spec_reg") == 8
    got = dedup_against_index(spark, batch, "mh_spec_reg").toPandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(got)[sorted(got.columns)].equals(key(want)[sorted(want.columns)])


def test_index_rebuild_is_idempotent(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    write_minhash_index(corpus, "mh_idx_twice", str(tmp_path / "idx3"))
    first = dedup_against_index(spark, batch, "mh_idx_twice").count()
    write_minhash_index(corpus, "mh_idx_twice", str(tmp_path / "idx3"))
    again = dedup_against_index(spark, batch, "mh_idx_twice").count()
    assert first == again


def test_compact_minhash_preserves_rows_and_merges_files(
    spark, sf_dir, tmp_path
):
    """Two appended generations -> compact: identical band-row multiset,
    <= n_buckets data files (one per bucket), identical probe results, and
    the old generation's files survive at the returned location until the
    caller reclaims them (the drain-window contract)."""
    import os

    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        compact_minhash_index,
    )

    corpus, batch = _split(spark, sf_dir)
    a = corpus.filter(F.col("doc_id") % 5 >= 3)
    b1 = corpus.filter(F.col("doc_id") % 5 == 2)
    b2 = corpus.filter(F.col("doc_id") % 5 == 1)
    path = str(tmp_path / "idx_cmp")
    write_minhash_index(a, "mh_idx_cmp_t", path)
    append_minhash_batch(b1, "mh_idx_cmp_t")
    append_minhash_batch(b2, "mh_idx_cmp_t")

    def data_files(root):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(root)
            for f in fs
            if not f.startswith("_") and ".crc" not in f
        ]

    rows_before = sorted(
        tuple(r) for r in spark.table("mh_idx_cmp_t").collect()
    )
    probe_before = sorted(
        tuple(r) for r in dedup_against_index(spark, batch, "mh_idx_cmp_t").collect()
    )
    files_before = data_files(path)

    dst = str(tmp_path / "idx_cmp_gen2")
    old_loc = compact_minhash_index(spark, "mh_idx_cmp_t", dst)

    assert old_loc.removeprefix("file:") == path
    assert data_files(path) == files_before  # old generation untouched
    assert len(data_files(dst)) <= 16  # one file per bucket
    assert len(data_files(dst)) < len(files_before)
    assert sorted(
        tuple(r) for r in spark.table("mh_idx_cmp_t").collect()
    ) == rows_before
    assert sorted(
        tuple(r) for r in dedup_against_index(spark, batch, "mh_idx_cmp_t").collect()
    ) == probe_before


def test_compacted_probe_plan_stays_bucketed_shuffle_free(
    spark, sf_dir, tmp_path
):
    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        compact_minhash_index,
    )

    corpus, batch = _split(spark, sf_dir)
    a = corpus.filter(F.col("doc_id") % 2 == 1)
    b = corpus.filter(F.col("doc_id") % 2 == 0)
    write_minhash_index(a, "mh_idx_cmp_plan", str(tmp_path / "i1"))
    append_minhash_batch(b, "mh_idx_cmp_plan")
    compact_minhash_index(spark, "mh_idx_cmp_plan", str(tmp_path / "i2"))

    df = dedup_against_index(spark, batch, "mh_idx_cmp_plan")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "doc_id" in line, line
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_streaming_ingest_with_inflight_compaction(spark, sf_dir, tmp_path):
    """Compaction composed INTO the streaming maintenance loop: micro-batch
    appends interleaved with a mid-stream compact (the scheduled-OPTIMIZE-
    under-live-ingest shape). The final probe must equal the one-shot full
    rebuild — compaction and the catalog-name swap must be invisible to
    subsequent appends and probes."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        compact_minhash_index,
    )
    from map_reduce_ruby_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_a = docs.filter(F.col("doc_id") % 5 >= 2)
    slice_b = docs.filter(F.col("doc_id") % 5 == 1)
    probe = docs.filter(F.col("doc_id") % 5 == 0)

    drop = str(tmp_path / "drop")
    slice_b.repartition(4).write.parquet(drop)

    table = "mh_stream_cmp_t"
    write_minhash_index(corpus_a, table, str(tmp_path / "gen1"))

    gen = {"n": 1}

    def ingest(batch_df, eid):
        append_minhash_batch(batch_df, table)
        if eid == 1:  # compact mid-stream, with more appends still to come
            gen["n"] += 1
            old = compact_minhash_index(
                spark, table, str(tmp_path / f"gen{gen['n']}")
            )
            # drain-window contract exercised at grace=0: this loop is the
            # only reader and it re-plans from the catalog every batch
            shutil.rmtree(old.removeprefix("file:"), ignore_errors=True)

    ckpt = tempfile.mkdtemp(prefix="mh_cmp_ckpt_")
    try:
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(drop)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    got = sorted(
        tuple(r) for r in dedup_against_index(spark, probe, table).collect()
    )

    full_table = "mh_stream_cmp_full"
    write_minhash_index(
        docs.filter(F.col("doc_id") % 5 >= 1), full_table, str(tmp_path / "full")
    )
    want = sorted(
        tuple(r) for r in dedup_against_index(spark, probe, full_table).collect()
    )
    assert got == want and len(got) > 0


def test_compact_derives_bucket_spec_and_append_follows_flip(
    spark, sf_dir, tmp_path
):
    """The compactor reads the table's OWN bucket count from the catalog
    (an 8-bucket index stays 8 buckets — a caller can't silently rewrite
    the layout), and a post-flip append lands in the NEW generation's
    location, visible to subsequent probes."""
    import os

    from map_reduce_ruby_spark.operators.dedup_index import (
        _table_bucket_count,
        append_minhash_batch,
        compact_minhash_index,
    )

    corpus, batch = _split(spark, sf_dir)
    a = corpus.filter(F.col("doc_id") % 3 == 1)
    b = corpus.filter(F.col("doc_id") % 3 == 2)
    late = corpus.filter(F.col("doc_id") % 3 == 0)
    write_minhash_index(a, "mh_spec_t", str(tmp_path / "g1"), n_buckets=8)
    append_minhash_batch(b, "mh_spec_t")
    assert _table_bucket_count(spark, "mh_spec_t") == 8

    dst = str(tmp_path / "g2")
    compact_minhash_index(spark, "mh_spec_t", dst)
    assert _table_bucket_count(spark, "mh_spec_t") == 8

    def data_files(root):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(root)
            for f in fs
            if not f.startswith("_") and ".crc" not in f
        ]

    assert len(data_files(dst)) <= 8  # one merged file per bucket

    before = len(data_files(dst))
    append_minhash_batch(late, "mh_spec_t")
    assert len(data_files(dst)) > before  # post-flip append follows pointer

    # the maintained index now holds a ∪ b ∪ late == the whole corpus
    # slice: probe results must equal a one-shot full rebuild's
    got = sorted(
        tuple(r) for r in dedup_against_index(spark, batch, "mh_spec_t").collect()
    )
    write_minhash_index(
        corpus, "mh_spec_full", str(tmp_path / "full"), n_buckets=8
    )
    want = sorted(
        tuple(r)
        for r in dedup_against_index(spark, batch, "mh_spec_full").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_probe_equals_batch_probe_and_leaves_index_untouched(
    spark, sf_dir
):
    """Probe-on-arrival through micro-batches must return EXACTLY the
    one-shot batch probe's verdicts, and the standing index must not be
    written by the stream (it is a read-only consumer)."""
    import os
    import tempfile

    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    e = all_entries()
    streamed = sorted(
        map(tuple, e["streaming_dedup_probe"].fn(spark, sf_dir).collect())
    )
    batch = sorted(
        map(tuple, e["dedup_persisted_index"].fn(spark, sf_dir).collect())
    )
    assert streamed == batch
    assert streamed  # the fixture has cross-slice near-dups

    tag = table_fingerprint(sf_dir, "documents")
    idx_path = os.path.join(tempfile.gettempdir(), f"mh_band_idx_{tag}")
    mt = {}
    for root, _d, files in os.walk(idx_path):
        for f in files:
            p = os.path.join(root, f)
            mt[p] = os.path.getmtime(p)
    again = sorted(
        map(tuple, e["streaming_dedup_probe"].fn(spark, sf_dir).collect())
    )
    assert again == streamed
    got = {}
    for root, _d, files in os.walk(idx_path):
        for f in files:
            p = os.path.join(root, f)
            got[p] = os.path.getmtime(p)
    assert got == mt, "the stream wrote into the standing index"


def test_append_batch_id_makes_retry_a_noop(spark, sf_dir, tmp_path):
    """A committed batch id turns a re-append into a no-op (the
    append_ivf_batch/append_nb_batch protocol applied to the band index):
    the maintained index must equal the full rebuild as a MULTISET, so a
    crash-rerun of the same batch can't grow it. Without an id, the
    legacy unconditional append still appends (callers with their own
    exactly-once layer, e.g. a streaming checkpoint)."""
    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
    )

    corpus, batch = _split(spark, sf_dir)
    write_minhash_index(corpus, "mh_bid_t", str(tmp_path / "idx_bid"))
    base = spark.table("mh_bid_t").count()

    append_minhash_batch(batch, "mh_bid_t", batch_id="b1")
    once = spark.table("mh_bid_t").count()
    assert once > base

    append_minhash_batch(batch, "mh_bid_t", batch_id="b1")  # crash-rerun
    assert spark.table("mh_bid_t").count() == once, (
        "committed batch id must make the retry a no-op"
    )

    append_minhash_batch(batch, "mh_bid_t")  # no id: unconditional
    assert spark.table("mh_bid_t").count() == 2 * once - base

    # the record must survive the compaction location flip: a re-append
    # of a committed id against the NEW generation stays a no-op
    from map_reduce_ruby_spark.operators.dedup_index import (
        compact_minhash_index,
    )

    compact_minhash_index(spark, "mh_bid_t", str(tmp_path / "idx_bid_g2"))
    compacted = spark.table("mh_bid_t").count()
    assert compacted == 2 * once - base
    append_minhash_batch(batch, "mh_bid_t", batch_id="b1")
    assert spark.table("mh_bid_t").count() == compacted, (
        "committed ids must travel with the compacted generation"
    )


def test_register_raises_on_corrupt_sidecar(spark, sf_dir, tmp_path):
    """Only ABSENCE of the bucket-spec sidecar falls back to the
    historical default; a present-but-unparseable sidecar over a
    non-default layout must raise, not silently attach a guessed spec
    that mis-places rows and drops matches."""
    import os

    import pytest

    from map_reduce_ruby_spark.operators.dedup_index import (
        _BUCKET_SPEC,
        _table_bucket_count,
        register_minhash_index,
    )

    corpus, _batch = _split(spark, sf_dir)
    path = str(tmp_path / "idx_corrupt")
    write_minhash_index(corpus, "mh_corrupt_t", path, n_buckets=8)
    spark.sql("DROP TABLE mh_corrupt_t")

    spec = os.path.join(path, _BUCKET_SPEC)
    with open(spec, "w", encoding="utf-8") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        register_minhash_index(spark, "mh_corrupt_t", path)

    os.remove(spec)  # pre-sidecar legacy layout: absence falls back
    register_minhash_index(spark, "mh_corrupt_t", path)
    assert _table_bucket_count(spark, "mh_corrupt_t") == 16
