"""Durable ANN index (operators/ann_index.py): restart without retrain,
stored == freshly-built determinism, partition-pruned probes, and the PQ
codes/codebooks roundtrip.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import (
    adaptive_nprobe,
    build_ivf_index,
    build_pq_index,
    ivf_index_exists,
    ivf_search,
    load_ivf_index,
    load_pq_index,
    pq_index_exists,
    pq_search,
    write_ivf_index,
    write_pq_index,
)

_DIM = 64


def _vectors(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
    )


def _queries(v):
    return v.filter(F.col("id") < 10).select(
        F.col("id").alias("qid"), F.col("e").alias("qe")
    )


def _mtimes(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def _ranked(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rn) for r in df.collect()
    )


@pytest.fixture(scope="module")
def ivf_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf")
    write_ivf_index(spark, _vectors(spark, sf_dir), path, k=None)
    return path


def test_ivf_index_survives_restart_without_retrain(spark, sf_dir, ivf_path):
    """Reload from storage, search, and compare to a FRESH build: identical
    centroids and identical ranked results — and the stored files are not
    rewritten by the reload+search (no retrain: mtimes untouched)."""
    assert ivf_index_exists(ivf_path)
    before = _mtimes(ivf_path)

    v = _vectors(spark, sf_dir)
    a1, c1 = load_ivf_index(spark, ivf_path)
    r1 = _ranked(ivf_search(a1, c1, _queries(v), 5, adaptive_nprobe(len(c1))))

    # "restart": a second, independent load — nothing carried over in memory
    a2, c2 = load_ivf_index(spark, ivf_path)
    r2 = _ranked(ivf_search(a2, c2, _queries(v), 5, adaptive_nprobe(len(c2))))
    assert c2 == c1
    assert r2 == r1

    # stored == freshly trained (bit-deterministic builder)
    a3, c3 = build_ivf_index(v, k=None, iterations=2)
    r3 = _ranked(ivf_search(a3, c3, _queries(v), 5, adaptive_nprobe(len(c3))))
    a3.unpersist()
    assert c3 == c1
    assert r3 == r1

    # stored assignments row-identical to rebuilt ones
    stored = {(r.id, r.cell) for r in a1.select("id", "cell").collect()}
    n = v.count()
    assert len(stored) == n
    assert _mtimes(ivf_path) == before


def test_ivf_persisted_probe_prunes_partitions(spark, sf_dir, ivf_path):
    """The probe join against the stored cell-partitioned layout must drive
    dynamic partition pruning: only probed cells' files are read."""
    v = _vectors(spark, sf_dir)
    a, c = load_ivf_index(spark, ivf_path)
    df = ivf_search(a, c, _queries(v), 5, adaptive_nprobe(len(c)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines()
        if "FileScan" in line and "/cells" in line
    )
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in scan, scan


def test_pq_index_roundtrip_and_restart(spark, sf_dir, tmp_path):
    """PQ codes + codebooks persist and reload shaped exactly like the
    builder's return; search over the loaded index equals search over the
    freshly built one; reload does not rewrite."""
    path = str(tmp_path / "pq")
    v = _vectors(spark, sf_dir)
    write_pq_index(spark, v, path, dim=_DIM)
    assert pq_index_exists(path)
    before = _mtimes(path)

    codes_l, books_l = load_pq_index(spark, path)
    codes_b, books_b = build_pq_index(v, dim=_DIM)
    assert books_l == books_b
    rows_l = sorted(tuple(r) for r in codes_l.collect())
    rows_b = sorted(tuple(r) for r in codes_b.collect())
    assert rows_l == rows_b
    codes_b.unpersist()

    r_loaded = _ranked(pq_search(codes_l, books_l, _queries(v), v, dim=_DIM))
    codes_b2, books_b2 = build_pq_index(v, dim=_DIM)
    r_built = _ranked(pq_search(codes_b2, books_b2, _queries(v), v, dim=_DIM))
    codes_b2.unpersist()
    assert r_loaded == r_built
    assert _mtimes(path) == before


def test_ivf_index_exists_requires_both_components(tmp_path):
    path = str(tmp_path / "ivf")
    assert not ivf_index_exists(path)
    os.makedirs(os.path.join(path, "cells"))
    open(os.path.join(path, "cells", "_SUCCESS"), "w").close()
    assert not ivf_index_exists(path)  # centroids missing -> not an index


def test_ivf_index_version_gate_invalidates_stale_builds(ivf_path):
    """A committed index trained by OLDER builder code (different _META.json
    version) must be a cache MISS — /tmp-keyed roots outlive the process, so
    without this gate a builder change would silently load stale output."""
    import json

    meta_path = os.path.join(ivf_path, "_META.json")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    assert ivf_index_exists(ivf_path)
    try:
        stale = dict(meta, version=meta["version"] - 1)
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump(stale, f)
        assert not ivf_index_exists(ivf_path)
        # missing meta entirely (legacy pre-version index) is also a miss
        os.remove(meta_path)
        assert not ivf_index_exists(ivf_path)
        # and different build params are a miss too
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump(dict(meta, k=4), f)
        assert not ivf_index_exists(ivf_path)
    finally:
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump(meta, f)
    assert ivf_index_exists(ivf_path)


def test_append_ivf_batch_no_retrain_no_rewrite(spark, sf_dir, tmp_path):
    """Incremental ingest (append_ivf_batch): batch-2 is assigned to the
    STORED centroids and appended — centroids and every pre-existing cell
    data file keep their mtimes (no retrain, no rewrite), the combined
    assignments equal assign_cells(all, centroids), and the meta batch
    counter bumps as the append's commit point."""
    from map_reduce_ruby_spark.operators import (
        append_ivf_batch,
        read_index_meta,
    )
    from map_reduce_ruby_spark.operators.ivf import assign_cells

    path = str(tmp_path / "inc")
    v = _vectors(spark, sf_dir)
    n = v.count()
    b1 = v.filter(F.col("id") < n // 2)
    b2 = v.filter(F.col("id") >= n // 2)
    write_ivf_index(spark, b1, path, k=None)
    assert read_index_meta(path)["batches"] == 1

    def data_files(root):
        return {
            p: t
            for p, t in _mtimes(root).items()
            if not p.endswith(("_SUCCESS", "_META.json")) and ".crc" not in p
        }

    before_cells = data_files(os.path.join(path, "cells", "ingest=1"))
    before_centroids = data_files(os.path.join(path, "centroids"))

    append_ivf_batch(spark, b2, path)
    meta = read_index_meta(path)
    assert meta["batches"] == 2
    assert meta["ingests"] == [1, 2]

    # batch-1's ingest partition is COMPLETELY untouched (per-ingest
    # layout: an append can never rewrite — or even add to — an earlier
    # batch)
    assert data_files(os.path.join(path, "cells", "ingest=1")) == before_cells
    assert len(data_files(os.path.join(path, "cells", "ingest=2"))) > 0
    # centroids completely untouched (no retrain)
    assert data_files(os.path.join(path, "centroids")) == before_centroids

    # combined stored assignments == assigning the full corpus to the
    # batch-1 centroids (the split-ingest semantics the oracle rebuilds)
    stored, centroids = load_ivf_index(spark, path)
    got = {(r.id, r.cell) for r in stored.select("id", "cell").collect()}
    want = {
        (r.id, r.cell)
        for r in assign_cells(v, centroids).select("id", "cell").collect()
    }
    assert got == want and len(got) == n


def test_append_pq_batch_no_retrain_no_rewrite(spark, sf_dir, tmp_path):
    """append_pq_batch: batch-2 is encoded against the STORED codebooks —
    codebooks and pre-existing codes files keep their mtimes, the combined
    codes equal encoding the full corpus with the batch-1 books, and the
    meta batch counter bumps."""
    from map_reduce_ruby_spark.operators import append_pq_batch, read_index_meta
    from map_reduce_ruby_spark.operators.pq import encode_with_books

    path = str(tmp_path / "pqinc")
    v = _vectors(spark, sf_dir)
    n = v.count()
    b1 = v.filter(F.col("id") < n // 2)
    b2 = v.filter(F.col("id") >= n // 2)
    write_pq_index(spark, b1, path, dim=_DIM)
    assert read_index_meta(path)["batches"] == 1

    def data_files(root):
        return {
            p: t
            for p, t in _mtimes(root).items()
            if not p.endswith(("_SUCCESS", "_META.json")) and ".crc" not in p
        }

    before_codes = data_files(os.path.join(path, "pq_codes", "ingest=1"))
    before_books = data_files(os.path.join(path, "pq_books"))

    append_pq_batch(spark, b2, path)
    meta = read_index_meta(path)
    assert meta["batches"] == 2
    assert meta["ingests"] == [1, 2]

    # batch-1's codes partition completely untouched; batch-2 is its own
    assert data_files(os.path.join(path, "pq_codes", "ingest=1")) == before_codes
    assert len(data_files(os.path.join(path, "pq_codes", "ingest=2"))) > 0
    assert data_files(os.path.join(path, "pq_books")) == before_books

    codes, books = load_pq_index(spark, path)
    got = sorted(tuple(r) for r in codes.collect())
    want = sorted(tuple(r) for r in encode_with_books(v, books, _DIM).collect())
    assert got == want and len(got) == n


def test_append_minhash_batch_no_corpus_rewrite(spark, sf_dir, tmp_path):
    """append_minhash_batch: the corpus slice's bucket files keep their
    mtimes; the appended index equals the full rebuild row-for-row (banding
    has no trained state, so incremental == rebuild exactly)."""
    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        write_minhash_index,
    )
    from map_reduce_ruby_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_a = docs.filter(F.col("doc_id") % 5 >= 2)
    batch_b = docs.filter(F.col("doc_id") % 5 == 1)

    inc_path = str(tmp_path / "mh_inc")
    write_minhash_index(corpus_a, "mh_inc_t", inc_path)
    before = {
        p: t for p, t in _mtimes(inc_path).items()
        if not p.endswith("_SUCCESS") and ".crc" not in p
    }
    append_minhash_batch(batch_b, "mh_inc_t")
    after = {
        p: t for p, t in _mtimes(inc_path).items()
        if not p.endswith("_SUCCESS") and ".crc" not in p
    }
    for p, t in before.items():
        assert after.get(p) == t, f"corpus bucket file rewritten: {p}"
    assert len(after) > len(before)

    full_path = str(tmp_path / "mh_full")
    write_minhash_index(
        docs.filter(F.col("doc_id") % 5 != 0), "mh_full_t", full_path
    )
    inc_rows = sorted(
        tuple(r) for r in spark.table("mh_inc_t").collect()
    )
    full_rows = sorted(
        tuple(r) for r in spark.table("mh_full_t").collect()
    )
    assert inc_rows == full_rows


def test_ivf_write_publishes_atomically_and_cleans_staging(spark, sf_dir, tmp_path):
    """The staged build leaves no .tmp-* sibling behind, and a pre-existing
    INVALID root (crashed legacy writer) is replaced by the publish."""
    root = tmp_path / "pub"
    root.mkdir()
    path = str(root / "ivf")
    # plant an invalid root: committed-looking cells but no centroids/meta
    os.makedirs(os.path.join(path, "cells"))
    open(os.path.join(path, "cells", "_SUCCESS"), "w").close()
    assert not ivf_index_exists(path)

    write_ivf_index(spark, _vectors(spark, sf_dir), path, k=None)
    assert ivf_index_exists(path)
    # no staging residue next to the published root
    assert [p.name for p in root.iterdir()] == ["ivf"]
    # the planted invalid content is gone (replaced, not merged)
    a, c = load_ivf_index(spark, path)
    assert len(c) > 0
    assert a.count() > 0


def test_append_ivf_batch_crash_retry_is_idempotent(spark, sf_dir, tmp_path):
    """A crash between the batch-dir publish and the meta rewrite leaves a
    committed-looking ORPHAN dir with meta still at batches == 1. Retrying
    the append must replace the orphan and ingest the batch exactly once —
    the property the per-batch-dir layout exists for (an in-place parquet
    append would double-ingest here)."""
    import json

    from map_reduce_ruby_spark.operators import append_ivf_batch, read_index_meta

    path = str(tmp_path / "retry")
    v = _vectors(spark, sf_dir)
    n = v.count()
    b1 = v.filter(F.col("id") < n // 2)
    b2 = v.filter(F.col("id") >= n // 2)
    write_ivf_index(spark, b1, path, k=None)
    append_ivf_batch(spark, b2, path)

    # simulate the crash: roll the meta back to its pre-append state while
    # leaving the ingest=2 partition on disk as the orphan
    meta = read_index_meta(path)
    stale = dict(meta, batches=1, ingests=[1])
    with open(os.path.join(path, "_META.json"), "w", encoding="utf-8") as f:
        json.dump(stale, f)
    assert os.path.isdir(os.path.join(path, "cells", "ingest=2"))  # the orphan

    append_ivf_batch(spark, b2, path)  # the retry
    assert read_index_meta(path)["batches"] == 2
    stored, _centroids = load_ivf_index(spark, path)
    assert stored.count() == n  # exactly once: no duplicate batch-2 rows
    assert stored.select("id").distinct().count() == n


def test_append_ivf_batch_id_makes_post_commit_retry_noop(spark, sf_dir, tmp_path):
    """A retry AFTER the meta commit (orchestrator died before recording
    success) must not double-ingest when the caller supplies a stable
    batch_id: the committed id short-circuits to a no-op."""
    from map_reduce_ruby_spark.operators import append_ivf_batch, read_index_meta

    path = str(tmp_path / "noop")
    v = _vectors(spark, sf_dir)
    n = v.count()
    b1 = v.filter(F.col("id") < n // 2)
    b2 = v.filter(F.col("id") >= n // 2)
    write_ivf_index(spark, b1, path, k=None)
    append_ivf_batch(spark, b2, path, batch_id="day-1")
    meta1 = read_index_meta(path)
    assert meta1["batch_ids"] == ["day-1"]

    append_ivf_batch(spark, b2, path, batch_id="day-1")  # the retry
    meta2 = read_index_meta(path)
    assert meta2 == meta1  # nothing changed: no new ingest, no re-commit
    stored, _c = load_ivf_index(spark, path)
    assert stored.count() == n


def test_write_over_valid_index_keeps_winner(spark, sf_dir, tmp_path):
    """Content-addressed publish: re-running write_ivf_index at a path that
    already holds a VALID index keeps the existing artifact byte-for-byte
    (no deletion under a concurrent reader); replace=True rebuilds."""
    path = str(tmp_path / "keep")
    v = _vectors(spark, sf_dir)
    write_ivf_index(spark, v, path, k=None)
    before = _mtimes(path)
    write_ivf_index(spark, v, path, k=None)  # same inputs, same path
    assert _mtimes(path) == before  # kept, not replaced

    write_ivf_index(spark, v, path, k=None, replace=True)
    assert ivf_index_exists(path)
    assert _mtimes(path) != before  # explicitly rebuilt


def test_load_rejects_legacy_layout_clearly(spark, sf_dir, tmp_path):
    """A pre-per-ingest index root must fail load with a descriptive error,
    not an unresolved-'ingest'-column AnalysisException from inside the
    scan."""
    import json

    path = str(tmp_path / "legacy")
    v = _vectors(spark, sf_dir)
    write_ivf_index(spark, v, path, k=None)
    meta_path = os.path.join(path, "_META.json")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    legacy = {f: x for f, x in meta.items() if f not in ("ingests",)}
    with open(meta_path, "w", encoding="utf-8") as f:
        json.dump(legacy, f)
    with pytest.raises(ValueError, match="layout"):
        load_ivf_index(spark, path)


def test_ivf_pq_persisted_entry_reloads_all_artifacts(spark, sf_dir):
    """The composed catalog entry: the first run trains/persists the two
    component artifacts AND materializes the composed cell-partitioned
    IVFADC table; a second run must serve from storage alone — no file
    under ANY of the three roots is rewritten — and return the identical
    ranked result."""
    import tempfile

    from map_reduce_ruby_spark.operators.ann_index import (
        IVF_INDEX_VERSION,
        IVFADC_INDEX_VERSION,
        PQ_INDEX_VERSION,
    )
    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    fn = all_entries()["knn_ivf_pq_persisted"].fn
    first = _ranked(fn(spark, sf_dir))
    assert first  # the fixture corpus is non-empty

    tag = table_fingerprint(sf_dir, "embeddings")
    roots = [
        os.path.join(tempfile.gettempdir(), f"ivf_idx_v{IVF_INDEX_VERSION}_{tag}"),
        os.path.join(tempfile.gettempdir(), f"pq_full_idx_v{PQ_INDEX_VERSION}_{tag}"),
        os.path.join(tempfile.gettempdir(), f"ivfadc_idx_v{IVFADC_INDEX_VERSION}_{tag}"),
    ]
    for r in roots:
        assert os.path.isdir(r), r
    before = {r: _mtimes(r) for r in roots}
    second = _ranked(fn(spark, sf_dir))
    assert second == first
    for r in roots:
        assert _mtimes(r) == before[r], f"{r} was rewritten on reload"


def test_ivfadc_probe_prunes_partitions(spark, sf_dir):
    """The probe against the composed cell-partitioned IVFADC artifact
    must drive dynamic partition pruning: only probed cells' code files
    are read."""
    from map_reduce_ruby_spark.plans import all_entries

    df = all_entries()["knn_ivf_pq_persisted"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines()
        if "FileScan" in line and "ivfadc_idx" in line
    )
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in scan, scan


def test_ivfadc_goes_stale_when_a_component_moves(spark, sf_dir, tmp_path):
    """The composed artifact snapshots its components' generations: an
    append on the IVF component must turn ivfadc_index_exists into a
    MISS (rebuild), never a silently stale serve."""
    from map_reduce_ruby_spark.operators.ann_index import (
        append_ivf_batch,
        ivfadc_index_exists,
        write_ivf_index,
        write_ivfadc_index,
        write_pq_index,
    )

    v = _vectors(spark, sf_dir)
    n = v.count()
    half = n // 2
    ivf_p = str(tmp_path / "ivf")
    pq_p = str(tmp_path / "pq")
    adc_p = str(tmp_path / "adc")
    write_ivf_index(spark, v.filter(F.col("id") < half), ivf_p, k=None)
    write_pq_index(
        spark, v.filter(F.col("id") < half), pq_p, dim=64, n_sub=8, k=16
    )
    write_ivfadc_index(spark, ivf_p, pq_p, adc_p, k=None, n_sub=8, pk=16)
    assert ivfadc_index_exists(
        adc_p, None, 8, 16, ivf_path=ivf_p, pq_path=pq_p
    )
    append_ivf_batch(
        spark, v.filter(F.col("id") >= half), ivf_p, batch_id="b2"
    )
    assert not ivfadc_index_exists(
        adc_p, None, 8, 16, ivf_path=ivf_p, pq_path=pq_p
    ), "component append did not invalidate the composed artifact"


def test_load_ivfadc_is_as_strict_as_the_exists_gate(spark, sf_dir, tmp_path):
    """load_ivfadc_index raises on a foreign-format or wrong-version meta,
    and (when given the component paths) on a composed table that is stale
    w.r.t. a component append — a caller that skips ivfadc_index_exists,
    or races a rebuild past it, must never silently serve stale bytes."""
    import json as _json

    import pytest as _pytest

    from map_reduce_ruby_spark.operators.ann_index import (
        append_ivf_batch,
        load_ivfadc_index,
        write_ivf_index,
        write_ivfadc_index,
        write_pq_index,
    )

    v = _vectors(spark, sf_dir)
    half = v.count() // 2
    ivf_p, pq_p, adc_p = (str(tmp_path / d) for d in ("ivf", "pq", "adc"))
    write_ivf_index(spark, v.filter(F.col("id") < half), ivf_p, k=None)
    write_pq_index(spark, v.filter(F.col("id") < half), pq_p, dim=64, n_sub=8, k=16)
    write_ivfadc_index(spark, ivf_p, pq_p, adc_p, k=None, n_sub=8, pk=16)

    # healthy load, with and without component re-verification
    assert load_ivfadc_index(spark, adc_p).count() == half
    assert load_ivfadc_index(spark, adc_p, ivf_path=ivf_p, pq_path=pq_p).count() == half

    # component moved on: plain load still serves the recorded snapshot,
    # but a component-verified load refuses
    append_ivf_batch(spark, v.filter(F.col("id") >= half), ivf_p, batch_id="b2")
    with _pytest.raises(ValueError, match="stale"):
        load_ivfadc_index(spark, adc_p, ivf_path=ivf_p, pq_path=pq_p)

    # wrong version / foreign format refuse outright
    meta_path = os.path.join(adc_p, "_META.json")
    meta = _json.load(open(meta_path))
    _json.dump(dict(meta, version=meta["version"] + 1), open(meta_path, "w"))
    with _pytest.raises(ValueError, match="current-version"):
        load_ivfadc_index(spark, adc_p)
    _json.dump(dict(meta, format="bpe_tokenizer"), open(meta_path, "w"))
    with _pytest.raises(ValueError, match="current-version"):
        load_ivfadc_index(spark, adc_p)
