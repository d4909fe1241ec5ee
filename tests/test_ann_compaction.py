"""Index compaction + vacuum (operators/ann_index.py compact_ivf_index /
compact_pq_index / vacuum_index): the OPTIMIZE/VACUUM half of the append
lifecycle. Pinned here: row-identical merges, file-count reduction, reader
safety (compaction never deletes; vacuum is grace-gated), batch_id
idempotency surviving compaction, and append-after-compact monotonicity.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import (
    adaptive_nprobe,
    append_ivf_batch,
    append_pq_batch,
    compact_ivf_index,
    compact_pq_index,
    ivf_index_exists,
    ivf_search,
    load_ivf_index,
    load_pq_index,
    read_index_meta,
    vacuum_index,
    write_ivf_index,
    write_pq_index,
)

_DIM = 64


def _vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )


def _data_files(root):
    out = []
    for r, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(("_SUCCESS", "_META.json")) or ".crc" in f:
                continue
            out.append(os.path.join(r, f))
    return sorted(out)


def _assignment_rows(spark, path):
    stored, _ = load_ivf_index(spark, path)
    return sorted((r.id, r.cell) for r in stored.select("id", "cell").collect())


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    n = v.count()
    return v, v.filter(F.col("id") < n // 2), v.filter(F.col("id") >= n // 2), n


def test_compact_ivf_is_row_identical_and_search_invisible(
    spark, sf_dir, split, tmp_path
):
    """build(b1) + append(b2) + compact: one committed generation holding
    the identical (id, cell) multiset; search results are bit-identical;
    the merged-away generations stay ON DISK (readers planned before the
    commit keep working) until vacuum reclaims them."""
    v, b1, b2, n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    append_ivf_batch(spark, b2, path, batch_id="b2")

    before_rows = _assignment_rows(spark, path)
    stored, centroids = load_ivf_index(spark, path)
    queries = v.filter(F.col("id") < 10).select(
        F.col("id").alias("qid"), F.col("e").alias("qe")
    )
    before_search = sorted(
        tuple(r)
        for r in ivf_search(
            stored, centroids, queries, top_k=5, nprobe=adaptive_nprobe(len(centroids))
        ).collect()
    )

    assert compact_ivf_index(spark, path) is True
    meta = read_index_meta(path)
    assert meta["ingests"] == [3]  # one merged generation, id monotonic
    assert meta["batches"] == 2  # logical ingest history survives
    assert meta["batch_ids"] == ["b2"]
    assert ivf_index_exists(path)  # exists-check follows the meta, not ingest=1

    # merged-away generations still on disk until vacuum
    assert os.path.exists(os.path.join(path, "cells", "ingest=1", "_SUCCESS"))
    assert os.path.exists(os.path.join(path, "cells", "ingest=2", "_SUCCESS"))

    assert _assignment_rows(spark, path) == before_rows and len(before_rows) == n
    stored2, centroids2 = load_ivf_index(spark, path)
    after_search = sorted(
        tuple(r)
        for r in ivf_search(
            stored2, centroids2, queries, top_k=5,
            nprobe=adaptive_nprobe(len(centroids2)),
        ).collect()
    )
    assert after_search == before_search


def test_vacuum_grace_then_reclaim_and_file_count_drops(
    spark, sf_dir, split, tmp_path
):
    """A fresh vacuum pass leaves the just-unlisted generations (grace
    window covers in-flight readers); grace=0 reclaims them, and the
    compacted index holds fewer data files than the 3-generation one."""
    v, b1, b2, _n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    # two appends -> three generations of small files
    mid = b2.filter(F.col("id") % 2 == 0)
    rest = b2.filter(F.col("id") % 2 == 1)
    append_ivf_batch(spark, mid, path, batch_id="mid")
    append_ivf_batch(spark, rest, path, batch_id="rest")
    files_before = _data_files(os.path.join(path, "cells"))
    rows_before = _assignment_rows(spark, path)

    assert compact_ivf_index(spark, path) is True
    assert vacuum_index(path, grace_sec=1e9) == []  # inside grace: keep all
    assert os.path.exists(os.path.join(path, "cells", "ingest=1"))

    removed = vacuum_index(path, grace_sec=0.0)
    assert len(removed) == 3  # the three merged-away generations
    for i in (1, 2, 3):
        assert not os.path.exists(os.path.join(path, "cells", f"ingest={i}"))

    files_after = _data_files(os.path.join(path, "cells"))
    assert len(files_after) < len(files_before)
    assert _assignment_rows(spark, path) == rows_before
    assert ivf_index_exists(path)


def test_batch_id_idempotency_survives_compaction(spark, sf_dir, split, tmp_path):
    """A post-commit retry of an already-ingested batch_id stays a no-op
    AFTER its rows were merged into the compacted generation — otherwise a
    scheduled compact would reopen the double-ingest window."""
    _v, b1, b2, n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    append_ivf_batch(spark, b2, path, batch_id="day-2")
    compact_ivf_index(spark, path)
    vacuum_index(path, grace_sec=0.0)

    before = read_index_meta(path)
    append_ivf_batch(spark, b2, path, batch_id="day-2")  # retry: no-op
    assert read_index_meta(path) == before
    assert len(_assignment_rows(spark, path)) == n


def test_compact_single_generation_is_noop(spark, sf_dir, split, tmp_path):
    _v, b1, _b2, _n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    files = _data_files(path)
    assert compact_ivf_index(spark, path) is False
    assert _data_files(path) == files
    assert read_index_meta(path)["ingests"] == [1]


def test_append_after_compact_stays_monotonic(spark, sf_dir, split, tmp_path):
    """The lifecycle keeps cycling: append -> compact -> append again. New
    ingest ids never collide with a merged generation's."""
    _v, b1, b2, n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    mid = b2.filter(F.col("id") % 2 == 0)
    rest = b2.filter(F.col("id") % 2 == 1)
    append_ivf_batch(spark, mid, path, batch_id="mid")
    compact_ivf_index(spark, path)  # ingests: [3]
    append_ivf_batch(spark, rest, path, batch_id="rest")
    meta = read_index_meta(path)
    assert meta["ingests"] == [3, 4]
    assert meta["batches"] == 3
    assert len(_assignment_rows(spark, path)) == n


def test_compact_pq_merges_codes_books_untouched(spark, sf_dir, split, tmp_path):
    """PQ twin: compaction merges the code generations row-identically and
    never touches the trained codebooks."""
    v, b1, b2, n = split
    path = str(tmp_path / "pq")
    write_pq_index(spark, b1, path, dim=_DIM)
    append_pq_batch(spark, b2, path, batch_id="b2")
    codes, _books = load_pq_index(spark, path)
    before_rows = sorted(tuple(r) for r in codes.collect())
    books_mtimes = {
        p: os.path.getmtime(p)
        for p in _data_files(os.path.join(path, "pq_books"))
    }

    assert compact_pq_index(spark, path) is True
    removed = vacuum_index(path, grace_sec=0.0)
    assert len(removed) == 2
    meta = read_index_meta(path)
    assert meta["ingests"] == [3] and meta["batches"] == 2

    codes2, _books2 = load_pq_index(spark, path)
    assert sorted(tuple(r) for r in codes2.collect()) == before_rows
    assert len(before_rows) == n
    assert {
        p: os.path.getmtime(p)
        for p in _data_files(os.path.join(path, "pq_books"))
    } == books_mtimes


def test_compact_and_vacuum_reject_legacy_roots(spark, tmp_path):
    bogus = str(tmp_path / "not_an_index")
    os.makedirs(bogus)
    with pytest.raises(ValueError, match="not a current-layout"):
        compact_ivf_index(spark, bogus)
    with pytest.raises(ValueError, match="not a current-layout"):
        vacuum_index(bogus)


def test_concurrent_append_compact_probe_stress(spark, sf_dir, split, tmp_path):
    """Protocol stress: a writer thread appends batches, a maintenance
    thread compacts mid-stream, and two prober threads loop concurrent
    loads — every observed row count must be one of the committed
    cumulative states (appends commit atomically via the meta rewrite)
    and non-decreasing per prober (compaction never loses rows; merged-
    away generations stay readable until vacuum, which production defers
    past a drain window and this test defers to the end). Final state
    must be exactly all rows."""
    import threading

    v, b1, b2, n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    base = n // 2

    n_batches = 5
    batches = [b2.filter(F.col("id") % n_batches == m) for m in range(n_batches)]
    sizes = [b.count() for b in batches]
    allowed = {base}
    cum = base
    for s in sizes:
        cum += s
        allowed.add(cum)

    errors: list = []
    done = threading.Event()

    def writer():
        try:
            for m, b in enumerate(batches):
                append_ivf_batch(spark, b, path, batch_id=f"m{m}")
        except Exception as e:  # pragma: no cover - surfaced via errors
            errors.append(("writer", e))
        finally:
            done.set()

    def maintainer():
        try:
            while not done.is_set():
                compact_ivf_index(spark, path)
                done.wait(0.5)
        except Exception as e:  # pragma: no cover
            errors.append(("maintainer", e))

    def prober(name):
        last = 0
        try:
            while not done.is_set():
                stored, _c = load_ivf_index(spark, path)
                cnt = stored.count()
                assert cnt in allowed, f"{name}: {cnt} not a committed state"
                assert cnt >= last, f"{name}: count went backwards"
                last = cnt
        except Exception as e:  # pragma: no cover
            errors.append((name, e))

    threads = [
        threading.Thread(target=writer),
        threading.Thread(target=maintainer),
        threading.Thread(target=prober, args=("p1",)),
        threading.Thread(target=prober, args=("p2",)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    compact_ivf_index(spark, path)
    vacuum_index(path, grace_sec=0.0)
    stored, centroids = load_ivf_index(spark, path)
    assert stored.count() == n
    from map_reduce_ruby_spark.operators.ivf import assign_cells

    got = {(r.id, r.cell) for r in stored.select("id", "cell").collect()}
    want = {
        (r.id, r.cell)
        for r in assign_cells(v, centroids).select("id", "cell").collect()
    }
    assert got == want


def test_vacuum_grace_runs_from_retirement_not_write_mtime(
    spark, sf_dir, split, tmp_path
):
    """A generation written 30 days ago but retired one second ago still
    has in-flight readers: the grace window must run from the RETIRED
    stamp compaction wrote, not the directory mtime. True orphans (never
    listed — no reader can reach them) age by mtime as before."""
    import time

    _v, b1, b2, _n = split
    path = str(tmp_path / "ivf")
    write_ivf_index(spark, b1, path, k=None)
    append_ivf_batch(spark, b2, path, batch_id="b2")

    # age every committed generation's dir far past any grace window
    ancient = time.time() - 40 * 86400
    for i in (1, 2):
        d = os.path.join(path, "cells", f"ingest={i}")
        os.utime(d, (ancient, ancient))

    # a crashed append's orphan: unlisted, ancient -> reclaimable by mtime
    orphan = os.path.join(path, "cells", "ingest=99")
    os.makedirs(orphan)
    os.utime(orphan, (ancient, ancient))

    compact_ivf_index(spark, path)
    meta = read_index_meta(path)
    assert set(meta["retired"]) == {"1", "2"}

    removed = vacuum_index(path, grace_sec=3600.0)
    assert removed == [orphan]  # retired gens inside grace; orphan aged out
    assert os.path.exists(os.path.join(path, "cells", "ingest=1"))

    removed2 = vacuum_index(path, grace_sec=0.0)
    assert len(removed2) == 2
    assert read_index_meta(path)["retired"] == {}  # stamps pruned


def test_append_lock_heartbeat_keeps_live_lock_fresh(tmp_path, monkeypatch):
    """A live holder's lock mtime advances (so a long maintenance job is
    never mistaken for a dead writer and broken mid-flight)."""
    import time

    from map_reduce_ruby_spark.operators import artifact_store

    monkeypatch.setattr(artifact_store, "_LOCK_HEARTBEAT_SEC", 0.1)
    lock = artifact_store._AppendLock(str(tmp_path))
    with lock:
        t0 = os.path.getmtime(lock._lock)
        time.sleep(0.5)
        assert os.path.getmtime(lock._lock) > t0
    assert not os.path.exists(lock._lock)
