"""operators/artifact_store.py unit tests (no Spark needed): the shared
commit protocol extracted from ann_index — atomic publish semantics and
the store-neutral vacuum's data-root discovery."""

from __future__ import annotations

import json
import os

import pytest

from map_reduce_ruby_spark.operators.artifact_store import (
    _publish_atomic,
    vacuum_index,
)


def _stage(tmp_path, name, content="x"):
    d = tmp_path / name
    d.mkdir()
    (d / "data.txt").write_text(content)
    return str(d)


def test_publish_atomic_lands_by_one_rename(tmp_path):
    tmp = _stage(tmp_path, "stage")
    dest = str(tmp_path / "artifact")
    _publish_atomic(tmp, dest)
    assert os.path.exists(os.path.join(dest, "data.txt"))
    assert not os.path.exists(tmp)


def test_publish_atomic_keeps_valid_winner(tmp_path):
    """Content-addressed contract: the loser discards its staging copy and
    never deletes the live artifact under readers."""
    dest = _stage(tmp_path, "artifact", content="winner")
    tmp = _stage(tmp_path, "stage", content="loser")
    _publish_atomic(tmp, dest, keep_if_valid=lambda p: True)
    assert open(os.path.join(dest, "data.txt")).read() == "winner"
    assert not os.path.exists(tmp)


def test_publish_atomic_replaces_invalid_destination(tmp_path):
    dest = _stage(tmp_path, "artifact", content="torn")
    tmp = _stage(tmp_path, "stage", content="fresh")
    _publish_atomic(tmp, dest, keep_if_valid=lambda p: False)
    assert open(os.path.join(dest, "data.txt")).read() == "fresh"


def _mk_ingest(root, i, success=True):
    d = os.path.join(root, f"ingest={i}")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("pq")
    if success:
        open(os.path.join(d, "_SUCCESS"), "w").close()
    return d


def test_vacuum_discovers_any_per_ingest_data_root(tmp_path):
    """The vacuum is store-neutral: data roots are discovered by layout
    (child dirs holding ingest=/.stage- entries), not by a hard-coded
    name list — a store named 'widgets' gets the same reclamation."""
    path = str(tmp_path)
    root = os.path.join(path, "widgets")
    os.makedirs(root)
    committed = _mk_ingest(root, 2)
    orphan = _mk_ingest(root, 1)  # unlisted: a crashed append's leftover
    stage = os.path.join(root, ".stage-deadbeef")
    os.makedirs(stage)
    # a non-data-root sibling must NOT be treated as a data root
    side = os.path.join(path, "centroids")
    os.makedirs(side)
    open(os.path.join(side, "_SUCCESS"), "w").close()
    with open(os.path.join(path, "_META.json"), "w") as f:
        json.dump({"format": "widget_index", "version": 1, "ingests": [2]}, f)

    removed = vacuum_index(path, grace_sec=0.0)
    assert sorted(removed) == sorted([orphan, stage])
    assert os.path.exists(committed)
    assert os.path.exists(side)


def test_vacuum_respects_grace_window(tmp_path):
    path = str(tmp_path)
    root = os.path.join(path, "cells")
    os.makedirs(root)
    _mk_ingest(root, 2)
    orphan = _mk_ingest(root, 1)
    with open(os.path.join(path, "_META.json"), "w") as f:
        json.dump({"ingests": [2]}, f)
    assert vacuum_index(path, grace_sec=3600.0) == []
    assert os.path.exists(orphan)


def test_vacuum_requires_current_layout(tmp_path):
    with pytest.raises(ValueError):
        vacuum_index(str(tmp_path), grace_sec=0.0)


def test_append_lock_steals_only_a_dead_writers_lock(tmp_path, monkeypatch):
    """A SIGKILLed writer's lock file has no heartbeat and must be broken
    after the stale window; a LIVE writer's lock (heartbeating mtime)
    must never be stolen — the acquirer times out instead."""
    import threading
    import time

    from map_reduce_ruby_spark.operators import artifact_store as ast

    root = str(tmp_path)
    lock = os.path.join(root, ast._APPEND_LOCK)

    # dead writer: stale mtime, no heartbeat -> stolen, acquire succeeds
    with open(lock, "w") as f:
        f.write("99999")
    old = time.time() - 10.0
    os.utime(lock, (old, old))
    monkeypatch.setattr(ast, "_LOCK_STALE_SEC", 1.0)
    with ast._AppendLock(root):
        assert os.path.exists(lock)  # we hold it now
    assert not os.path.exists(lock)  # released

    # live writer: heartbeat keeps mtime fresh -> acquire must TIME OUT,
    # never steal
    with open(lock, "w") as f:
        f.write("88888")
    stop = threading.Event()

    def beat():
        while not stop.wait(0.2):
            try:
                os.utime(lock)
            except OSError:
                return

    t = threading.Thread(target=beat, daemon=True)
    t.start()
    try:
        with pytest.raises(TimeoutError):
            with ast._AppendLock(root):
                pass
        assert os.path.exists(lock), "a live lock must never be stolen"
    finally:
        stop.set()
        t.join()
        os.unlink(lock)
