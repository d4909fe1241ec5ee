"""LruMemo (plans/memo.py): bounded LRU with release hook — the shared
session-memo machinery behind the IVF/PQ/SQ8/BPE/SNM caches."""

from __future__ import annotations

import pytest

from map_reduce_ruby_spark.plans.memo import LruMemo


def test_lru_evicts_only_least_recently_used():
    released = []
    m = LruMemo(capacity=3, unpersist=released.append)
    for k in "abc":
        m.get_or_build(k, lambda k=k: k.upper())
    m.get(
        "a"
    )  # touch: 'a' is now most-recent; 'b' is the LRU entry
    m.get_or_build("d", lambda: "D")
    assert released == ["B"], "only the LRU entry is released"
    assert "a" in m and "c" in m and "d" in m and "b" not in m
    assert len(m) == 3


def test_failed_build_evicts_nothing():
    released = []
    m = LruMemo(capacity=1, unpersist=released.append)
    m.get_or_build("a", lambda: "A")
    with pytest.raises(RuntimeError):
        m.get_or_build("b", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert released == [] and "a" in m


def test_hit_does_not_rebuild():
    calls = []
    m = LruMemo(capacity=2)
    m.get_or_build("k", lambda: calls.append(1) or "v")
    assert m.get_or_build("k", lambda: calls.append(2) or "v2") == "v"
    assert calls == [1]


def test_get_missing_raises_and_capacity_guard():
    m = LruMemo(capacity=2)
    with pytest.raises(KeyError):
        m.get("missing")
    with pytest.raises(ValueError):
        LruMemo(capacity=0)
