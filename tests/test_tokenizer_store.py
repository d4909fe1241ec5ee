"""Durable BPE tokenizer artifact (operators/tokenizer_store.py): reload
without retrain, version/params gate, keep-winner publish."""

from __future__ import annotations

import os

from map_reduce_ruby_spark.operators.tokenizer_store import (
    bpe_tokenizer_exists,
    load_bpe_tokenizer,
    write_bpe_tokenizer,
)
from map_reduce_ruby_spark.plans import all_entries
from map_reduce_ruby_spark.plans.text_queries import _BPE_STEPS, _bpe_learn
from map_reduce_ruby_spark.sources import load_table


def _mtimes(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_tokenizer_roundtrip_and_restart(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = _bpe_learn(spark, docs, return_tokens=True)
    want_merges = sorted(map(tuple, merges.collect()))
    want_vocab = sorted((r.word, r.w, tuple(r.toks)) for r in vocab.collect())

    path = str(tmp_path / "tok")
    write_bpe_tokenizer(merges, vocab, path, steps=_BPE_STEPS)
    assert bpe_tokenizer_exists(path, _BPE_STEPS)
    # a different step count is a MISS, not a stale hit
    assert not bpe_tokenizer_exists(path, _BPE_STEPS + 1)

    before = _mtimes(path)
    m2, v2 = load_bpe_tokenizer(spark, path)
    assert sorted(map(tuple, m2.collect())) == want_merges
    assert sorted((r.word, r.w, tuple(r.toks)) for r in v2.collect()) == want_vocab
    assert _mtimes(path) == before, "reload rewrote the stored artifact"


def test_tokenizer_version_gate(spark, sf_dir, tmp_path):
    import json

    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = _bpe_learn(spark, docs, return_tokens=True)
    path = str(tmp_path / "tok")
    write_bpe_tokenizer(merges, vocab, path, steps=_BPE_STEPS)
    meta_path = os.path.join(path, "_META.json")
    meta = json.load(open(meta_path))
    meta["version"] = -1  # an artifact trained by older code
    json.dump(meta, open(meta_path, "w"))
    assert not bpe_tokenizer_exists(path, _BPE_STEPS)


def test_persisted_entry_agrees_with_in_session_encode(spark, sf_dir):
    e = all_entries()
    stored = sorted(map(tuple, e["text_bpe_persisted"].fn(spark, sf_dir).collect()))
    derived = sorted(map(tuple, e["text_bpe_encode"].fn(spark, sf_dir).collect()))
    assert stored == derived
    assert stored  # non-vacuous on the fixture
