"""Durable BPE tokenizer artifact: the persisted-index lifecycle applied
to the tokenizer family.

Every other trained artifact in the engine has a stored form (IVF cells /
PQ codes — operators/ann_index.py; MinHash bands — operators/
dedup_index.py; BM25 postings — operators/text_index.py). The tokenizer
was the last session-memoized holdout: ``text_bpe_encode`` retrains its
merges in every new session. This module persists the trainer's two
outputs — the learned merge list and the fully-encoded word vocabulary —
so a RESTARTED session (or the thousand encode-only executors of a real
tokenization run) encodes a corpus from parquet alone.

Unlike the ANN/BM25 indexes there is NO append path: BPE merges are a
global frequency argmax, so adding documents is a retrain by definition
(the industry practice too — tokenizers are versioned artifacts, frozen
per model generation, not incrementally maintained). The artifact is
therefore write-once/reload-many with the same staged-build + one-rename
publish and content-addressed keep-winner semantics as the sibling
stores, and a version/params gate in _META.json so an artifact trained by
older code or different step counts is a cache MISS, never a silent
stale load.

Layout:

    <root>/merges/*.parquet   (step, p, q, cnt)        -- provenance
    <root>/vocab/*.parquet    (word, w, toks)          -- the encode map
    <root>/_META.json         {format, version, steps}

Scale shape: the vocab table is the BOUNDED artifact (distinct words of
the training corpus, not corpus rows) the 100 TB encode broadcasts; the
corpus side stays one explode + broadcast-hash-join, identical to
text_bpe_encode's plan.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from map_reduce_ruby_spark.operators.artifact_store import (
    _META_NAME,
    _publish_atomic,
    _read_meta,
)

BPE_TOKENIZER_VERSION = 1


def _tok_meta(steps: int) -> dict:
    return {
        "format": "bpe_tokenizer",
        "version": BPE_TOKENIZER_VERSION,
        "steps": int(steps),
    }


def bpe_tokenizer_exists(path: str, steps: int) -> bool:
    """Fully committed (parquet _SUCCESS on both components) AND built by
    the CURRENT trainer with the same merge count."""
    return (
        os.path.exists(os.path.join(path, "merges", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "vocab", "_SUCCESS"))
        and _read_meta(path) == _tok_meta(steps)
    )


def write_bpe_tokenizer(
    merges: DataFrame,
    vocab: DataFrame,
    path: str,
    steps: int,
    replace: bool = False,
) -> None:
    """Persist a trained tokenizer: (step, p, q, cnt) merges and the
    encoded (word, w, toks) vocabulary. Staged under a sibling temp root,
    published by ONE rename; at a content-addressed path a valid existing
    artifact is the keep-winner (the trainer is deterministic, so same
    path means same bytes — concurrent writers never delete a live
    artifact under readers). ``replace=True`` for retraining over
    different data at the same path (not reader-safe)."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    merges.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "merges"))
    # the vocab is bounded (distinct training words) but not tiny: keep
    # the writer's natural parallelism, readers broadcast it anyway
    vocab.write.mode("overwrite").parquet(os.path.join(tmp, "vocab"))
    with open(os.path.join(tmp, _META_NAME), "w", encoding="utf-8") as f:
        json.dump(_tok_meta(steps), f)
    if replace:
        shutil.rmtree(path, ignore_errors=True)
    _publish_atomic(tmp, path, keep_if_valid=lambda p: bpe_tokenizer_exists(p, steps))


def load_bpe_tokenizer(
    spark: SparkSession, path: str, steps: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(merges, vocab) read from storage — no training jobs. Raises on a
    missing artifact, a different trainer VERSION, or (when ``steps`` is
    given) a different merge count — a direct load must be as strict as
    the ``bpe_tokenizer_exists`` gate, or a caller that skips the gate
    (or races a concurrent replace=True retrain past it) silently gets a
    tokenizer trained with different parameters.

    ``steps=None`` accepts WHATEVER merge count the stored meta records
    (the check degrades to format+version — the meta's own ``steps`` is
    trivially equal to itself): use it only for introspection tools that
    genuinely accept any artifact at the path. A caller that trained (or
    expects) a specific tokenizer must pass its ``steps`` to get the full
    strict gate — the plan-facing entries all do."""
    meta = _read_meta(path)
    if meta is None:
        raise ValueError(f"{path!r} does not hold a committed BPE tokenizer")
    want_steps = meta.get("steps", -1) if steps is None else steps
    if meta != _tok_meta(want_steps):
        raise ValueError(
            f"{path!r} does not hold a committed current-version BPE "
            f"tokenizer (found meta {meta!r})"
        )
    merges = spark.read.parquet(os.path.join(path, "merges"))
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    return merges, vocab
