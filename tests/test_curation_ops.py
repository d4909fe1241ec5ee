"""Semantic invariants for the round-3 curation operators, pinned beyond the
cross-engine oracle: chunk coverage arithmetic, triangle counts vs a
brute-force reference, the BPE greedy-fold non-overlap rule, and the
decorrelated LATERAL plan shape.
"""

from __future__ import annotations

from map_reduce_ruby_spark.plans import all_entries


def run(spark, sf_dir, name):
    return all_entries()[name].fn(spark, sf_dir).toPandas()


# --- doc_chunk_overlap -------------------------------------------------------


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    """Per doc: chunk starts stride by 24, every token lands in >= 1 chunk,
    and the chunk count matches the closed-form ceil formula."""
    from map_reduce_ruby_spark.plans.pipeline_queries import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
    )

    chunks = run(spark, sf_dir, "doc_chunk_overlap")
    docs = (
        all_entries()["text_token_stats"].fn(spark, sf_dir).toPandas()
    )  # doc_id -> n_tokens
    ntok = dict(zip(docs.doc_id, docs.n_tokens))
    for doc_id, grp in chunks.groupby("doc_id"):
        n = ntok[doc_id]
        expect_chunks = (
            1 if n <= _CHUNK_TOKENS else (n - _CHUNK_TOKENS + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE + 1
        )
        assert len(grp) == expect_chunks, (doc_id, n, len(grp))
        assert sorted(grp.chunk_idx) == list(range(expect_chunks))
        # coverage: last chunk's [start, start + chunk_tokens) must reach n
        last = grp[grp.chunk_idx == expect_chunks - 1].iloc[0]
        last_start = 1 + (expect_chunks - 1) * _CHUNK_STRIDE
        assert last_start + last.chunk_tokens - 1 == n, (doc_id, n)
        # every non-tail chunk is full-width
        full = grp[grp.chunk_idx < expect_chunks - 1]
        assert (full.chunk_tokens == _CHUNK_TOKENS).all()


# --- graph_triangle_count ----------------------------------------------------


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    pairs = run(spark, sf_dir, "dedup_minhash_lsh")[["doc_a", "doc_b"]]
    edges = {tuple(sorted(t)) for t in pairs.itertuples(index=False)}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict[int, int] = {n: 0 for n in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            # each triangle is found once per edge (3x total); each find
            # credits the OPPOSITE corner, so every corner ends up +1/triangle
            expect[c] += 1
    got = run(spark, sf_dir, "graph_triangle_count")
    assert set(got.doc_id) == set(adj)
    for row in got.itertuples(index=False):
        assert row.deg == len(adj[row.doc_id]), row
        assert row.n_triangles == expect[row.doc_id], row


# --- bpe_merge_steps ---------------------------------------------------------


def _fold(spark, tokens: list[str], p: str, q: str) -> str:
    from map_reduce_ruby_spark.plans.text_queries import _bpe_case_sql

    case = _bpe_case_sql(f"'{p}'", f"'{q}'", "length")
    arr = "array(" + ",".join(f"'{t}'" for t in tokens) + ")"
    sql = (
        f"SELECT aggregate(slice({arr}, 2, size({arr}) - 1), "
        f"element_at({arr}, 1), (acc, t) -> {case}) AS out"
    )
    return spark.sql(sql).collect()[0].out


def test_bpe_fold_merges_greedy_left_to_right(spark):
    assert _fold(spark, ["a", "b", "a", "b"], "a", "b") == "a+b a+b"
    # non-overlap: a merged token never re-matches its left half
    assert _fold(spark, ["a", "a", "b", "b"], "a", "b") == "a a+b b"
    assert _fold(spark, ["b", "b", "b"], "b", "b") == "b+b b"
    # no occurrence -> identity join
    assert _fold(spark, ["x", "y"], "a", "b") == "x y"
    # suffix check must match whole tokens only: 'ca' ends with 'a' as a
    # SUBSTRING but is not the token 'a'
    assert _fold(spark, ["ca", "b"], "a", "b") == "ca b"


def _fold_dispatch(spark, tokens: list[str], p: str, q: str) -> list[str]:
    """Drive the PRODUCTION fold expression (vectorized p<>q branch,
    sequential p=q branch) exactly as _bpe_learn applies it."""
    from map_reduce_ruby_spark.plans.text_queries import _bpe_fold_expr

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(tokens, p, q)], "toks array<string>, p string, q string")
    return df.select(F.expr(_bpe_fold_expr()).alias("out")).collect()[0].out


def test_bpe_vectorized_fold_equals_sequential(spark):
    """The p<>q fast path (per-position transform) must produce exactly the
    sequential greedy fold's output on every adjacency shape, and the p=q
    dispatch must keep run-overlap semantics."""
    cases = [
        (["a", "b", "a", "b"], "a", "b"),
        (["a", "a", "b", "b"], "a", "b"),   # 'p p q' right-anchored match
        (["a", "b", "b", "a"], "a", "b"),   # 'p q q' left-anchored match
        (["x", "y"], "a", "b"),             # no match
        (["ca", "b"], "a", "b"),            # whole-token match only
        (["a", "b"], "a", "b"),             # doc collapses to one token
        (["b", "b", "b"], "b", "b"),        # p=q run parity
        (["b", "b", "b", "b"], "b", "b"),
        (["a", "b", "b", "b", "a", "b"], "a", "b"),
    ]
    for toks, p, q in cases:
        got = _fold_dispatch(spark, toks, p, q)
        want = _fold(spark, toks, p, q).split(" ")
        assert got == want, (toks, p, q, got, want)


def test_bpe_steps_are_distinct_and_positive(spark, sf_dir):
    from map_reduce_ruby_spark.plans.text_queries import _BPE_STEPS

    got = run(spark, sf_dir, "bpe_merge_steps").sort_values("step")
    assert list(got.step) == list(range(1, _BPE_STEPS + 1))
    assert (got.cnt > 0).all()
    # a merged pair is fully consumed by its round's greedy fold, so the
    # same (p, q) can never win twice
    assert len({(r.p, r.q) for r in got.itertuples(index=False)}) == _BPE_STEPS


# --- corpus_snapshot_diff ----------------------------------------------------


def test_snapshot_diff_classes(spark, sf_dir):
    got = run(spark, sf_dir, "corpus_snapshot_diff")
    by_class = {k: set(g.doc_id) for k, g in got.groupby("change_class")}
    all_ids = set(got.doc_id)
    for doc_id in all_ids:
        in_old = doc_id % 13 != 5
        in_new = doc_id % 11 != 3
        if not in_old:
            expect = "added"
        elif not in_new:
            expect = "removed"
        elif doc_id % 7 == 0:
            expect = "changed"
        else:
            expect = "unchanged"
        assert doc_id in by_class.get(expect, set()), (doc_id, expect)
    # removed rows have no new_len; added rows no old_len
    assert (got[got.change_class == "removed"].new_len == -1).all()
    assert (got[got.change_class == "added"].old_len == -1).all()
    # changed rows grew by exactly len(' [rev2]')
    ch = got[got.change_class == "changed"]
    assert (ch.new_len - ch.old_len == 7).all()


# --- lateral_topk_customers --------------------------------------------------


def test_lateral_decorrelates_to_window_group_limit(spark, sf_dir):
    df = all_entries()["lateral_topk_customers"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    got = df.toPandas()
    assert (got.groupby("n_name").size() <= 3).all()


# --- mv_incremental_refresh --------------------------------------------------


def test_mv_refresh_flags_only_delta_grains(spark, sf_dir):
    from map_reduce_ruby_spark.sources import load_table
    from pyspark.sql import functions as F

    got = run(spark, sf_dir, "mv_incremental_refresh")
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("day_no", F.expr("ts_us div 86400000000"))
        .toPandas()
    )
    delta_grains = {
        (r.day_no, r.event_type)
        for r in ev[ev.event_id % 10 == 7].itertuples(index=False)
    }
    for row in got.itertuples(index=False):
        assert bool(row.was_refreshed) == ((row.day_no, row.event_type) in delta_grains)
    # totals equal the direct aggregation
    direct = ev.groupby(["day_no", "event_type"]).size()
    for row in got.itertuples(index=False):
        assert row.n_events == direct[(row.day_no, row.event_type)]


def test_bpe_survives_single_token_words(spark):
    """A word that collapses to ONE symbol after a merge round must not
    abort the next round's pair count (sequence(1, 0) is DESCENDING in
    Spark and element_at would throw under ANSI mode) — regression for the
    CASE guard in _bpe_learn's pair index. Also pins the frequency
    weighting: 'ab' appears twice, so round 1's (a, b) count is 3 (2 from
    the two 'ab' occurrences + 1 from 'abcd'), not the 2 distinct words."""
    from map_reduce_ruby_spark.plans.text_queries import _bpe_learn

    rows = [(0, "ab abcd"), (1, "ab")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.step: (r.p, r.q, r.cnt) for r in _bpe_learn(spark, docs, steps=3).collect()
    }
    # round 1 merges (a, b) everywhere (weighted cnt 3); the word 'ab'
    # becomes the single symbol 'a+b' and must simply drop out of round 2's
    # pair counting. Round 2 ties (a+b, c) with (c, d) at cnt 1 -> the
    # deterministic p-asc tie-break picks 'a+b' < 'c'.
    assert got[1] == ("a", "b", 3)
    assert got[2] == ("a+b", "c", 1)
    assert got[3] == ("a+b+c", "d", 1)


# --- dedup_embedding_cosine (bounded recall harness) -------------------------


def test_cosine_harness_equals_allpairs_ground_truth(spark, sf_dir):
    """The catalog entry is a LINEAR recall harness (stride-sampled queries
    x full corpus). This test keeps the retired ALL-PAIRS baseline alive at
    small SF: a numpy O(n^2) cosine matrix is the ground truth, and the
    harness output must equal its restriction to the sampled query rows —
    pairs, 4dp similarities, and LSH bucket-hit flags."""
    import numpy as np
    import pandas as pd

    from map_reduce_ruby_spark.plans.dedup_queries import _cosine_sample_stride
    from map_reduce_ruby_spark.plans.similarity_queries import _PLANES

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    E = np.array(emb.embedding.tolist(), dtype=np.float64)
    ids = emb.vec_id.to_numpy()
    nrm = np.linalg.norm(E, axis=1)
    S = np.round((E / nrm[:, None]) @ (E / nrm[:, None]).T, 4)  # all-pairs
    planes = np.array(_PLANES, dtype=np.float64)  # (n_planes, dim)
    buckets = ((E @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(len(planes)))

    stride = _cosine_sample_stride(len(ids))
    qmask = ids % stride == 0
    expect = set()
    for qi in np.nonzero(qmask)[0]:
        for ci in range(len(ids)):
            if ids[ci] != ids[qi] and S[qi, ci] >= 0.35:
                expect.add(
                    (ids[qi], ids[ci], S[qi, ci], int(buckets[qi] == buckets[ci]))
                )

    got = run(spark, sf_dir, "dedup_embedding_cosine")
    got_set = {
        (r.vec_a, r.vec_b, r.cos_sim, r.lsh_hit)
        for r in got.itertuples(index=False)
    }
    assert got_set == expect
    assert len(got) == len(expect)  # no duplicate pairs either
