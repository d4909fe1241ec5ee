"""Catalog-wide physical-plan audit: no query may plan a quadratic join.

A CartesianProduct or BroadcastNestedLoopJoin anywhere in the catalog is a
100 TB outage hiding behind a passing correctness check — this test fails the
build instead. Runs plan compilation only (no execution) at sf0.001.
"""

from __future__ import annotations

import pytest

from map_reduce_ruby_spark.plans import all_entries

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Entries whose fn EXECUTES work while building (stream drains, index
# builds, checkpointed iterations): their returned frame's executedPlan IS
# audited below like everyone else's — this set only exempts them from the
# "plan compilation only" expectation, so a future slow entry is a conscious
# decision. (Build-time work they run internally is each audited by its own
# operator test: plan-shape assertions in tests/test_dedup_index.py,
# tests/test_bucketing.py, tests/test_ivf.py, tests/test_streaming*.py.)
EXECUTING_ENTRIES = {
    "streaming_tumbling_window",
    "streaming_stateful_totals",
    "streaming_dedup_events",
    "streaming_stream_stream_join",
    "streaming_session_windows",
    "streaming_mv_refresh",
    "streaming_chunk_wordcount",  # writes chunk files + drains the stream
    "dedup_persisted_index",  # writes the bucketed band index at build time
    "knn_ivf",
    "knn_ivf_pq",  # builds + joins the two component indexes at build time
    "dedup_clusters_cc",
    "dedup_clusters_cc_star",
    "dedup_cleaned_corpus",
    "corpus_budget_cut",
    "corpus_materialize",
    "sequence_pack_shards",  # prefix_sum collects bucket totals at build time
    "knn_pandas_udf",  # collects the 10-row query matrix at build time
    "ntile_customer_spend_deciles_ranged",  # collects 9 quantile boundaries at build time

    "dedup_ngram_jaccard",  # localCheckpoints its shingle set at build time
    "bpe_merge_steps",  # localCheckpoints each merge round's token table
    "text_bpe_encode",  # same checkpointed trainer + final encode fold
}

# The brute-force KNN baseline is DELIBERATELY all-pairs (it is the recall
# oracle for the ANN variants); its blocked cross join is the documented
# exception. tfidf's and q22's single-row scalar crossJoins broadcast exactly
# one row (O(n), not quadratic — Catalyst folds literal equi-keys away, so a
# 1-row BNLJ is the only way to express an uncorrelated scalar subquery).
ALLOWED_QUADRATIC = {
    "knn_bruteforce",
    "dedup_embedding_cosine",
    "tfidf_top_terms",
    "q22_dormant_rich_customers",
    # SQ8 scores the same |queries| x corpus layout as knn_bruteforce (the
    # quantization changes memory, not the candidate set); bucketed candidate
    # generation is knn_lsh/knn_ivf's job (and knn_ivf_pq composes it with
    # quantized scoring — that entry IS audited, no BNLJ).
    "knn_sq8",
    # PQ's ADC stage reads the whole code table per query by design (it is
    # the compression demo; candidate bucketing is the IVF layer's job) —
    # and it reads 8-byte codes, not vectors. knn_ivf_pq is the composed,
    # fully-bucketed form and is NOT allow-listed.
    "knn_pq",
    # 1-row scalar crossJoins (vocab size / corpus bigram total) — the same
    # uncorrelated-scalar-subquery pattern as tfidf/q22 above: O(n), not
    # quadratic.
    "text_bigram_lm_score",
    "text_pmi_collocations",
    "text_bm25_search",
}


def test_no_quadratic_joins_in_catalog(spark, sf_dir):
    offenders = {}
    for name, entry in sorted(all_entries().items()):
        if name in ALLOWED_QUADRATIC:
            continue
        plan = entry.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [k for k in FORBIDDEN if k in plan]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_executing_entries_set_is_not_stale():
    """EXECUTING_ENTRIES documents build-time work; every listed name must
    still exist in the catalog so the list can't silently rot."""
    known = set(all_entries())
    assert EXECUTING_ENTRIES <= known, EXECUTING_ENTRIES - known
