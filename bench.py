"""Benchmark harness: runs the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed three times by default and the MINIMUM is recorded:
run 1 warms the JVM/catalog, and min-of-3 suppresses ambient machine-load
spikes (observed 1.5-2x between otherwise-identical runs on the shared test
host). Set BENCH_RUNS=1 for cold timings. Timing includes full
materialization (count() over the result — no driver-side collect of wide
rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — relational agg/join/window/topk,
# core map-reduce parity, dedup, similarity, text, events.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "star_join_full",
    "window_topk_orders_per_customer",
    "window_range_frame_spend",
    "global_topk_orders",
    "distinct_agg_priority",
    "mr_wordcount",
    "mr_user_event_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_pandas_udf",
    "knn_sq8",
    "knn_pq",
    "knn_ivf_pq",
    "knn_ivf_persisted",
    "knn_ivf_incremental",
    "knn_ivf_compacted",
    "knn_pq_incremental",
    "knn_ivf_pq_persisted",
    "dedup_embedding_cosine",
    "docs_hybrid_rrf",
    "text_quality_score",
    "text_repetition_filter",
    "sequence_pack_shards",
    "text_regex_tokens",
    "events_variant_props",
    "cms_user_counts",
    "events_tumbling_window",
    "events_sessionize",
    "events_funnel_stages",
    "asof_last_purchase",
    "salted_skew_agg",
    "df_reduce_by_key_fastpath",
    "multimodal_decode_stats",
    "multimodal_resize",
    "multimodal_frame_energy",
    "multimodal_phash_dedup",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q4_order_priority_exists",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q21_waiting_orders",
    "ntile_customer_spend_deciles_ranged",
    "zorder_tile_stats",
    "range_join_orders_promos",
    "bloom_semi_join_prune",
    "grouping_sets_flag_status",
    "dedup_clusters_cc",
    "dedup_clusters_cc_star",
    "dedup_incremental_minhash",
    "dedup_index_append",
    "dedup_index_compacted",
    "dedup_clusters_incremental",
    "dedup_span_ngram",
    "dedup_semantic_ivf",
    "corpus_global_shuffle",
    "graph_pagerank_dedup",
    "corpus_mixing_allocation",
    "corpus_budget_cut",
    "corpus_upsert_latest",
    "contamination_ngram_overlap",
    "contamination_span_removal",
    "tfidf_top_terms",
    "text_bigram_lm_score",
    "text_kn_perplexity_filter",
    "text_bm25_search",
    "text_bm25_persisted",
    "text_redact_documents",
    "doc_chunk_overlap",
    "chunk_dedup_families",
    "vocab_coverage",
    "ngram_diversity",
    "corpus_snapshot_diff",
    "mv_incremental_refresh",
    "window_rank_breadth",
    "lateral_topk_customers",
    "bpe_merge_steps",
    "text_bpe_encode",
    "text_bpe_persisted",
    "text_winnowing_fingerprint",
    "text_kneser_ney_trigram",
    "er_sorted_neighborhood",
    "dedup_sorted_neighborhood",
    "graph_triangle_count",
    "stats_moments_corr",
    "events_gap_fill_ffill",
    "streaming_mv_refresh",
    "streaming_dedup_probe",
    "approx_topk_terms",
    "approx_rolling_dau_hll",
    "events_anomaly_zscore",
    "abc_part_classification",
    "events_attribution_last_touch",
    "events_rolling_median",
    "events_value_histogram",
    "corpus_materialize",
    "corpus_constraint_checks",
    "corpus_dsir_weights",
    "corpus_dsir_select",
    "text_nb_langid",
    "text_nb_persisted",
]


def _loadavg_1m() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # platform without getloadavg
        return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    only = sys.argv[1:] or HEADLINE

    # Load-aware recording (round-6 lesson: an ambient-load-contaminated
    # record read 91.2 s where the idle truth was 66.6 s, and that stale
    # number becomes the next round's regression baseline). Ambient 1-min
    # load is sampled BEFORE the session starts; if the host is busy
    # (> BENCH_BUSY_LOAD, default 25% of this machine's cores), wait up to
    # BENCH_IDLE_WAIT_SEC (default 120 s) for it to drain. Whatever happens,
    # the JSON line carries load_1m_start / load_1m_end / host_busy so a
    # reader can see whether the record is trustworthy instead of guessing.
    ncpu = os.cpu_count() or 1
    busy_bar = float(os.environ.get("BENCH_BUSY_LOAD", str(ncpu * 0.25)))
    load_start = _loadavg_1m()
    waited = 0.0
    wait_budget = float(os.environ.get("BENCH_IDLE_WAIT_SEC", "120"))
    while load_start > busy_bar and waited < wait_budget:
        print(
            f"bench: host busy (load1m={load_start:.1f} > {busy_bar:.1f}), "
            f"waiting... ({waited:.0f}/{wait_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
        load_start = _loadavg_1m()

    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="bench")
    entries = all_entries()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in only:
        fn = entries[name].fn
        samples = []
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(min(samples), 3)
        # within-session noise floor per query: (max - min) across the
        # WARM repeat runs (run 1 is the JVM/catalog warmup — including it
        # would report warmup cost, not noise). A reader comparing two
        # records can tell a real regression from ambient noise when the
        # delta is inside the spread band; cross-session variance (the
        # stronger signal) comes from tools/bench_stability.py.
        warm = samples[1:] if len(samples) > 1 else samples
        spread[name] = round(max(warm) - min(warm), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "query_spread": spread,
        "runs_per_query": max(1, runs),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # provenance: was the host quiet when this record was taken?
        # (bench's own local[32] run inflates load_1m_end — the trust
        # signal is load_1m_start, sampled pre-session.)
        "load_1m_start": round(load_start, 2),
        "load_1m_end": round(_loadavg_1m(), 2),
        "host_busy": bool(load_start > busy_bar),
    }
    line = json.dumps(out)
    # The one-line record also lands in a file: a driver that tails stdout
    # once lost the headline line to interleaved JVM noise (BENCH_r03's tail
    # was clipped mid-record). stdout stays the contract; the file is the
    # durable copy ($BENCH_OUT, default BENCH_LAST.json beside this script).
    path = os.environ.get(
        "BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
    )
    try:
        with open(path, "w", encoding="utf-8") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"warning: could not write {path}: {e}", file=sys.stderr)
    sys.stdout.flush()
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
