"""Training-data-pipeline queries beyond the dedup/similarity families:
deterministic train/test splitting, TF-IDF term weighting, and the bucketed
range join applied to a point-in-interval workload.

The reference has none of these (SURVEY.md §2.2 — no joins, no sampling, no
scalar function library); they are part of the Spark-native capability
surface a pretraining pipeline needs at 100 TB.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import dsum, dsum_sql, h32, h32_sql
from map_reduce_ruby_spark.plans.dedup_queries import _LSH_PAIRS_SQL
from map_reduce_ruby_spark.operators import range_join
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

# --- promo calendar for the range-join query --------------------------------
# 24 overlapping 45-day promo windows, every 30 days from 1995-06-01: stride <
# length, so an order date can fall inside two windows (a genuine
# many-to-many range join, not a binning).
_PROMO_BASE_DAY = (date(1995, 6, 1) - date(1970, 1, 1)).days
_N_PROMOS = 24
_PROMO_STRIDE = 30
_PROMO_LEN = 45
_PROMO_BIN = 64  # bin width ~ interval length: fan-out <= 2 bins per interval


@register(
    "range_join_orders_promos",
    oracle=f"""
    WITH promos AS (
        SELECT k::BIGINT AS promo_id,
               {_PROMO_BASE_DAY} + k * {_PROMO_STRIDE} AS start_day,
               {_PROMO_BASE_DAY} + k * {_PROMO_STRIDE} + {_PROMO_LEN} AS end_day
        FROM range(0, {_N_PROMOS}) t(k)
    ),
    pts AS (
        SELECT o_totalprice,
               date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS order_day
        FROM orders
    )
    SELECT promo_id,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'promo_revenue')}
    FROM pts JOIN promos ON order_day BETWEEN start_day AND end_day
    GROUP BY promo_id
    """,
    doc="Point-in-interval range join (operators/range_join.py): orders "
    "joined to overlapping promo windows by order date, then revenue per "
    "promo. Executed as a bin-bucketed EQUI-join (bin width ~ interval "
    "length) + residual BETWEEN — a shuffle hash join instead of the "
    "BroadcastNestedLoopJoin Spark would pick for a raw theta join. Scale: "
    "both sides stay distributed; interval fan-out is <= 2 rows per promo; "
    "the shuffle key (bin) is time, so AQE skew-split handles hot periods. "
    "The reference has no join operators at all (SURVEY.md §2.2).",
    tags=("join", "range", "custom-operator"),
)
def range_join_orders_promos(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("order_day"),
    )
    promos = spark.range(_N_PROMOS).select(
        F.col("id").alias("promo_id"),
        (F.lit(_PROMO_BASE_DAY) + F.col("id") * _PROMO_STRIDE).alias("start_day"),
        (F.lit(_PROMO_BASE_DAY) + F.col("id") * _PROMO_STRIDE + _PROMO_LEN).alias("end_day"),
    )
    joined = range_join(pts, promos, "order_day", "start_day", "end_day", _PROMO_BIN)
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "promo_revenue"),
    )


@register(
    "train_test_split",
    oracle=f"""
    SELECT CASE WHEN {h32_sql("'split:' || doc_id::VARCHAR")} % 100 < 80
                THEN 'train' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Deterministic hash-based train/test split (80/20): the split label "
    "is a pure function of doc_id via the portable md5 h32, so membership is "
    "reproducible across engines, runs, and re-partitions — the property "
    "random sampling lacks. Scale: no shuffle to assign splits (scan-side "
    "expression); downstream writers partition by the label. Reported here "
    "as per-(split, lang) counts.",
    tags=("sampling", "split", "pipeline"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = h32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.withColumn("split", F.when(bucket < 80, "train").otherwise("test"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    per_term AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS tf_sum
        FROM tf GROUP BY term
    )
    SELECT term, df,
           ROUND(ROUND((n_docs + 1.0) / (df + 1.0), 6) * tf_sum, 6) AS tfidf
    FROM per_term, n
    ORDER BY tfidf DESC, term
    LIMIT 20
    """,
    doc="TF-IDF term weighting over the corpus: per-(doc, term) counts, "
    "document frequency, inverse-document-frequency weight, top-20 terms by "
    "corpus score (ties broken by term). The IDF weight is the log-free "
    "ratio (N+1)/(df+1) rounded to 6 decimals: ln() is not guaranteed "
    "bit-identical across engines, a ratio is. Scale: two shuffles (doc-term "
    "counts, then per-term rollup), both on uniform keys; N is a broadcast "
    "scalar; top-k is TakeOrderedAndProject, no global sort.",
    tags=("text", "tfidf", "topk"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_sum"),
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idfw = F.round((F.col("n_docs") + 1.0) / (F.col("df") + 1.0), 6)
    return (
        per_term.crossJoin(F.broadcast(n))
        .select("term", "df", F.round(idfw * F.col("tf_sum"), 6).alias("tfidf"))
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(20)
    )


# --- corpus budget cut -------------------------------------------------------
# Keep documents, in deterministic hash order, until a character budget is
# exhausted — the "cut the corpus at N tokens" step of training-data prep.
_BUDGET_CHARS = 200_000
_BUDGET_BUCKETS = 16  # h32 is uniform 32-bit; bucket = top bits keeps order


@register(
    "corpus_budget_cut",
    oracle=f"""
    WITH ordered AS (
        SELECT lang, n_chars,
               {h32_sql("'budget:' || doc_id::VARCHAR")} AS h, doc_id
        FROM documents
    ),
    cum AS (
        SELECT lang, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM ordered
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM cum WHERE cum_before < {_BUDGET_CHARS}
    GROUP BY lang
    """,
    doc="Token-budget corpus cut: order documents by a deterministic hash "
    "(an engine-reproducible global shuffle), take documents until the "
    "cumulative size passes the budget, report the kept set per language. "
    "The cumulative sum uses operators/prefix_sum.py's two-phase scan — "
    "per-bucket totals + driver-side offsets + within-bucket windows — NOT "
    "a single-partition global window, so the scan parallelizes at 100 TB. "
    "The oracle is the plain (single-threaded) window form of the same sum.",
    tags=("sampling", "budget", "pipeline", "custom-operator"),
)
def corpus_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import exclusive_prefix_sum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        h32(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    # h is uniform in [0, 2^32); its top bits are a monotone coarsening.
    bucket = F.floor(F.col("h") / F.lit((1 << 32) // _BUDGET_BUCKETS))
    cum = exclusive_prefix_sum(
        docs, "n_chars", ["h", "doc_id"], bucket, out_col="cum_before"
    )
    return (
        cum.filter(F.col("cum_before") < _BUDGET_CHARS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )


@register(
    "stratified_sample_langs",
    oracle=f"""
    SELECT lang,
           MIN(10 + {h32_sql("'rate:' || lang")} % 90) AS rate_permille,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (
               WHERE {h32_sql("'samp:' || doc_id::VARCHAR")} % 1000
                     < 10 + {h32_sql("'rate:' || lang")} % 90
           ) AS n_kept
    FROM documents GROUP BY lang
    """,
    doc="Stratified deterministic sampling: each language gets its own "
    "keep-rate (here itself hash-derived so no hardcoded language list), and "
    "membership is a pure function of doc_id — reproducible across engines, "
    "runs and partitionings, unlike rand()-based sampling. Scale: the rate "
    "and the membership test are scan-side expressions; ONE aggregation "
    "pass produces totals and kept counts together (conditional count), no "
    "join, no second scan.",
    tags=("sampling", "stratified", "pipeline"),
)
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = h32(F.concat(F.lit("rate:"), F.col("lang"))) % 90 + 10
    member = (
        h32(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))) % 1000 < rate
    )
    return docs.groupBy("lang").agg(
        F.min(rate).alias("rate_permille"),
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(member).alias("n_kept"),
    )


# --- benchmark contamination check ------------------------------------------
# A pseudo "benchmark set" (5% of docs, hash-selected) stands in for an eval
# suite; contamination = training docs sharing any word 4-gram with it.
_CONTAM_N = 4
_CONTAM_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
_CONTAM_GRAM_SQL = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_CONTAM_N))


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, {_CONTAM_TOKENS_SQL} AS toks,
               {h32_sql("'bench:' || doc_id::VARCHAR")} % 100 < 5 AS is_bench
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, is_bench,
               unnest(list_distinct(list_transform(
                   range(1, len(toks) - {_CONTAM_N - 2}),
                   i -> md5({_CONTAM_GRAM_SQL})))) AS g
        FROM tok WHERE len(toks) >= {_CONTAM_N}
    ),
    bg AS (SELECT DISTINCT g FROM grams WHERE is_bench)
    SELECT lang, COUNT(DISTINCT doc_id) AS n_contaminated
    FROM grams JOIN bg USING (g)
    WHERE NOT is_bench
    GROUP BY lang
    """,
    doc="Benchmark-contamination check: flag training documents sharing any "
    "word 4-gram with a (hash-selected 5%) benchmark set — the decontamination "
    "step every pretraining pipeline runs against eval suites. Grams are "
    "md5-keyed (128-bit: no false positives, fixed-width join key). Scale: "
    "the benchmark side is small by construction, so its distinct gram set "
    "is BROADCAST — the full corpus is probed map-side with no shuffle of "
    "the gram explosion; the only wide op is the final per-lang distinct "
    "count.",
    tags=("text", "contamination", "pipeline"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    gram = lambda i: F.md5(  # noqa: E731
        F.concat_ws(
            " ", *[F.element_at("toks", i + j + 1) for j in range(_CONTAM_N)]
        )
    )
    grams = (
        docs.select(
            "doc_id",
            "lang",
            toks.alias("toks"),
            (
                h32(F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))) % 100 < 5
            ).alias("is_bench"),
        )
        .filter(F.size("toks") >= _CONTAM_N)
        .select(
            "doc_id",
            "lang",
            "is_bench",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - _CONTAM_N), gram
                    )
                )
            ).alias("g"),
        )
    )
    bench_grams = grams.filter("is_bench").select("g").distinct()
    return (
        grams.filter(~F.col("is_bench"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
    )


# --- flagship: full corpus materialization ----------------------------------
# Every pipeline stage composed into the final keep/drop verdict per document:
#   keep = quality gate AND near-dup cluster keeper AND not benchmark-
#          contaminated. This is the query a training run actually consumes.


@register(
    "corpus_materialize",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_LSH_PAIRS_SQL}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
    dup_losers AS (SELECT node AS doc_id FROM comp WHERE node <> component),
    tok AS (
        SELECT doc_id, lang, n_chars, {_CONTAM_TOKENS_SQL} AS toks,
               {h32_sql("'bench:' || doc_id::VARCHAR")} % 100 < 5 AS is_bench
        FROM documents
    ),
    grams AS (
        SELECT doc_id, is_bench,
               unnest(list_distinct(list_transform(
                   range(1, len(toks) - {_CONTAM_N - 2}),
                   i -> md5({_CONTAM_GRAM_SQL})))) AS g
        FROM tok WHERE len(toks) >= {_CONTAM_N}
    ),
    bg AS (SELECT DISTINCT g FROM grams WHERE is_bench),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams JOIN bg USING (g) WHERE NOT is_bench
    ),
    verdicts AS (
        SELECT t.doc_id, t.lang, t.n_chars,
               CASE WHEN len(t.toks) >= 20
                     AND t.doc_id NOT IN (SELECT doc_id FROM dup_losers)
                     AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)
                     AND NOT t.is_bench
                    THEN 1 ELSE 0 END AS keep
        FROM tok t
    )
    SELECT lang,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM verdicts GROUP BY lang
    """,
    doc="FLAGSHIP corpus materialization: the full training-data pipeline "
    "composed into one keep/drop verdict per document — minimum length "
    "(quality gate), near-dup cluster keeper (MinHash-LSH pairs -> connected "
    "components, losers dropped), benchmark decontamination (word-4-gram "
    "overlap, benchmark docs themselves excluded) — reported per language. "
    "Scale: the verdict joins are all BROADCAST (drop/contaminated sets are "
    "small by construction); the heavy stages (LSH bucketing, 4-gram "
    "explode) each shuffle on uniform hash keys; the component loop is "
    "O(cluster diameter). This is the query whose output a training run "
    "consumes, so it is the one the whole catalog exists to serve.",
    tags=("pipeline", "dedup", "contamination", "flagship"),
)
def corpus_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import connected_components
    from map_reduce_ruby_spark.plans.dedup_queries import dedup_minhash_lsh

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        toks.alias("toks"),
        (h32(F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))) % 100 < 5).alias(
            "is_bench"
        ),
    )

    # dup losers (non-keeper cluster members)
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )

    # contaminated docs (any 4-gram shared with the benchmark subset)
    gram = lambda i: F.md5(  # noqa: E731
        F.concat_ws(" ", *[F.element_at("toks", i + j + 1) for j in range(_CONTAM_N)])
    )
    grams = base.filter(F.size("toks") >= _CONTAM_N).select(
        "doc_id",
        "is_bench",
        F.explode(
            F.array_distinct(
                F.transform(F.sequence(F.lit(0), F.size("toks") - _CONTAM_N), gram)
            )
        ).alias("g"),
    )
    bench_grams = grams.filter("is_bench").select("g").distinct()
    contaminated = (
        grams.filter(~F.col("is_bench"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )

    verdict = (
        base.join(F.broadcast(losers.withColumn("__dup", F.lit(1))), "doc_id", "left")
        .join(F.broadcast(contaminated.withColumn("__contam", F.lit(1))), "doc_id", "left")
        .select(
            "lang",
            "n_chars",
            F.when(
                (F.size("toks") >= 20)
                & F.col("__dup").isNull()
                & F.col("__contam").isNull()
                & ~F.col("is_bench"),
                1,
            )
            .otherwise(0)
            .alias("keep"),
        )
    )
    return verdict.groupBy("lang").agg(
        F.sum("keep").cast("long").alias("n_kept"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


_SHARD_TOKENS = 4096  # tokens per training shard (~7 shards at sf0.01)


@register(
    "sequence_pack_shards",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    w -> w <> '')) AS BIGINT) AS n_tokens,
               {h32_sql("'pack:' || doc_id::VARCHAR")} AS h
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM toks
    )
    SELECT CAST(FLOOR(cum_before / {_SHARD_TOKENS}) AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM cum
    GROUP BY shard_id
    """,
    doc="Sequence packing: assign documents, in deterministic hash order, to "
    "fixed-token-budget training shards (shard = exclusive-prefix-token-count "
    "div budget — the greedy packer every LLM data pipeline runs before "
    "tokenized-example writing). The global running count is "
    "operators/prefix_sum.py's two-phase scan (per-bucket totals + driver "
    "offsets + within-bucket windows), NOT a single-partition window, so "
    "packing parallelizes at 100 TB; the oracle is the single-threaded "
    "window form. A follow-on partitionBy(shard_id) write gives one file "
    "per shard.",
    tags=("pipeline", "packing", "custom-operator"),
)
def sequence_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import exclusive_prefix_sum
    from map_reduce_ruby_spark.plans.text_queries import _tokens_spark

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_tokens_spark(F.col("text"))).cast("long").alias("n_tokens"),
        h32(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    bucket = F.floor(F.col("h") / F.lit((1 << 32) // _BUDGET_BUCKETS))
    cum = exclusive_prefix_sum(
        docs, "n_tokens", ["h", "doc_id"], bucket, out_col="cum_before"
    )
    return (
        cum.withColumn(
            "shard_id", F.floor(F.col("cum_before") / _SHARD_TOKENS).cast("long")
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
        )
    )


@register(
    "corpus_upsert_latest",
    oracle=f"""
    WITH updates AS (
        SELECT doc_id, lang,
               n_chars + 7 AS n_chars, 2 AS version
        FROM documents WHERE doc_id % 5 = 0
    ),
    unioned AS (
        SELECT doc_id, lang, n_chars, 1 AS version FROM documents
        UNION ALL
        SELECT doc_id, lang, n_chars, version FROM updates
    ),
    latest AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY version DESC) AS rn
        FROM unioned
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_updated
    FROM latest WHERE rn = 1
    GROUP BY lang
    """,
    doc="Idempotent corpus upsert (MERGE emulation without a table format): "
    "a re-crawl batch (higher version) unions with the base corpus and "
    "latest-wins per doc_id via a ranked window — the standard "
    "full-snapshot merge when Delta/Iceberg MERGE INTO isn't available. "
    "Scale: one shuffle on doc_id (the window); at 100 TB the base side "
    "would be partitioned by doc_id bucket so only touched buckets rewrite "
    "(the write side of operators/bucketing.py). Re-running the same batch "
    "yields the same result — at-least-once ingestion is absorbed.",
    tags=("pipeline", "upsert", "window"),
)
def corpus_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = docs.withColumn("version", F.lit(1))
    updates = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("n_chars", F.col("n_chars") + 7)
        .withColumn("version", F.lit(2))
    )
    unioned = base.unionByName(updates)
    w = W.partitionBy("doc_id").orderBy(F.desc("version"))
    latest = unioned.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
    )


@register(
    "corpus_scd2_history",
    oracle="""
    WITH versions AS (
        SELECT doc_id, lang, n_chars, 1 AS version FROM documents
        UNION ALL
        SELECT doc_id, lang, n_chars + 7, 2 FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars + 11, 3 FROM documents WHERE doc_id % 10 = 0
    ),
    hist AS (
        SELECT doc_id, lang, n_chars, version AS valid_from,
               COALESCE(lead(version) OVER (PARTITION BY doc_id
                                            ORDER BY version), 999999)
                   AS valid_to,
               CASE WHEN lead(version) OVER (PARTITION BY doc_id
                                             ORDER BY version) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM versions
    )
    SELECT lang,
           COUNT(*) AS n_versions,
           CAST(SUM(is_current) AS BIGINT) AS n_current,
           CAST(SUM(CASE WHEN is_current = 1 THEN n_chars ELSE 0 END)
                AS BIGINT) AS current_chars
    FROM hist
    GROUP BY lang
    """,
    doc="SCD2 history (CDC pattern without a table format): every ingest "
    "batch is a version; lead(version) over each doc's history closes the "
    "prior record's validity interval and the NULL-lead row is current — "
    "full history retained, current slice selectable by flag. One shuffle "
    "on doc_id (the window); at 100 TB the history table partitions by "
    "ingest date so old intervals are never rewritten.",
    tags=("pipeline", "scd2", "window"),
)
def corpus_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    versions = (
        docs.withColumn("version", F.lit(1))
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 0)
            .withColumn("n_chars", F.col("n_chars") + 7)
            .withColumn("version", F.lit(2))
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0)
            .withColumn("n_chars", F.col("n_chars") + 11)
            .withColumn("version", F.lit(3))
        )
    )
    w = W.partitionBy("doc_id").orderBy("version")
    nxt = F.lead("version").over(w)
    hist = versions.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("version").alias("valid_from"),
        F.coalesce(nxt, F.lit(999999)).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )
    return hist.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum("is_current").cast("long").alias("n_current"),
        F.sum(F.when(F.col("is_current") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("current_chars"),
    )


@register(
    "corpus_mixing_allocation",
    oracle="""
    WITH per_source AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(ROUND(sqrt(CAST(SUM(n_chars) AS DOUBLE)) * 1000000)
                    AS BIGINT) AS w_fixed
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(w_fixed) AS wsum FROM per_source)
    SELECT source, n_docs, total_chars,
           ROUND(CAST(w_fixed AS DOUBLE) / CAST((SELECT wsum FROM tot) AS DOUBLE),
                 6) AS mix_weight,
           CAST(ROUND(1000000.0 * CAST(w_fixed AS DOUBLE)
                      / CAST((SELECT wsum FROM tot) AS DOUBLE))
                AS BIGINT) AS token_budget
    FROM per_source
    """,
    doc="Temperature-weighted data-mixing allocation (alpha = 0.5): each "
    "source's sampling weight is size^alpha / sum(size^alpha) — the "
    "standard down-weighting of giant web sources vs small curated ones "
    "when composing a training mix — and a 1M-token budget is split "
    "proportionally. Determinism across engines: sqrt(size) is rounded to "
    "fixed-point micro-units BEFORE the normalization sum, so the total is "
    "an exact integer (float addition order never matters) and every share "
    "is one double division. Scale: one aggregate over the corpus, then "
    "arithmetic over |sources| rows; the weights table is what the sampler "
    "joins (broadcast) against the shard stream.",
    tags=("pipeline", "mixing", "aggregate"),
)
def corpus_mixing_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.sqrt(F.sum("n_chars").cast("double")) * 1_000_000)
        .cast("long")
        .alias("w_fixed"),
    )
    # |sources| is tiny at any corpus scale: whole-frame window over the
    # aggregated series (the q15 pattern), not a driver collect.
    wsum = F.sum("w_fixed").over(W.partitionBy(F.lit(1)))
    return (
        per_source.withColumn("wsum", wsum)
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.round(F.col("w_fixed").cast("double") / F.col("wsum").cast("double"), 6).alias(
                "mix_weight"
            ),
            F.round(
                1_000_000.0 * F.col("w_fixed").cast("double") / F.col("wsum").cast("double")
            )
            .cast("long")
            .alias("token_budget"),
        )
    )


# --- training-order shuffle + per-domain quotas ------------------------------

_N_SHUFFLE_SHARDS = 8
_DOMAIN_QUOTA = 10


@register(
    "corpus_global_shuffle",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {h32_sql("CAST(doc_id AS VARCHAR)", seed=7)} % {_N_SHUFFLE_SHARDS} AS shard,
               {h32_sql("CAST(doc_id AS VARCHAR)", seed=11)} AS ord_hash
        FROM documents
    )
    SELECT doc_id, shard, ord_hash,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY ord_hash, doc_id) AS BIGINT) AS ord_in_shard
    FROM s
    """,
    doc="Deterministic training-order shuffle: every doc gets a seeded-hash "
    "shard (uniform, data-independent) and a seeded order hash; within each "
    "shard, ord_in_shard is the reproducible pseudorandom read order. This "
    "is how an epoch order is laid down at 100 TB: NO global row_number "
    "(which would serialize through one partition — the NTILE trap flagged "
    "in round 1); the only window is partitioned by shard, so each of the "
    "N_shards ranks runs parallel and bounded. Re-running with the same "
    "seeds reproduces the exact order — resumable training.",
    tags=("pipeline", "sampling", "extension"),
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    s = docs.select(
        "doc_id",
        (h32(key, seed=7) % _N_SHUFFLE_SHARDS).alias("shard"),
        h32(key, seed=11).alias("ord_hash"),
    )
    w = W.partitionBy("shard").orderBy("ord_hash", "doc_id")
    return s.withColumn("ord_in_shard", F.row_number().over(w).cast("long"))


@register(
    "domain_quota_sample",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {h32_sql("CAST(doc_id AS VARCHAR)", seed=13)},
                                           doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_DOMAIN_QUOTA}
    """,
    doc="Per-domain quota sampling (the CommonCrawl-style cap: no source may "
    "dominate the corpus): rank each source's docs by a seeded hash — a "
    "reproducible uniform sample, not head-of-file bias — and keep the "
    "first 10. One window partitioned by source; at 100 TB a pathologically "
    "hot domain makes that partition wide, in which case the rank is "
    "replaced by the same hash with a threshold chosen from a per-source "
    "count (join on the count, filter hash < quota/count * 2^32 — no window "
    "at all); documented here, window form kept while quotas are small.",
    tags=("pipeline", "sampling", "extension"),
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        h32(F.col("doc_id").cast("string"), seed=13), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= _DOMAIN_QUOTA)
    )


# --- weighted sampling (Efraimidis-Spirakis A-ES) ----------------------------

_WS_TOPK = 30


@register(
    "weighted_sample_docs",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ROUND(ln(({h32_sql("CAST(doc_id AS VARCHAR)", seed=17)} + 1)
                        / 4294967296.0) / n_chars, 10) AS akey
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars, akey,
               row_number() OVER (ORDER BY akey DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT doc_id, source, n_chars, akey, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_WS_TOPK}
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "each doc draws a deterministic md5-derived uniform u and competes with "
    "key ln(u)/w (the log form of u^(1/w); w = n_chars, so longer docs are "
    "proportionally likelier); the global top-30 keys ARE the weighted "
    "sample. One pass, no per-group state: at 100 TB this is "
    "TakeOrderedAndProject (per-partition heaps + driver merge of 30-row "
    "tops), never a global sort. Keys rounded to 10dp before ranking with a "
    "doc_id tie-break so both engines rank identically.",
    tags=("pipeline", "sampling", "extension"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (h32(F.col("doc_id").cast("string"), seed=17) + 1) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 10).alias("akey"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (asserted for the topk
    # family in tests/test_plans.py) — the scale-safe global top-k.
    top = keyed.orderBy(F.desc("akey"), F.asc("doc_id")).limit(_WS_TOPK)
    w = W.orderBy(F.desc("akey"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


# --- Sliding-window document chunking ---------------------------------------

_CHUNK_TOKENS = 32  # tokens per training chunk
_CHUNK_STRIDE = 24  # overlap = _CHUNK_TOKENS - _CHUNK_STRIDE = 8 tokens


def chunk_token_arrays(df: DataFrame, tok_col: str = "toks") -> DataFrame:
    """Explode an array-of-tokens column into overlapping sliding-window
    chunks (_CHUNK_TOKENS tokens, stride _CHUNK_STRIDE, short tail kept):
    appends (chunk_idx, chunk) to the input columns; empty-array rows drop.
    The ONE definition of the chunk arithmetic — shared by doc_chunk_overlap,
    chunk_dedup_families, and examples/pretraining_pipeline.py."""
    n = F.size(F.col(tok_col))
    n_chunks = F.when(n <= _CHUNK_TOKENS, F.lit(1)).otherwise(
        (
            F.floor(
                (n - _CHUNK_TOKENS + _CHUNK_STRIDE - 1)
                / F.lit(float(_CHUNK_STRIDE))
            )
            + 1
        ).cast("long")
    )
    exploded = df.filter(n > 0).select(
        "*",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias(
            "chunk_idx"
        ),
    )
    return exploded.select(
        "*",
        F.slice(
            tok_col,
            F.lit(1) + F.col("chunk_idx").cast("int") * _CHUNK_STRIDE,
            _CHUNK_TOKENS,
        ).alias("chunk"),
    )


# Shared with chunk_dedup_families below (its input IS this query).
_CHUNK_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, {_CONTAM_TOKENS_SQL} AS toks,
               len({_CONTAM_TOKENS_SQL}) AS n
        FROM documents
        WHERE len({_CONTAM_TOKENS_SQL}) > 0
    ),
    chunks AS (
        SELECT doc_id, n,
               CAST(i.i AS BIGINT) AS chunk_idx,
               1 + i.i * {_CHUNK_STRIDE} AS start_tok
        FROM tok, UNNEST(range(0,
            CASE WHEN n <= {_CHUNK_TOKENS} THEN 1
                 ELSE CAST(floor((n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1)
                                 / {_CHUNK_STRIDE}.0) AS BIGINT) + 1
            END)) AS i(i)
    )
    SELECT c.doc_id, c.chunk_idx,
           CAST(len(list_slice(t.toks, c.start_tok,
                               c.start_tok + {_CHUNK_TOKENS} - 1)) AS BIGINT)
               AS chunk_tokens,
           md5(array_to_string(list_slice(t.toks, c.start_tok,
                               c.start_tok + {_CHUNK_TOKENS} - 1), ' '))
               AS chunk_hash
    FROM chunks c JOIN tok t USING (doc_id)
"""


@register(
    "doc_chunk_overlap",
    oracle=_CHUNK_ORACLE,
    doc="Sliding-window chunking: split each document into "
    f"{_CHUNK_TOKENS}-token training chunks with stride {_CHUNK_STRIDE} "
    "(8-token overlap preserves cross-boundary context) — the step between "
    "cleaning and sequence packing in a pretraining pipeline. The chunk "
    "table carries an md5 content hash so chunk-level dedup can run "
    "downstream without re-tokenizing. Scale: pure narrow ops (split, "
    "sequence, explode, slice) — zero shuffles, embarrassingly parallel, "
    "output rows ~ n_tokens/stride per doc. The tail chunk is kept short "
    "(last start covers every trailing token exactly once past the final "
    "full window). No reference twin (user map code would do this; "
    "SURVEY.md §2.2 scalar functions).",
    tags=("pipeline", "chunking", "extension"),
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.plans.text_queries import _tokens_spark

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", _tokens_spark(F.col("text")).alias("toks"))
    return chunk_token_arrays(base).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"),
    )


# --- Corpus snapshot diff ----------------------------------------------------


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH old_gen AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 13 <> 5
    ),
    new_gen AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END
                   AS text
        FROM documents WHERE doc_id % 11 <> 3
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           COALESCE(o.source, n.source) AS source,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text <> n.text THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           CAST(COALESCE(length(o.text), -1) AS BIGINT) AS old_len,
           CAST(COALESCE(length(n.text), -1) AS BIGINT) AS new_len
    FROM old_gen o FULL OUTER JOIN new_gen n ON o.doc_id = n.doc_id
    """,
    doc="Snapshot diff between two corpus generations (derived "
    "deterministically from the documents table: doc_id % 13 = 5 rows are "
    "new-only, % 11 = 3 rows were dropped, % 7 = 0 rows were revised): "
    "FULL OUTER join on the document key classifies every row "
    "added/removed/changed/unchanged — the audit a versioned corpus store "
    "runs between releases. The only full-outer-join entry in the catalog "
    "(q13 is left outer). Scale: one sort-merge join on the primary key; "
    "change detection compares text in place — at 100 TB you'd compare "
    "stored content hashes instead, same plan shape.",
    tags=("pipeline", "diff", "join", "outer", "extension"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    old_gen = docs.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id", "source", "text"
    )
    new_gen = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    o, n = old_gen.alias("o"), new_gen.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
        F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.text") != F.col("n.text"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_class"),
        F.coalesce(F.length("o.text").cast("long"), F.lit(-1)).alias("old_len"),
        F.coalesce(F.length("n.text").cast("long"), F.lit(-1)).alias("new_len"),
    )


@register(
    "chunk_dedup_families",
    oracle=f"""
    WITH chunk_table AS ({_CHUNK_ORACLE})
    SELECT chunk_hash,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM chunk_table
    WHERE chunk_tokens >= 8
    GROUP BY chunk_hash
    HAVING COUNT(*) >= 2
    """,
    doc="Chunk-LEVEL exact dedup (the stage the pipeline example runs after "
    "chunking): duplicate families over the md5 chunk hashes from "
    "doc_chunk_overlap — near-identical documents that escape doc-level "
    "exact dedup still produce byte-identical 32-token chunks, and "
    "training dedups at chunk granularity (Lee et al.'s motivation for "
    "span dedup, applied to fixed windows). Sub-8-token tail chunks are "
    "excluded (short windows collide by chance, not by provenance). "
    "Scale: one shuffle on the uniform 128-bit hash after the narrow "
    "chunking pass — identical cost shape to dedup_exact, at ~n_tokens/24 "
    "x the row count.",
    tags=("pipeline", "chunking", "dedup", "extension"),
)
def chunk_dedup_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = doc_chunk_overlap(spark, sf_dir)
    return (
        chunks.filter(F.col("chunk_tokens") >= 8)
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# --- Span-level decontamination ----------------------------------------------

_SPAN_GRAM_SQL = " || ' ' || ".join(f"toks[p.pos+{j}]" for j in range(_CONTAM_N))


@register(
    "contamination_span_removal",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_CONTAM_TOKENS_SQL} AS toks,
               {h32_sql("'bench:' || doc_id::VARCHAR")} % 100 < 5 AS is_bench
        FROM documents
        WHERE len({_CONTAM_TOKENS_SQL}) >= {_CONTAM_N}
    ),
    gp AS (
        SELECT doc_id, is_bench, CAST(p.pos AS BIGINT) AS pos,
               md5({_SPAN_GRAM_SQL}) AS g
        FROM tok, UNNEST(range(1, len(toks) - {_CONTAM_N - 2})) AS p(pos)
    ),
    bg AS (SELECT DISTINCT g FROM gp WHERE is_bench),
    hits AS (
        SELECT gp.doc_id, gp.pos,
               gp.pos - row_number() OVER (PARTITION BY gp.doc_id
                                           ORDER BY gp.pos) AS grp
        FROM gp JOIN bg USING (g)
        WHERE NOT gp.is_bench
    )
    SELECT doc_id,
           MIN(pos) AS span_start_tok,
           MAX(pos) + {_CONTAM_N - 1} AS span_end_tok,
           MAX(pos) + {_CONTAM_N - 1} - MIN(pos) + 1 AS span_tokens
    FROM hits
    GROUP BY doc_id, grp
    """,
    doc="SPAN-level decontamination: instead of dropping every training doc "
    "that shares a 4-gram with the benchmark set (contamination_ngram_"
    "overlap's doc-level flag), compute the exact token spans to STRIP — "
    "consecutive matching gram positions merge into maximal spans via the "
    "gaps-and-islands trick (pos - row_number), and each span covers "
    "[first gram start, last gram start + N - 1]. Surgical removal keeps "
    "the rest of an otherwise-clean document — materially less data loss "
    "on long docs with one quoted benchmark item. Scale: same broadcast "
    "shape as the doc-level twin (bench gram set broadcasts, corpus grams "
    "probe map-side); the islands window partitions by doc_id over HIT "
    "rows only — a tiny fraction of the corpus.",
    tags=("text", "contamination", "span", "pipeline", "extension"),
)
def contamination_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        (
            h32(F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))) % 100 < 5
        ).alias("is_bench"),
    ).filter(F.size("toks") >= _CONTAM_N)
    gp = base.select(
        "doc_id",
        "is_bench",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (_CONTAM_N - 1))).alias("pos"),
    ).select(
        "doc_id",
        "is_bench",
        F.col("pos").cast("long").alias("pos"),
        F.md5(
            F.concat_ws(
                " ",
                *[F.element_at("toks", F.col("pos") + j) for j in range(_CONTAM_N)],
            )
        ).alias("g"),
    )
    bg = gp.filter(F.col("is_bench")).select("g").distinct()
    hits = (
        gp.filter(~F.col("is_bench"))
        .join(F.broadcast(bg), "g")
        .select("doc_id", "pos")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return islands.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start_tok"),
        (F.max("pos") + (_CONTAM_N - 1)).alias("span_end_tok"),
        (F.max("pos") + (_CONTAM_N - 1) - F.min("pos") + 1).alias("span_tokens"),
    ).drop("grp")


@register(
    "corpus_constraint_checks",
    oracle="""
    SELECT 'documents_doc_id_unique' AS check_name,
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
               SELECT COUNT(*) AS c FROM documents GROUP BY doc_id
           ) WHERE c > 1) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'documents_text_not_null',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE text IS NULL OR text = '') AS BIGINT)
    UNION ALL
    SELECT 'documents_n_chars_consistent',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE n_chars <> length(text)) AS BIGINT)
    UNION ALL
    SELECT 'orders_custkey_references_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orderkey_references_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_quantity_in_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
    ORDER BY check_name
    """,
    doc="Data-quality CONSTRAINT GATE — the dbt-test / expectations suite "
    "a scheduled corpus pipeline runs before promoting a snapshot: "
    "uniqueness (grouped count, map-side partials), not-null/derived-"
    "column consistency (narrow scan-aggregates), referential integrity "
    "(LEFT ANTI joins — the dimension side broadcasts, no row explosion "
    "on violations), and range checks. Each constraint reports its exact "
    "violation count, so the gate is also the diagnostic. All checks are "
    "independent single-pass aggregates unioned into one bounded report "
    "(7 rows however large the corpus); at 100 TB nothing here is worse "
    "than one scan per referenced table.",
    tags=("pipeline", "quality", "extension"),
)
def corpus_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def check(name, n):
        return n.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.first("v"), F.lit(0)).cast("long").alias("n_violations"),
        )

    dup_ids = (
        docs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.sum(F.col("c") - 1).alias("v"))
    )
    null_text = docs.filter(
        F.col("text").isNull() | (F.col("text") == "")
    ).agg(F.count(F.lit(1)).alias("v"))
    chars = docs.filter(F.col("n_chars") != F.length("text")).agg(
        F.count(F.lit(1)).alias("v")
    )
    orphan_orders = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    ).agg(F.count(F.lit(1)).alias("v"))
    orphan_lines = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    ).agg(F.count(F.lit(1)).alias("v"))
    qty = li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).agg(
        F.count(F.lit(1)).alias("v")
    )
    disc = li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).agg(
        F.count(F.lit(1)).alias("v")
    )
    report = (
        check("documents_doc_id_unique", dup_ids)
        .unionAll(check("documents_text_not_null", null_text))
        .unionAll(check("documents_n_chars_consistent", chars))
        .unionAll(check("orders_custkey_references_customer", orphan_orders))
        .unionAll(check("lineitem_orderkey_references_orders", orphan_lines))
        .unionAll(check("lineitem_quantity_in_range", qty))
        .unionAll(check("lineitem_discount_in_range", disc))
    )
    return report.orderBy("check_name")
