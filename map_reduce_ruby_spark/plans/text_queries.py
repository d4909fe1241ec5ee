"""Text-analysis operators over the documents table (training-data pipeline
components): token stats, quality scoring, language-ID heuristic, document
fingerprinting.

All scoring is pure column expressions (JVM-side, codegen'd — no Python in
the hot path); every rule is mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

# The redaction lexicon pattern: ONE Spark-side source of truth shared by
# text_redaction_stats and text_redact_documents (the oracle SQL keeps its
# own copy by design — it is the independent implementation).
_REDACT_PAT = r"\b(key|hash|value)\b"

# A tiny deterministic stopword lexicon per language for the lang-id
# heuristic. Real language ID would be an n-gram model behind mapInPandas;
# the heuristic keeps the operator fully SQL-checkable.
_STOPWORDS = ["the", "a", "data", "query", "join"]


def _tokens_spark(col):
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS n_unique,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
    doc="Per-document token counting: whitespace tokens, unique tokens, "
    "chars. Array expressions only — one narrow projection at scale.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           ROUND(CAST(n_unique AS DOUBLE) / n_tokens, 6) AS unique_ratio,
           CASE WHEN n_tokens >= 20 AND n_stop > 0 THEN 1 ELSE 0 END AS quality_ok
    FROM (
        SELECT doc_id,
               CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({_TOKENS_SQL})) AS BIGINT) AS n_unique,
               CAST(len(list_filter({_TOKENS_SQL},
                    w -> list_contains({_STOPWORDS!r}, w))) AS BIGINT) AS n_stop
        FROM documents
    ) WHERE n_tokens > 0
    """,
    doc="Quality scoring: stopword ratio, type-token ratio, min-length gate — "
    "the standard cheap filters in a pretraining data pipeline. Ratios are "
    "rounded to 6 decimals on both engines (single double division).",
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).cast("long").alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias("stopword_ratio"),
        F.round(F.col("n_unique").cast("double") / F.col("n_tokens"), 6).alias("unique_ratio"),
        F.when((F.col("n_tokens") >= 20) & (F.col("n_stop") > 0), 1).otherwise(0).alias("quality_ok"),
    )


@register(
    "text_lang_signal",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN list_contains(
                list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''),
                'the') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_the,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="Language-ID signal aggregation: per labeled lang, how many docs "
    "contain the English marker token — the skeleton of an n-gram lang-id "
    "scorer (full model would be a broadcast lexicon joined the same way).",
    tags=("text", "langid"),
)
def text_lang_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    return (
        docs.withColumn("has_the", F.array_contains(toks, "the").cast("int"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_the").cast("long").alias("n_with_the"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprinting: md5 over whitespace-normalized, lowercased "
    "text — the exact-dedup key. JVM md5, no Python.",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


@register(
    "text_regex_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
               AS n_unique_words
    FROM documents
    """,
    doc="BPE-ish regex tokenization: alphanumeric word tokens + single-char "
    "punctuation tokens (the pre-tokenizer split most BPE vocabularies "
    "assume), plus lowercased unique-word count. regexp_extract_all stays "
    "JVM-side; at scale this is a narrow scan-side projection feeding token "
    "budget accounting.",
    tags=("text", "tokenize"),
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+', 0)")
    punct = F.expr(r"regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)")
    uniq = F.array_distinct(F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_word_tokens"),
        F.size(punct).cast("long").alias("n_punct_tokens"),
        F.size(uniq).cast("long").alias("n_unique_words"),
    )


@register(
    "approx_distinct_users_daily",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS day_no,
           COUNT(DISTINCT user_id) AS exact_dau,
           TRUE AS hll_within_bounds
    FROM events GROUP BY 1
    """,
    doc="approx_count_distinct (HyperLogLog++) of daily active users — the "
    "sketch that replaces exact COUNT(DISTINCT) at 100 TB (mergeable, "
    "fixed-size state instead of a per-key hash set). HLL sketch values are "
    "engine-specific, so the checkable surface is (exact count, bounds "
    "flag): Spark emits its HLL estimate's |approx-exact|/exact <= 5% as a "
    "boolean next to the exact count (rel_sd=0.02, so 5% is 2.5 sigma); the "
    "oracle asserts the exact count and that the flag is TRUE. A sketch "
    "drifting out of bounds fails the hash gate. tests/test_approx.py "
    "additionally pins the raw estimate.",
    tags=("aggregate", "approx", "sketch"),
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day_no", F.expr("ts_us div 86400000000"))
        .groupBy("day_no")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_dau"),
            F.countDistinct("user_id").alias("exact_dau"),
        )
        .select(
            "day_no",
            "exact_dau",
            (
                F.abs(F.col("approx_dau") - F.col("exact_dau"))
                / F.col("exact_dau")
                <= 0.05
            ).alias("hll_within_bounds"),
        )
    )


# --- n-gram language ID ------------------------------------------------------
#
# Two-pass scorer: (1) per labeled lang, the top-20 char trigrams by frequency
# (ties -> trigram asc) form the lang profile; (2) every document scores
# against every profile by distinct-trigram overlap, predicting the argmax
# (ties -> lang asc). The profile is ~20 x |langs| rows — broadcast — so
# scoring is a map-side join however large the corpus is.

_TRIGRAMS_SQL = (
    "list_transform(range(1, length(lower(text)) - 1), i -> substr(lower(text), i, 3))"
)


def _trigrams_spark(col):
    t = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.length(t) - 2), lambda i: F.substring(t, i, 3)
    )


@register(
    "text_langid_ngram",
    oracle=f"""
    WITH tri AS (
        SELECT doc_id, lang, unnest({_TRIGRAMS_SQL}) AS g
        FROM documents WHERE length(text) >= 3
    ),
    profile AS (
        SELECT lang, g FROM (
            SELECT lang, g, row_number() OVER (
                PARTITION BY lang ORDER BY COUNT(*) DESC, g
            ) AS rn
            FROM tri GROUP BY lang, g
        ) WHERE rn <= 20
    ),
    doc_tri AS (SELECT DISTINCT doc_id, g FROM tri),
    scores AS (
        SELECT d.doc_id, p.lang AS cand_lang, COUNT(*) AS overlap
        FROM doc_tri d JOIN profile p ON d.g = p.g
        GROUP BY d.doc_id, p.lang
    ),
    pred AS (
        SELECT doc_id, cand_lang AS pred_lang FROM (
            SELECT doc_id, cand_lang, row_number() OVER (
                PARTITION BY doc_id ORDER BY overlap DESC, cand_lang
            ) AS rn
            FROM scores
        ) WHERE rn = 1
    )
    SELECT d.lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.lang
    """,
    doc="N-gram language ID, end to end: char-trigram profiles per labeled "
    "lang (top-20 by frequency, deterministic ties), then every document "
    "scores against every profile by distinct-trigram overlap and predicts "
    "the argmax. Reports per-lang accuracy. Scale: the profile is tiny and "
    "broadcast; scoring is one scan + a small groupBy — corpus never "
    "self-joins.",
    tags=("text", "langid"),
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # Materialize lower(text) BEFORE the per-index transform: referencing the
    # raw expression inside the lambda would re-lower the string per trigram.
    lowered = docs.filter(F.length("text") >= 3).select(
        "doc_id", "lang", F.lower("text").alias("lt")
    )
    tri_expr = F.transform(
        F.sequence(F.lit(1), F.length("lt") - 2), lambda i: F.substring(F.col("lt"), i, 3)
    )
    tri = lowered.select("doc_id", "lang", F.explode(tri_expr).alias("g"))

    # Pass 1: the profile is <= 20 x |langs| rows — an aggregate artifact like
    # IVF centroids. Collect it so pass 2 is ONE corpus scan joined against a
    # literal-backed broadcast frame (otherwise the trigram explode lineage is
    # recomputed for both branches of the self-referential plan).
    w_prof = W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("g"))
    profile_rows = (
        tri.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand_lang"), "g")
        .collect()
    )
    profile = spark.createDataFrame(
        [(r.cand_lang, r.g) for r in profile_rows], "cand_lang string, g string"
    )

    doc_tri = tri.select("doc_id", "g").distinct()
    scores = (
        doc_tri.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w_pred = W.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("cand_lang"))
    pred = (
        scores.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"))
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("pred_lang") == F.col("lang")).cast("int")).cast("long").alias("n_correct"),
        )
    )


@register(
    "text_rolling_fingerprint",
    oracle=f"""
    WITH win AS (
        SELECT doc_id,
               list_transform(range(1, len({_TOKENS_SQL}) - 6),
                   i -> {' || chr(32) || '.join(f'{_TOKENS_SQL}[i+{j}]' for j in range(8))}) AS windows
        FROM documents
        WHERE len({_TOKENS_SQL}) >= 8
    )
    SELECT doc_id,
           list_aggregate(list_transform(windows,
               w -> (('0x' || substr(md5(w), 1, 8))::UBIGINT)::BIGINT), 'min')
               AS fingerprint,
           CAST(len(windows) AS BIGINT) AS n_windows
    FROM win
    """,
    doc="Rolling-window document fingerprint (winnowing-style): hash every "
    "8-token window, keep the minimum — robust to edits outside the minimal "
    "window, the standard near-dup fingerprint for long documents. One "
    "narrow projection; no shuffle until fingerprints are grouped.",
    tags=("text", "fingerprint"),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.functions import h32

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 8)
    windows = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 8),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", i + j + 1) for j in range(8)]
        ),
    )
    hashed = base.select("doc_id", F.transform(windows, lambda w: h32(w)).alias("hs"))
    return hashed.select(
        "doc_id",
        F.array_min("hs").alias("fingerprint"),
        F.size("hs").cast("long").alias("n_windows"),
    )


@register(
    "text_redaction_stats",
    oracle=r"""
    WITH hits AS (
        SELECT lang,
               len(regexp_extract_all(text, '\b(key|hash|value)\b')) AS n_hits,
               regexp_replace(text, '\b(key|hash|value)\b', '<redacted>', 'g')
                   AS scrubbed
        FROM documents
    )
    SELECT lang,
           CAST(SUM(n_hits) AS BIGINT) AS total_redactions,
           CAST(COUNT(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS n_docs_affected,
           CAST(SUM(length(scrubbed)) AS BIGINT) AS scrubbed_chars
    FROM hits GROUP BY lang
    """,
    doc="Lexicon redaction (the PII-scrub pattern: same plumbing as "
    "email/phone/SSN patterns, with a deterministic denylist so the oracle "
    "can verify counts): word-boundary regexp_replace + occurrence counts "
    "per doc, rolled up per language. Both engines run the identical regex "
    "(\\b alternation — Java and RE2 agree). Scale: pure scan-side "
    "projection, one aggregation; the regex is the per-byte cost, which is "
    "exactly where a real pipeline spends it.",
    tags=("text", "redaction", "pipeline"),
)
def text_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = docs.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_REDACT_PAT), 0)).alias("n_hits"),
        F.length(F.regexp_replace("text", _REDACT_PAT, "<redacted>")).alias("scrubbed_len"),
    )
    return hits.groupBy("lang").agg(
        F.sum("n_hits").cast("long").alias("total_redactions"),
        F.count_if(F.col("n_hits") > 0).cast("long").alias("n_docs_affected"),
        F.sum("scrubbed_len").cast("long").alias("scrubbed_chars"),
    )


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
    base AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                   AS dup_word_frac,
               t
        FROM toks WHERE len(t) > 1
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS gram
        FROM base
    ),
    counts AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram),
    per AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_gram_frac
        FROM counts GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.dup_word_frac, p.n_grams, p.top_gram_frac,
           CASE WHEN p.top_gram_frac <= 0.05 AND b.dup_word_frac <= 0.55
                THEN 1 ELSE 0 END AS repetition_ok
    FROM base b JOIN per p ON b.doc_id = p.doc_id
    """,
    doc="Gopher/C4-style within-document repetition filter: duplicate-word "
    "fraction (1 - type/token ratio) and most-frequent-2-gram fraction, "
    "thresholded into a keep flag. 2-grams come from zip_with over adjacent "
    "token slices (JVM-side, no Python); the per-gram count and per-doc "
    "re-aggregation both shuffle on doc_id(+gram), so the filter scales "
    "per-document with no global state. Thresholds (0.05 / 0.55) straddle "
    "the fixture medians so both verdicts occur.",
    tags=("text", "quality", "pipeline"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", _tokens_spark(F.col("text")).alias("t"))
        .filter(F.size("t") > 1)
        .select(
            "doc_id",
            "t",
            F.size("t").cast("long").alias("n_tokens"),
            F.round(
                1.0 - F.size(F.array_distinct("t")).cast("double") / F.size("t"), 6
            ).alias("dup_word_frac"),
        )
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    per = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_gram_frac"),
        )
    )
    return base.drop("t").join(per, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_word_frac",
        "n_grams",
        "top_gram_frac",
        F.when(
            (F.col("top_gram_frac") <= 0.05) & (F.col("dup_word_frac") <= 0.55), 1
        )
        .otherwise(0)
        .alias("repetition_ok"),
    )


@register(
    "text_redact_documents",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\b(key|hash|value)\b'))
                AS BIGINT) AS n_redactions,
           md5(regexp_replace(text, '\b(key|hash|value)\b', '<redacted>', 'g'))
               AS scrubbed_md5
    FROM documents
    """,
    doc="The redaction TRANSFORM itself (text_redaction_stats covers the "
    "rollup): per document, the scrubbed text — emitted as its md5 so the "
    "gate checks every output byte without hashing megabyte rows — plus the "
    "per-doc hit count. This is the shape a privacy pass materializes (a "
    "new corpus generation of scrubbed text); both engines run the "
    "identical word-boundary regex (Java and RE2 agree on this class). "
    "Scale: narrow scan-side projection, no shuffle at all.",
    tags=("text", "redaction", "pipeline"),
)
def text_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_REDACT_PAT), 0))
        .cast("long")
        .alias("n_redactions"),
        F.md5(F.regexp_replace("text", _REDACT_PAT, "<redacted>")).alias("scrubbed_md5"),
    )
