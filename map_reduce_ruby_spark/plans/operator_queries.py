"""Catalog entries for the custom operators: as-of join and the multimodal
column pipeline. Both are operators Spark lacks as built-ins, composed
Spark-first (union+window; mapInPandas) — see operators/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import (
    asof_join,
    attach_fake_media,
    decode_media,
    extract_features,
    salted_agg,
)
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table


@register(
    "asof_last_purchase",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        FROM events
    ),
    p AS (
        SELECT user_id, ts_us, event_id AS purchase_event_id, value AS purchase_value
        FROM e WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
           coalesce(p.purchase_event_id, -1) AS purchase_event_id,
           coalesce(p.purchase_value, 0.0) AS purchase_value
    FROM e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
    """,
    doc="As-of join (backward inclusive): attach each user's most recent "
    "purchase at-or-before every event. Spark side is the union+window "
    "composition (operators/asof.py — one shuffle on user_id, no range "
    "explosion); DuckDB side is its native ASOF JOIN, so two independent "
    "implementations must agree bit-for-bit. (user_id, ts) is unique in the "
    "right side, so the match is deterministic.",
    tags=("asof", "join", "custom-operator"),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts_us", "event_type", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts_us", "event_type"),
        purchases,
        on="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        suffix="",
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        F.coalesce("purchase_event_id", F.lit(-1)).alias("purchase_event_id"),
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
    )


@register(
    "multimodal_decode_stats",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               octet_length(encode(text)) AS payload_len,
               ('0x' || substr(md5(text), 1, 8))::UBIGINT AS h
        FROM documents
    ),
    decoded AS (
        SELECT media_type, payload_len,
               16 + h % 1024 AS width,
               16 + (h >> 10) % 1024 AS height,
               CASE WHEN media_type = 'image' THEN 1
                    ELSE 1 + (h >> 20) % 240 END AS n_frames
        FROM media
    )
    SELECT media_type,
           COUNT(*) AS n_items,
           CAST(SUM(payload_len) AS BIGINT) AS total_bytes,
           CAST(SUM(width) AS BIGINT) AS sum_width,
           CAST(SUM(height) AS BIGINT) AS sum_height,
           CAST(SUM(n_frames) AS BIGINT) AS sum_frames
    FROM decoded GROUP BY media_type
    """,
    doc="Multimodal pipeline end-to-end: attach binary payloads -> "
    "mapInPandas decode (fake codec: md5-derived dimensions; real codecs "
    "stub NotImplementedError behind the same interface) -> per-media_type "
    "stats. The oracle recomputes the decode arithmetic in SQL, so the "
    "Arrow-batched binary plumbing is value-checked, not just row-counted.",
    tags=("multimodal", "custom-operator"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_fake_media(docs))
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("payload_len").alias("total_bytes"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
        F.sum("n_frames").alias("sum_frames"),
    )


@register(
    "multimodal_features",
    oracle=None,  # byte-histogram features aren't SQL-expressible; pytest pins values
    doc="Feature extraction over binary payloads (mapInPandas, Arrow "
    "batches): L1-normalized 16-bin byte histogram per payload — the slot "
    "where a model forward pass goes. Returned as array<float> joined "
    "against doc metadata; value-pinned by tests/test_multimodal.py.",
    tags=("multimodal", "custom-operator"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_media(docs))
    return feats.select(
        "doc_id",
        "media_type",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4).alias("l1_mass"),
        F.size("feature").alias("dim"),
    )


@register(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
    """,
    doc="Skew-aware two-stage salted aggregation (operators/skew.py): "
    "event_type has only 5 values over all rows — exactly the hot-key shape "
    "that makes a naive groupBy a straggler at 100 TB. Stage 1 groups on "
    "(key, salt) across 16 buckets, stage 2 combines partials per key; the "
    "oracle is the plain single-stage GROUP BY, proving the decomposition "
    "is exact. Sum runs in integer cents so the salted re-association is "
    "bitwise identical.",
    tags=("skew", "aggregate", "custom-operator"),
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return salted_agg(
        ev,
        keys=["event_type"],
        partials={
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "value_cents": (F.sum("cents"), F.sum("value_cents")),
            "min_user": (F.min("user_id"), F.min("min_user")),
            "max_user": (F.max("user_id"), F.max("max_user")),
        },
        salt_buckets=16,
        salt_from="user_id",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               ('0x' || substr(md5(text), 1, 8))::UBIGINT AS h
        FROM documents
    ),
    decoded AS (
        SELECT doc_id, media_type,
               CASE WHEN media_type = 'image' THEN 1
                    ELSE 1 + (h >> 20) % 240 END AS n_frames
        FROM media
    )
    SELECT media_type,
           COUNT(*) AS n_sampled_frames,
           CAST(SUM(frame_idx) AS BIGINT) AS sum_frame_idx,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, media_type, unnest(range(0, n_frames::BIGINT, 10)) AS frame_idx
        FROM decoded
    )
    GROUP BY media_type
    """,
    doc="Frame sampling (every 10th frame) over decoded media: JVM-side "
    "sequence+explode multiplies rows scan-side, the slot where per-frame "
    "decode/embedding plugs in. Oracle re-derives the sampled index set in "
    "SQL, so the explode arithmetic is value-checked.",
    tags=("multimodal", "custom-operator"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(decode_media(attach_fake_media(docs)), every_k=10)
    return frames.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum("frame_idx").alias("sum_frame_idx"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@register(
    "knn_ivf",
    oracle=None,  # k-means build isn't reasonably SQL-expressible; pytest bounds recall
    doc="IVF (inverted-file) ANN (operators/ivf.py): deterministic k-means "
    "over the embedding corpus (16 cells, 2 Lloyd iterations, every step a "
    "DataFrame plan), then queries probe their 2 nearest cells and rank "
    "candidates by exact cosine. The FAISS IVF-flat layout re-expressed "
    "relationally: broadcast centroids, narrow assignment scan, candidate "
    "equi-join on cell id. tests/test_ivf.py bounds recall@5 vs brute force.",
    tags=("similarity", "ann", "ivf", "custom-operator"),
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import build_ivf_index, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    assignments, centroids = build_ivf_index(v, k=16, iterations=2)
    queries = v.filter(F.col("id") < 10).select(
        F.col("id").alias("qid"), F.col("e").alias("qe")
    )
    return ivf_search(assignments, centroids, queries, top_k=5, nprobe=2)


@register(
    "salted_join_nation_revenue",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    doc="Skew-safe salted join (operators/skew.py salted_join): the fact "
    "side carries a deterministic salt, the small side is replicated "
    "salt_buckets times, and the join key becomes (key, salt) — one hot key "
    "spreads over 8 reducers instead of one straggler task. AQE skew-split "
    "divides oversized PARTITIONS; salting divides WITHIN a single key, the "
    "case AQE cannot fix. The result is provably identical to the plain "
    "join — the oracle IS the plain join.",
    tags=("skew", "join", "custom-operator"),
)
def salted_join_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(
        li, supp.withColumnRenamed("s_suppkey", "l_suppkey"), ["l_suppkey"], 8
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
    )
