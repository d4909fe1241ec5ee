"""Similarity search over the embeddings table (array<float> column).

- ``knn_bruteforce``: exact cosine top-k for a query set — the correctness
  baseline. Query vectors are a broadcast side; the scan side computes dot
  products with zip_with/aggregate (JVM codegen, no Python).
- ``knn_lsh``: the scale path — random-hyperplane LSH: bucket bit p is the
  sign of <e, w_p>, where hyperplane component w_p[i] = h32("p,i")/2^32 - 0.5
  is md5-derived and therefore bit-identical in Spark and the DuckDB oracle.
  Candidates are generated within buckets only.

At 100 TB brute force is O(|queries| x |corpus|) — valid only for small query
sets; the LSH variant shuffles on the bucket signature so candidate
generation never crosses buckets (the standard billion-vector layout; IVF
would swap the hyperplane bucketing for k-means cells).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.plans.memo import LruMemo
from map_reduce_ruby_spark.sources import load_table

_DIM = 64
_K = 5
_N_QUERIES = 10  # vec_id < 10 form the query set
_N_PLANES = 6


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


# Dot products are UNROLLED to fixed-length element_at chains rather than
# zip_with/aggregate lambdas: Catalyst evaluates higher-order-function lambdas
# interpreted per element (no codegen), which made the corpus-side signature
# scan the bottleneck at sf0.1 (25s -> ~2s after unrolling). The left-
# associated addition chain keeps the same sequential order as aggregate's
# fold and DuckDB's list_sum, so results stay bit-identical.
#
# The chains are built as SQL TEXT and parsed engine-side (F.expr), not as
# Python Column arithmetic: a 64-term Column chain makes ~130 py4j calls
# (one per operator node, ~3.5s of driver time per query build — measured);
# parsing the equivalent text costs milliseconds. Helpers therefore take
# column NAMES (optionally qualified, e.g. "a.e"), not Columns.


def _dot(a: str, b: str) -> Column:
    return F.expr(
        " + ".join(
            f"(element_at({a}, {i}) * element_at({b}, {i}))"
            for i in range(1, _DIM + 1)
        )
    )


def _norm(c: str) -> Column:
    return F.expr(
        "sqrt("
        + " + ".join(
            f"(element_at({c}, {i}) * element_at({c}, {i}))"
            for i in range(1, _DIM + 1)
        )
        + ")"
    )


@register(
    "knn_bruteforce",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                     i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4) AS cos_sim
        FROM v q JOIN v c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_K}
    """,
    doc="Exact cosine top-5 neighbors for query vectors (vec_id < 10): "
    "broadcast the query set, score the corpus scan-side, rank per query. "
    "Ties broken by neighbor_id; similarities rounded to 4 decimals before "
    "ranking so both engines rank identically.",
    tags=("similarity", "knn"),
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.functions import literal_struct_array

    emb = load_table(spark, sf_dir, "embeddings")
    # NB: the vectors deliberately stay in ARRAY form here. Flattening to 64
    # primitive columns (the dedup_semantic_ivf trick) under this query's
    # rank-window + filter makes Catalyst constraint propagation walk the
    # 128-alias expression web until the driver heap dies; semdedup escapes
    # that because its flattened side sits behind a cache() barrier and has
    # no window above the join. The array form's pair scoring is ~2x slower
    # per pair but this query scores only |queries| x corpus pairs.
    v = emb.select("vec_id", _as_double(F.col("embedding")).alias("e")).withColumn(
        "nrm", _norm("e")
    )
    # Bounded artifact: the 10 query vectors, replayed as a literal struct
    # array exploded scan-side — Scan -> Generate, no join operator (see
    # functions/replay.py; the former broadcast non-equi join planned a
    # BroadcastNestedLoopJoin, indistinguishable from a quadratic join in
    # the catalog plan audit).
    qrows = (
        v.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rn long"
        )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cnrm")
    )
    scored = (
        c.select(
            "neighbor_id", "ce", "cnrm",
            F.explode(literal_struct_array(qrows)).alias("q"),
        )
        .select("neighbor_id", "ce", "cnrm", "q.*")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# --- random-hyperplane LSH ---------------------------------------------------
#
# w_p[i] = h32("{p},{i}") / 2^32 - 0.5 — md5-derived so both engines could
# regenerate it, but the planes are CONSTANTS: they are materialized here in
# Python once and embedded as literal arrays, so per-row work is just the dot
# product (the inline-generation alternative costs _DIM * _N_PLANES md5 calls
# per row — 384/row — for identical results). h/2^32 and -0.5 are exact in
# binary, so the Python-computed literals match engine arithmetic bit-for-bit.


def _h32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


_PLANES: list[list[float]] = [
    [_h32_py(f"{p},{i}") / 4294967296.0 - 0.5 for i in range(_DIM)]
    for p in range(_N_PLANES)
]


def _plane_dot_text(e: str, p: int) -> str:
    """<e, w_p> against the literal hyperplane as SQL text (element * literal
    order preserved; repr(float) round-trips exactly)."""
    return " + ".join(
        f"(element_at({e}, {i + 1}) * {w!r}D)" for i, w in enumerate(_PLANES[p])
    )


def _bucket_spark(e: str) -> Column:
    return F.expr(
        "CAST("
        + " + ".join(
            f"(CASE WHEN ({_plane_dot_text(e, p)}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(_N_PLANES)
        )
        + " AS BIGINT)"
    )


def _lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, e, nrm, bucket) with the signature computation CACHED: the
    LSH queries consume the signature on BOTH sides of a self-join, and
    without materialization Spark recomputes the 64-term norm and 6 plane
    dot products per side (measured 5x slower at sf0.1). In production this
    is the signature/band INDEX — materialized to storage once and reused
    across queries and ingests; cache() (memory-and-disk) is its in-session
    stand-in. Lifetime is the session (bounded by corpus signature size, a
    few columns per vector); ``spark.catalog.clearCache()`` releases it."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double(F.col("embedding")).alias("e"))
    return v.select(
        "vec_id",
        "e",
        _norm("e").alias("nrm"),
        _bucket_spark("e").alias("bucket"),
    ).cache()


def _plane_dot_sql(p: int) -> str:
    w = "[" + ", ".join(repr(x) for x in _PLANES[p]) + "]"
    return f"list_sum(list_transform(range(1, {_DIM + 1}), i -> e[i] * ({w}::DOUBLE[])[i]))"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_plane_dot_sql(p)} > 0 THEN {1 << p} ELSE 0 END)" for p in range(_N_PLANES)
)


@register(
    "knn_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    sig AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
               CAST({_BUCKET_SQL} AS BIGINT) AS bucket
        FROM v
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
               ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                     i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4) AS cos_sim
        FROM sig q JOIN sig c
          ON q.bucket = c.bucket AND q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, bucket, cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= {_K}
    """,
    doc="Approximate top-5 via random-hyperplane LSH (6 md5-derived planes -> "
    "64 buckets): candidates restricted to the query's bucket, then exact "
    "cosine rank within candidates. The bucket join is the only shuffle; "
    "at billions of vectors multiple hash tables (plane sets) trade recall "
    "for cost without changing the plan shape.",
    tags=("similarity", "lsh", "ann"),
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _lsh_signatures(spark, sf_dir)
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("bucket"),
    )
    c = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cnrm"),
        F.col("bucket").alias("cbucket"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("cbucket") == F.col("bucket")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "bucket",
        F.round(_dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")), 4).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rn")
    )


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label,
           pos AS dim_idx,
           CAST(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
               / COUNT(*) AS centroid
    FROM (
        SELECT label,
               unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    )
    GROUP BY label, pos
    """,
    doc="Per-label embedding centroids in LONG layout: posexplode the vector "
    "to (label, dim, value) rows, aggregate decimal-exact means per (label, "
    "dim). The long layout is the scale-safe shape for vector reductions — "
    "one uniform shuffle on (label, dim) with map-side partials, no "
    "per-group vector state, and it re-assembles to dense centroids with a "
    "bounded pivot (n_labels x dim rows). The k-means-style building block "
    "for the IVF index's centroid refresh (operators/ivf.py).",
    tags=("similarity", "embedding", "aggregate"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("dim_idx"),
            F.col("val").cast("double").alias("val"),
        )
        .groupBy("label", "dim_idx")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid")
        )
    )


_KNN_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                     i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4) AS cos_sim
        FROM v q JOIN v c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_K}
    """


@register(
    "knn_pandas_udf",
    oracle=_KNN_ORACLE,
    doc="The same exact cosine top-5 as knn_bruteforce, executed as an "
    "Arrow-batched mapInPandas stage: the (tiny) query set is collected to a "
    "numpy matrix once and closed over; each corpus Arrow batch scores ALL "
    "queries with one float64 matmul (BLAS), then JVM windows rank per "
    "query. This is the vectorized-Python scale path for similarity math "
    "too irregular for codegen'd expressions — per-batch matrix ops, never "
    "per-row Python. Must hash-match the pure-JVM twin's oracle exactly.",
    tags=("similarity", "knn", "pandas-udf"),
)
def knn_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double(F.col("embedding")).alias("e"))
    qrows = v.filter(F.col("vec_id") < _N_QUERIES).orderBy("vec_id").collect()
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.e for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            C = np.array(pdf["e"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            sims = (C / np.linalg.norm(C, axis=1, keepdims=True)) @ Qn.T
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_c),
                    "neighbor_id": np.tile(ids, n_q),
                    "cos_sim": np.round(sims.T.ravel(), 4),
                }
            )

    scored = v.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _K)
    )


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    sig AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
               CAST({_BUCKET_SQL} AS BIGINT) AS bucket
        FROM v
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                 i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cos_sim
    FROM sig a JOIN sig b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
              i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) >= 0.35
    """,
    doc="Embedding near-dup at scale: candidate pairs come from the "
    "random-hyperplane LSH bucket (the knn_lsh signature — one shuffle on "
    "the bucket id), then exact cosine >= 0.35 within candidates (the synthetic embeddings are near-orthogonal across labels, so the threshold sits at the fixture's own near-dup knee). This is "
    "the scale path for dedup_embedding_cosine's blocked brute force: at "
    "billions of vectors the bucket join's fan-in is corpus/2^planes per "
    "bucket, and recall is tuned by adding plane sets (hash tables), not by "
    "widening the join. Same rounding rule (4dp before thresholding) so "
    "both engines threshold identically.",
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _lsh_signatures(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    cos = F.round(
        _dot("a.e", "b.e") / (F.col("a.nrm") * F.col("b.nrm")), 4
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )


# --- SemDeDup (semantic dedup inside k-means cells) -------------------------

# operator_queries loads before this module in catalog.all_entries(); the
# import only pulls the shared k-means CTE text, no registration cycle.
from map_reduce_ruby_spark.plans.operator_queries import IVF_AF_CTES  # noqa: E402

_SEM_TAU = 0.35  # same fixture knee as dedup_embedding_lsh


@register(
    "dedup_semantic_ivf",
    oracle=f"""
    WITH {IVF_AF_CTES},
    sig AS (
        SELECT id, e, CAST(cell AS BIGINT) AS cell,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
        FROM af
    ),
    p AS (
        SELECT a.cell AS cell, b.id AS drop_vec_id, a.id AS rep_id,
               ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                     i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cos_sim
        FROM sig a JOIN sig b ON a.cell = b.cell AND a.id < b.id
    )
    SELECT cell, drop_vec_id,
           COUNT(*) AS n_near_dups,
           MAX(cos_sim) AS max_cos,
           MIN(rep_id) AS rep_vec_id
    FROM p WHERE cos_sim >= {_SEM_TAU}
    GROUP BY cell, drop_vec_id
    """,
    doc="SemDeDup (Abbas et al. 2023): k-means-cluster the embedding corpus "
    "(the knn_ivf index build, operators/ivf.py — deterministic strided "
    "seeds + 2 Lloyd iterations), then mark near-duplicates by exact cosine "
    ">= 0.35 WITHIN cells only; each dropped vector reports its duplicate "
    "count, max similarity, and lowest-id representative. Pairwise cost is "
    "sum(cell^2), never corpus^2 — the property that makes semantic dedup "
    "runnable at 100 TB. The oracle rebuilds the identical k-means in SQL "
    "(shared CTE chain with knn_ivf), so the cluster assignment feeding the "
    "dedup decision is value-checked, not assumed.",
    tags=("dedup", "embedding", "semantic", "custom-operator"),
)
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.plans.operator_queries import ivf_index_for

    index = ivf_index_for(spark, sf_dir)
    if index is None:
        return spark.createDataFrame(
            [], "cell long, drop_vec_id long, n_near_dups long, max_cos double, rep_vec_id long"
        )
    assignments, _centroids = index
    # Flatten the vector to 64 primitive double columns before the self-join:
    # with the array form, Catalyst pushes the cosine threshold into the join
    # condition, and the element_at chain inside that condition blows past
    # the JIT method budget — the stage runs interpreted (measured 6.2s for
    # the pair stage at sf0.1; 0.8s flattened). Fixed-width primitive rows
    # also make the exchanged rows smaller. cache(): the index side of a
    # self-join is read by both sides.
    sig = assignments.select(
        F.col("cell").cast("long").alias("cell"),
        "id",
        _norm("e").alias("nrm"),
        *[F.expr(f"element_at(e, {i})").alias(f"x{i}") for i in range(1, _DIM + 1)],
    ).cache()
    a, b = sig.alias("a"), sig.alias("b")
    dot = F.expr(" + ".join(f"(a.x{i} * b.x{i})" for i in range(1, _DIM + 1)))
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.cell").alias("cell"),
            F.col("b.id").alias("drop_vec_id"),
            F.col("a.id").alias("rep_id"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _SEM_TAU)
    )
    return pairs.groupBy("cell", "drop_vec_id").agg(
        F.count(F.lit(1)).alias("n_near_dups"),
        F.max("cos_sim").alias("max_cos"),
        F.min("rep_id").alias("rep_vec_id"),
    )




# --- scalar-quantized (int8) ANN --------------------------------------------
#
# The memory-side of the FAISS IVF story: per-dimension uniform 8-bit
# quantization cuts vector storage 8x (64 doubles -> 64 bytes), at the cost
# of scoring against RECONSTRUCTED vectors. Queries stay exact; the corpus is
# quantized. Output is exact-query x reconstructed-corpus cosine top-k — the
# standard SQ8 retrieval layout.

_SQ_LEVELS = 255


# Session-scoped memo of the SQ8 quantizer (bounds collect + reconstructed
# corpus) — same rationale and staleness rule as the IVF/PQ index memos in
# plans/operator_queries.py.
_SQ8_MEMO = LruMemo(capacity=8, unpersist=lambda val: val[1].unpersist())


def _sq8_recon_for(spark: SparkSession, sf_dir: str):
    """(v flattened, recon cached) for the corpus, or None when empty."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SQ8_MEMO:
        return _SQ8_MEMO.get(key)
    emb = load_table(spark, sf_dir, "embeddings")
    if emb.isEmpty():
        return None
    v = emb.select(
        "vec_id",
        *[
            F.expr(f"CAST(element_at(embedding, {i}) AS DOUBLE)").alias(f"x{i}")
            for i in range(1, _DIM + 1)
        ],
    )
    # Per-dimension bounds: one aggregate row (128 doubles) — bounded driver
    # artifact, the quantizer's training step.
    row = v.agg(
        *[F.min(f"x{i}").alias(f"mn{i}") for i in range(1, _DIM + 1)],
        *[F.max(f"x{i}").alias(f"mx{i}") for i in range(1, _DIM + 1)],
    ).collect()[0]
    mn = [row[f"mn{i}"] for i in range(1, _DIM + 1)]
    sc = [
        1.0 if row[f"mx{i}"] == row[f"mn{i}"] else (row[f"mx{i}"] - row[f"mn{i}"]) / _SQ_LEVELS
        for i in range(1, _DIM + 1)
    ]
    # Reconstructed corpus, flattened + cached (the barrier that keeps the
    # scoring join compiled and constraint propagation away — see
    # dedup_semantic_ivf / knn_bruteforce notes).
    recon = v.select(
        F.col("vec_id").alias("neighbor_id"),
        *[
            # literal D suffix: bare decimals parse as DECIMAL in Spark SQL;
            # repr(float) round-trips the collected double exactly (see the
            # _PLANES note above).
            F.expr(
                f"{mn[i-1]!r}D + round((x{i} - {mn[i-1]!r}D) / {sc[i-1]!r}D) * {sc[i-1]!r}D"
            ).alias(f"r{i}")
            for i in range(1, _DIM + 1)
        ],
    )
    recon = recon.withColumn(
        "rnrm",
        F.expr("sqrt(" + " + ".join(f"(r{i} * r{i})" for i in range(1, _DIM + 1)) + ")"),
    ).cache()
    return _SQ8_MEMO.get_or_build(key, lambda: (v, recon))



@register(
    "knn_sq8",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    b AS (
        SELECT pos, MIN(val) AS mn,
               CASE WHEN MAX(val) = MIN(val) THEN 1.0
                    ELSE (MAX(val) - MIN(val)) / {_SQ_LEVELS} END AS sc
        FROM (SELECT unnest(e) AS val, generate_subscripts(e, 1) AS pos FROM v)
        GROUP BY pos
    ),
    bl AS (
        SELECT list(mn ORDER BY pos) AS mns, list(sc ORDER BY pos) AS scs
        FROM b
    ),
    r AS (
        SELECT vec_id,
               list_transform(range(1, {_DIM + 1}),
                   i -> mns[i] + ROUND((e[i] - mns[i]) / scs[i]) * scs[i]) AS re
        FROM v, bl
    ),
    rn AS (
        SELECT vec_id, re,
               sqrt(list_sum(list_transform(re, x -> x * x))) AS rnrm
        FROM r
    ),
    q AS (
        SELECT vec_id AS query_id, e AS qe,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS qnrm
        FROM v WHERE vec_id < {_N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_sum(list_transform(range(1, {_DIM + 1}),
                     i -> q.qe[i] * c.re[i])) / (q.qnrm * c.rnrm), 4) AS cos_sq
        FROM q JOIN rn c ON c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sq, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sq DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_K}
    """,
    doc="Scalar-quantized (SQ8) ANN: per-dimension uniform 8-bit codes "
    "(bounds from one corpus-wide min/max aggregate — a 64x2-value driver "
    "artifact, same bounded-collect rule as the IVF centroids), scored as "
    "exact query x reconstructed corpus cosine. The 8x memory cut is what "
    "lets a 100 TB embedding corpus fit hot storage; quantization error "
    "shows up as rank differences vs knn_bruteforce, which "
    "tests/test_ivf.py-style recall checks bound. Flat columns + cache "
    "barrier keep the scoring join JIT-compiled (see dedup_semantic_ivf).",
    tags=("similarity", "ann", "quantization", "custom-operator"),
)
def knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    built = _sq8_recon_for(spark, sf_dir)
    if built is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sq double, rn long"
        )
    from map_reduce_ruby_spark.functions import literal_struct_array

    v, recon = built
    # Bounded artifact: 10 query rows (flattened dims + norm), replayed as
    # a literal struct array exploded over the reconstructed corpus — no
    # join operator (see functions/replay.py).
    qrows = v.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"x{i}").alias(f"qx{i}") for i in range(1, _DIM + 1)],
    ).withColumn(
        "qnrm",
        F.expr("sqrt(" + " + ".join(f"(qx{i} * qx{i})" for i in range(1, _DIM + 1)) + ")"),
    ).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sq double, rn long"
        )
    dot = F.expr(" + ".join(f"(qx{i} * r{i})" for i in range(1, _DIM + 1)))
    scored = (
        recon.select("*", F.explode(literal_struct_array(qrows)).alias("q"))
        .select("*", "q.*")
        .drop("q")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qnrm") * F.col("rnrm")), 4).alias("cos_sq"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sq"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "cos_sq", "rn")
    )


# --- Hybrid retrieval: dense + lexical arms fused by reciprocal-rank fusion.
# The production retrieval-stack shape the catalog's two arms compose into:
# BM25/lexical and ANN/dense each miss what the other catches, and RRF is
# the standard score-free fusion (Cormack et al.) — rank reciprocals need no
# cross-arm score calibration. Determinism rules: the dense arm rounds
# cosine to 4dp before ranking (the knn_bruteforce rule); the lexical arm's
# Jaccard is ONE division of exact integers (no float-sum pairing hazard at
# all); RRF adds two reciprocals of exact integer ranks — bit-identical on
# both engines, so ranking on the unrounded fusion score is safe to gate.
_HY_NQ = 8  # doc_id/vec_id < 8 form the query set (bounded artifact)
_HY_K = 20  # per-arm depth fed into fusion
_HY_C = 60  # the standard RRF constant
_HY_TOPK = 10

# Token expressions duplicated from plans/text_queries (module-level import
# would work — text_queries has no similarity import — but the two-line
# duplication keeps this module's oracle fragments self-contained).
_HY_TOKS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"


@register(
    "docs_hybrid_rrf",
    oracle=f"""
    WITH tset AS (
        SELECT DISTINCT doc_id, term
        FROM (SELECT doc_id, unnest({_HY_TOKS_SQL}) AS term FROM documents)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM tset GROUP BY doc_id),
    inter AS (
        SELECT q.doc_id AS qid, c.doc_id AS cid, COUNT(*) AS inter
        FROM tset q JOIN tset c ON q.term = c.term
        WHERE q.doc_id < {_HY_NQ} AND c.doc_id <> q.doc_id
        GROUP BY q.doc_id, c.doc_id
    ),
    lex AS (
        SELECT qid, cid,
               row_number() OVER (
                   PARTITION BY qid
                   ORDER BY CAST(i.inter AS DOUBLE)
                            / (qs.n + cs.n - i.inter) DESC, cid
               ) AS lex_rn
        FROM inter i
        JOIN sz qs ON qs.doc_id = i.qid
        JOIN sz cs ON cs.doc_id = i.cid
    ),
    ltop AS (SELECT * FROM lex WHERE lex_rn <= {_HY_K}),
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    dense AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_sum(list_transform(range(1, 65),
                            i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4)
                            DESC, c.vec_id
               ) AS dense_rn
        FROM v q JOIN v c ON q.vec_id < {_HY_NQ} AND c.vec_id <> q.vec_id
    ),
    dtop AS (SELECT * FROM dense WHERE dense_rn <= {_HY_K}),
    fused AS (
        SELECT COALESCE(d.qid, l.qid) AS query_id,
               COALESCE(d.cid, l.cid) AS doc_id,
               COALESCE(CAST(1 AS DOUBLE) / ({_HY_C} + d.dense_rn), 0)
               + COALESCE(CAST(1 AS DOUBLE) / ({_HY_C} + l.lex_rn), 0) AS rrf,
               COALESCE(d.dense_rn, -1) AS dense_rn,
               COALESCE(l.lex_rn, -1) AS lex_rn
        FROM dtop d FULL JOIN ltop l ON d.qid = l.qid AND d.cid = l.cid
    )
    SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf,
           CAST(fused_rank AS BIGINT) AS fused_rank,
           CAST(dense_rn AS BIGINT) AS dense_rn,
           CAST(lex_rn AS BIGINT) AS lex_rn
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS fused_rank
          FROM fused)
    WHERE fused_rank <= {_HY_TOPK}
    """,
    doc="Hybrid retrieval with reciprocal-rank fusion: for each of "
    f"{_HY_NQ} query documents, a DENSE arm (exact cosine over the aligned "
    "embedding, 4dp-rounded before ranking — the knn_bruteforce rule) and a "
    f"LEXICAL arm (exact Jaccard over distinct token sets — one integer "
    "division, no float-sum hazard) each rank their top-20 candidates; "
    f"RRF fuses them as sum(1/({_HY_C}+rank)) over a full outer join of the "
    "two rank lists (absent arm contributes 0, sentinel rank -1) and keeps "
    "the top-10 per query. Scale: the query set is a bounded broadcast "
    "artifact; the lexical arm is a posting-list equi-join (O(corpus "
    "tokens), the inverted-index shape text_bm25_search documents) whose "
    "rank<=k filter plans as WindowGroupLimit (no full per-query sort); "
    "the dense arm is the scan-side literal replay of knn_bruteforce (at "
    "corpus scale you'd swap in the knn_ivf_persisted index — same "
    "(qid, cid, rank) contract); fusion joins two <=|Q|*k row sides. "
    "RRF reciprocals divide exact integers, so ranking on the unrounded "
    "fusion score is engine-deterministic.",
    tags=("similarity", "retrieval", "hybrid", "extension"),
)
def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.functions import literal_struct_array

    out_schema = (
        "query_id long, doc_id long, rrf double, fused_rank long, "
        "dense_rn long, lex_rn long"
    )
    # Dense arm: identical construction to knn_bruteforce (array form, 4dp
    # rounding, neighbor-id tie-break), depth _HY_K, query set vec_id < 8.
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double(F.col("embedding")).alias("e")).withColumn(
        "nrm", _norm("e")
    )
    qrows = (
        v.filter(F.col("vec_id") < _HY_NQ)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        .collect()
    )
    if not qrows:
        return spark.createDataFrame([], out_schema)
    c = v.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"),
                 F.col("nrm").alias("cnrm"))
    dscored = (
        c.select("cid", "ce", "cnrm", F.explode(literal_struct_array(qrows)).alias("q"))
        .select("cid", "ce", "cnrm", "q.*")
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid", "cid",
            F.round(_dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")), 4).alias("cos"),
        )
    )
    dw = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    dtop = (
        dscored.withColumn("dense_rn", F.row_number().over(dw).cast("long"))
        .filter(F.col("dense_rn") <= _HY_K)
        .select("qid", "cid", "dense_rn")
    )

    # Lexical arm: distinct token sets -> posting-list equi-join on term
    # (query side broadcast) -> exact integer Jaccard -> per-query rank.
    docs = load_table(spark, sf_dir, "documents")
    tset = (
        docs.select("doc_id", F.explode(_hy_tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    sz = tset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    qset = tset.filter(F.col("doc_id") < _HY_NQ).withColumnRenamed("doc_id", "qid")
    inter = (
        F.broadcast(qset)
        .join(tset.withColumnRenamed("doc_id", "cid"), "term")
        .filter(F.col("cid") != F.col("qid"))
        .groupBy("qid", "cid")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(F.broadcast(sz.withColumnRenamed("doc_id", "qid")
                               .withColumnRenamed("n", "qn")), "qid")
        .join(sz.withColumnRenamed("doc_id", "cid").withColumnRenamed("n", "cn"), "cid")
        .select(
            "qid", "cid",
            (F.col("inter").cast("double")
             / (F.col("qn") + F.col("cn") - F.col("inter"))).alias("jac"),
        )
    )
    lw = W.partitionBy("qid").orderBy(F.desc("jac"), F.asc("cid"))
    ltop = (
        jac.withColumn("lex_rn", F.row_number().over(lw).cast("long"))
        .filter(F.col("lex_rn") <= _HY_K)
        .select("qid", "cid", "lex_rn")
    )

    # RRF fusion: full outer on (qid, cid); reciprocals of exact integer
    # ranks are bit-identical doubles, so the fused ordering needs no
    # pre-round. Sentinel -1 for the absent arm (catalog no-NULL rule).
    fused = (
        dtop.join(ltop, ["qid", "cid"], "full_outer")
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("doc_id"),
            (
                F.coalesce(F.lit(1.0) / (F.lit(_HY_C) + F.col("dense_rn")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(_HY_C) + F.col("lex_rn")), F.lit(0.0))
            ).alias("rrf"),
            F.coalesce(F.col("dense_rn"), F.lit(-1)).cast("long").alias("dense_rn"),
            F.coalesce(F.col("lex_rn"), F.lit(-1)).cast("long").alias("lex_rn"),
        )
    )
    fw = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(fw).cast("long"))
        .filter(F.col("fused_rank") <= _HY_TOPK)
        .select("query_id", "doc_id", F.round("rrf", 6).alias("rrf"),
                "fused_rank", "dense_rn", "lex_rn")
    )


def _hy_tokens(col) -> Column:
    """Spark twin of ``_HY_TOKS_SQL`` (the plans/text_queries tokenizer)."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")
