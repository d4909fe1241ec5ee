"""Deduplication operators over documents — the core of a pretraining-data
pipeline: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Every variant is expressed with built-in column functions (no Python UDFs in
the hot path) and is deterministic: all hashing is the portable 32-bit
md5-derived h32 (functions/hashes.py), so the DuckDB oracle reproduces the
exact candidate sets and signatures.

Scale design notes:
- Exact dedup: hash-groupBy on the fingerprint — one shuffle keyed by a
  uniform 128-bit hash, no skew by construction.
- MinHash-LSH: signatures are computed scan-side (narrow), the shuffle is on
  (band_idx, band_hash) buckets; pair generation is a self-join *within
  buckets only* — the classic way to avoid the O(n²) cross join at 100 TB.
- SimHash: 32-bit signature scan-side; grouping on the signature finds
  hamming-0 families; banded prefixes would extend to hamming<=k.
- N-gram Jaccard: shingle explode -> equi-join on shingle -> per-pair
  intersection counts; a shingle frequency cap (stopword shingles) would
  bound the join fan-out at scale (documented, not needed at these SFs).
- Embedding cosine: blocked brute force here; the ANN path is
  similarity_queries.py's LSH variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import h32, h32_sql, h60, h60_sql
from map_reduce_ruby_spark.materialize import truncate
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

# --- shared shingling spec (word 3-grams over whitespace tokens) ------------

_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"


def _tokens(col):
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def _shingles(tok_col):
    """Distinct word-3-gram shingles as strings ('w1 w2 w3')."""
    n = F.size(tok_col)
    idx = F.sequence(F.lit(0), n - 3)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(tok_col, i + 1),
            F.element_at(tok_col, i + 2),
            F.element_at(tok_col, i + 3),
        ),
    )
    return F.array_distinct(sh)


# DuckDB twin (1-based list indexing; range(a, b) is end-exclusive like
# F.sequence is end-inclusive — offsets adjusted accordingly). Defined over
# a PRE-PROJECTED ``toks`` column, never inline over the tokenization
# expression: DuckDB evaluates a lambda body per element, so an inlined
# tokenization would re-split the document 3x per shingle — O(shingles x
# tokens) regex work per doc, the exact oracle-side twin of the engine's
# lambda-CSE hazard. Call sites project
# ``(SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)`` first.
_DOC_TOKS_SQL = f"(SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)"
_SHINGLES_SQL = """
    list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
"""

# --- MinHash spec ------------------------------------------------------------
#
# Signature family: ONE md5-derived base hash per shingle, then affine
# permutations h_i(x) = (a_i * x + b_i) mod p over p = 2^31 - 1 (the classic
# universal-hash MinHash construction — 1 md5 per shingle instead of
# _N_HASHES, ~10x less hashing at 100 TB). Constants a_i/b_i are themselves
# md5-derived so both engines can regenerate them; a_i*x stays < 2^62, no
# int64 overflow on either engine.

_N_HASHES = 12  # signature length
_N_BANDS = 4  # 4 bands x 3 rows
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
_P = (1 << 31) - 1
_SHINGLE_DF_CAP = 100  # drop shingles present in more docs (stop-shingles)


def _h32_const(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


_A = [1 + _h32_const(f"minhash-a-{i}") % (_P - 1) for i in range(_N_HASHES)]
_B = [_h32_const(f"minhash-b-{i}") % _P for i in range(_N_HASHES)]


@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM fp GROUP BY fingerprint HAVING COUNT(*) >= 1
    """,
    doc="Exact dedup: hash-groupBy on the normalized-text fingerprint, keep "
    "the lowest doc_id per group. Uniform 128-bit keys -> skew-free shuffle.",
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _base_hashes_spark(shingle_col):
    """One md5-derived base hash per shingle, reduced mod p (computed once,
    then permuted _N_HASHES ways arithmetically)."""
    return F.transform(shingle_col, lambda s: h32(s) % _P)


def _minhash_sig_spark(hashes_col):
    """Array of _N_HASHES minhash values over a precomputed base-hash array.

    NB: constants must be captured via a real closure — a two-parameter
    ``lambda x, i=i:`` would be interpreted by PySpark's ``transform`` as an
    (element, index) lambda and the constant would silently become the array
    index Column."""

    def min_hash(i: int):
        a, b = _A[i], _B[i]
        return F.array_min(F.transform(hashes_col, lambda x: (a * x + b) % _P))

    return F.array(*[min_hash(i) for i in range(_N_HASHES)])


def _base_hashes_sql(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {h32_sql('s')} % {_P})"


def _minhash_sig_sql(hashes_expr: str) -> list[str]:
    return [
        f"list_aggregate(list_transform({hashes_expr}, x -> ({_A[i]} * x + {_B[i]}) % {_P}), 'min')"
        for i in range(_N_HASHES)
    ]


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH BAND INDEX, cached.

    Stage the pipeline as materialized columns (tokens -> shingles -> base
    hashes -> signature -> band hashes) so each step is computed once per
    row, not once per hash-family member. The result is cached because
    every consumer (the full-pairs self-join, the cluster query, and the
    incremental batch-vs-corpus pass) reads it on BOTH sides of a join —
    uncached, Spark recomputes the whole shingle/hash pipeline per side.
    In production this is the persisted band index the ingest maintains
    (operators/dedup_index.py is that form — same schema, bucketed storage);
    cache() (memory-and-disk) is its in-session stand-in. Lifetime is the
    session (a few small columns per document);
    ``spark.catalog.clearCache()`` releases it."""
    return _bands_for_docs(load_table(spark, sf_dir, "documents")).cache()


def _bands_for_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) for an arbitrary (doc_id, text) frame —
    the uncached band computation shared by the in-query index above and the
    persisted index writer/prober in operators/dedup_index.py."""
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 3
    )
    hashed = toked.select(
        "doc_id", _base_hashes_spark(_shingles(F.col("toks"))).alias("hs")
    )
    sig = hashed.select("doc_id", _minhash_sig_spark(F.col("hs")).alias("sig"))
    return (
        sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.md5(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.element_at("sig", b * _ROWS_PER_BAND + r + 1).cast("string")
                                        for r in range(_ROWS_PER_BAND)
                                    ],
                                )
                            ).alias("band_hash"),
                        )
                        for b in range(_N_BANDS)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "band.band_idx", "band.band_hash")
    )


# Full candidate-pair SQL, shared by the pair query and the cluster query.
_LSH_PAIRS_SQL = f"""
    WITH hs AS (
        SELECT doc_id, {_base_hashes_sql(_SHINGLES_SQL)} AS hashes
        FROM {_DOC_TOKS_SQL}
        WHERE len(toks) >= 3
    ),
    sig AS (
        SELECT doc_id, {', '.join(f'{e} AS mh{i}' for i, e in enumerate(_minhash_sig_sql('hashes')))}
        FROM hs
    ),
    bands AS (
        {' UNION ALL '.join(
            f"SELECT doc_id, {b} AS band_idx, "
            f"md5({' || chr(44) || '.join(f'mh{b * _ROWS_PER_BAND + r}::VARCHAR' for r in range(_ROWS_PER_BAND))}) AS band_hash "
            f"FROM sig"
            for b in range(_N_BANDS)
        )}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band_idx) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


@register(
    "dedup_minhash_lsh",
    oracle=_LSH_PAIRS_SQL,
    doc="MinHash + LSH near-dup candidates: 12 md5-seeded minhashes, 4 bands "
    "x 3 rows; documents sharing any band bucket become a candidate pair. "
    "The self-join runs on band buckets (shuffle key = (band_idx, band_hash)) "
    "so cost is sum of bucket sizes squared, never |docs|² — the standard "
    "100 TB-safe LSH layout.",
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct("a.band_idx").alias("n_shared_bands"))
    )


# Per-doc SimHash signature, width-parameterized — 16-bit for the hamming-0
# family query, 60-bit for the adaptively-banded hamming<=2 pair query.
# Widths <= 32 draw per-token bits from h32 (8 md5 hex chars); wider
# signatures draw from h60 (15 hex chars, the most that stays inside a
# signed 64-bit long on both engines).


def _simhash_sig_sql(width: int) -> str:
    h_sql = h32_sql("w") if width <= 32 else h60_sql("w")
    return f"""
    SELECT doc_id,
           CAST({' + '.join(f'b{bit}' for bit in range(width))} AS BIGINT) AS simhash
    FROM (
        SELECT doc_id,
               {', '.join(
                   f"CASE WHEN SUM(CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
                   f"THEN {1 << bit} ELSE 0 END AS b{bit}"
                   for bit in range(width)
               )}
        FROM (
            SELECT doc_id, {h_sql} AS h
            FROM (SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS w
                  FROM documents)
        )
        GROUP BY doc_id
    )
"""


def _simhash_sig_df(spark: SparkSession, sf_dir: str, width: int = 16) -> DataFrame:
    """(doc_id, simhash): Spark twin of ``_simhash_sig_sql(width)``."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("w"))
    h_fn = h32 if width <= 32 else h60
    bits = tok.select("doc_id", h_fn(F.col("w")).alias("h"))
    sig = bits.groupBy("doc_id").agg(
        *[
            F.when(
                F.sum(
                    F.when(F.shiftright("h", bit).bitwiseAND(1) == 1, 1).otherwise(-1)
                )
                > 0,
                1 << bit,
            )
            .otherwise(0)
            .alias(f"b{bit}")
            for bit in range(width)
        ]
    )
    simhash = sum(F.col(f"b{bit}") for bit in range(width))  # type: ignore[arg-type]
    # cached for the same reason as _minhash_bands: the hamming query reads
    # it on BOTH sides of the banded self-join, and dedup_edit_distance
    # layers a verification join on top — one narrow (doc_id, long) row per
    # doc, recomputed 2-3x uncached. Per-width plans cache independently.
    return sig.select("doc_id", simhash.cast("long").alias("simhash")).cache()


@register(
    "dedup_simhash",
    oracle=f"""
    SELECT simhash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_docs
    FROM ({_simhash_sig_sql(16)}) GROUP BY 1
    """,
    doc="SimHash (16-bit here for oracle compactness; width is a parameter): "
    "per distinct token, md5-derived h32; signature bit b = sign of the sum "
    "of (+-1) over tokens' bit b. Documents grouped by identical signature "
    "(hamming-0 near-dup families). Scale: signature computed in one "
    "explode+groupBy pass; dedup_simhash_hamming extends to hamming<=k via "
    "banding.",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _simhash_sig_df(spark, sf_dir, width=16)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh_all AS (
        SELECT doc_id,
               unnest(list_transform({_SHINGLES_SQL}, s -> {h32_sql('s')}))
                   AS shingle
        FROM {_DOC_TOKS_SQL} WHERE len(toks) >= 3
    ),
    sh AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh_all
        ) WHERE df <= {_SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
    doc="Exact n-gram Jaccard near-dup pairs (threshold 0.2 over word "
    "3-gram shingle sets): explode shingles, equi-join on shingle, count "
    "per-pair intersections, join back set sizes. Scale guard: shingles in "
    "more than 100 documents (stop-shingles) are dropped from the shingle "
    "universe BEFORE the self-join — a hot shingle in d documents otherwise "
    "fans out d^2 join rows; jaccard is computed over the capped universe "
    "and the oracle applies the identical cap.",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # Shingles are joined/grouped many times below — carry the portable
    # 32-bit hash (8-byte long) through the shuffles instead of the ~25-byte
    # string; the oracle hashes identically, so any (rare) collision merges
    # the same two shingles in both engines.
    sh_all = docs.filter(F.size(toks) >= 3).select(
        "doc_id",
        F.explode(F.transform(_shingles(toks), lambda s: h32(s))).alias("shingle"),
    )
    # Doc-frequency cap via a window on the same shuffle key the self-join
    # uses, so the exchange is reused, not repeated.
    sh = truncate(
        sh_all.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        .filter(F.col("df") <= _SHINGLE_DF_CAP)
        .drop("df")
        # Materialize once (tokenize+shingle+hash+window is the expensive
        # scan): sizes and BOTH self-join sides reuse it instead of
        # recomputing the explode three times. Lazy: all three consumers
        # live in the entry's one materializing job.
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")
    )
    return (
        inter.join(F.broadcast(sa), F.col("sa.doc_id") == F.col("doc_a"))
        .join(F.broadcast(sb), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# Deterministic query-sample stride for the cosine recall harness:
# stride = 1 while n <= 64, else 2^(bitlen(n) - 7), giving a sample of
# 64..127 query vectors spread evenly over the id space at ANY corpus size
# (exact integer arithmetic — LENGTH(BIN(n)) on both engines, no libm).
_COS_SAMPLE_BITS = 7  # 2^7 = 128: sample size lands in [64, 127]


def _cosine_sample_stride(n: int) -> int:
    """Driver-side twin of the oracle's stride CTE (exact integers)."""
    return 1 if n <= 64 else 1 << (n.bit_length() - _COS_SAMPLE_BITS)


# Safe at module level: similarity_queries -> operator_queries -> catalog
# only (no cycle back into this module).
from map_reduce_ruby_spark.plans.similarity_queries import _BUCKET_SQL  # noqa: E402


@register(
    "dedup_embedding_cosine",
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
    st AS (
        SELECT CASE WHEN COUNT(*) <= 64 THEN 1
               ELSE CAST(1 AS BIGINT)
                    << (LENGTH(BIN(COUNT(*))) - {_COS_SAMPLE_BITS}) END AS stride
        FROM sig
    ),
    q AS (SELECT * FROM sig WHERE vec_id % (SELECT stride FROM st) = 0)
    SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
           ROUND(list_sum(list_transform(range(1, 65),
                 i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4) AS cos_sim,
           CAST(CASE WHEN q.bucket = c.bucket THEN 1 ELSE 0 END AS BIGINT)
               AS lsh_hit
    FROM q JOIN sig c ON c.vec_id <> q.vec_id
    WHERE ROUND(list_sum(list_transform(range(1, 65),
              i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 4) >= 0.35
    """,
    doc="Embedding near-dup RECALL HARNESS (bounded, linear): a "
    "deterministic stride sample of 64..127 query vectors (vec_id % "
    "2^(bitlen(n)-7) = 0 — exact on both engines) is scored against the "
    "FULL corpus with exact cosine, keeping pairs >= 0.35 (the fixture's "
    "near-dup knee, matching dedup_embedding_lsh). This is the "
    "ground truth an ANN path is graded against: lsh_hit marks whether the "
    "random-hyperplane bucket (knn_lsh's signature) would have surfaced "
    "the pair, so sum(lsh_hit)/count(*) IS the LSH candidate recall on "
    "true near-dups. Plan: the sampled queries are a collected bounded "
    "artifact (<= 127 rows, the knn_pandas_udf rule) replayed as a "
    "LITERAL array exploded corpus-side — one parquet scan, no join at "
    "all, O(|sample| * n) work at any scale. The former all-pairs "
    "baseline lives on as a test-only assertion at sf0.001 "
    "(tests/test_curation_ops.py) — the catalog itself ships zero "
    "quadratic plans.",
    tags=("dedup", "embedding", "recall-harness"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unrolled vector math (shared with similarity_queries): higher-order
    # lambdas are interpreted per element, unrolled chains stay in codegen.
    from map_reduce_ruby_spark.plans.similarity_queries import (
        _bucket_spark,
        _dot,
        _norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).select("vec_id", "e", _norm("e").alias("nrm"), _bucket_spark("e").alias("bucket"))
    stride = _cosine_sample_stride(emb.count())  # parquet metadata count
    # Bounded artifact: <= 127 query rows, replayed as a literal struct
    # array exploded scan-side — no join operator (functions/replay.py).
    qrows = (
        v.filter(F.col("vec_id") % stride == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.col("bucket").alias("qb"),
        )
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, cos_sim double, lsh_hit long"
        )
    # Score the <=127 collected queries against the corpus in a NumPy
    # kernel over Arrow batches (one corpus scan, no join operator, the
    # same no-BNLJ property as the former literal-replay explode — which
    # materialized |sample| x n rows through codegen element_at chains:
    # 17.9 s at sf1 for 63.5M evaluations). The kernel accumulates each
    # dot SEQUENTIALLY over ascending dimensions, the exact IEEE order of
    # the unrolled _dot chain and the oracle's list_sum, so emitted dots
    # are bit-identical; it PRE-filters at raw >= 0.3499 — strictly below
    # the 0.34995 round-to-0.35 boundary, so no qualifying pair can be
    # dropped — and the authoritative round/threshold/lsh_hit all stay
    # JVM-side on the survivors (a few thousand rows, not 63.5M).
    import numpy as np

    Q = np.array([list(r.qe) for r in qrows], dtype=np.float64)
    qid = np.array([r.qid for r in qrows], dtype=np.int64)
    qnrm = np.array([r.qnrm for r in qrows], dtype=np.float64)
    qb = np.array([r.qb for r in qrows], dtype=np.int64)
    dim = Q.shape[1]

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            idx = b.schema.get_field_index
            ids = b.column(idx("vec_id")).to_numpy(zero_copy_only=False)
            X = (
                b.column(idx("e"))
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, dim)
            )
            nrm = b.column(idx("nrm")).to_numpy(zero_copy_only=False)
            bkt = b.column(idx("bucket")).to_numpy(zero_copy_only=False)
            d = X[:, 0:1] * Q[None, :, 0]
            for i in range(1, dim):
                d += X[:, i : i + 1] * Q[None, :, i]
            raw = d / (qnrm[None, :] * nrm[:, None])
            mask = (raw >= 0.3499) & (ids[:, None] != qid[None, :])
            r, c = np.nonzero(mask)
            if len(r) == 0:
                continue
            yield pa.record_batch(
                [
                    pa.array(qid[c], pa.int64()),
                    pa.array(ids[r], pa.int64()),
                    pa.array(d[r, c], pa.float64()),
                    pa.array(nrm[r], pa.float64()),
                    pa.array(qnrm[c], pa.float64()),
                    pa.array(qb[c], pa.int64()),
                    pa.array(bkt[r], pa.int64()),
                ],
                names=["qid", "vec_b", "dot", "nrm", "qnrm", "qb", "bucket"],
            )

    cand = v.mapInArrow(
        kernel,
        schema="qid long, vec_b long, dot double, nrm double,"
        " qnrm double, qb long, bucket long",
    )
    cos = F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), 4)
    return (
        cand.select(
            F.col("qid").alias("vec_a"),
            "vec_b",
            cos.alias("cos_sim"),
            (F.col("qb") == F.col("bucket")).cast("long").alias("lsh_hit"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )


@register(
    "dedup_clusters_cc",
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
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    )
    SELECT component AS cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="Near-dup CLUSTERS: MinHash-LSH candidate pairs fed through the "
    "distributed connected-components operator "
    "(operators/connected_components.py, min-label propagation with "
    "localCheckpoint lineage truncation) — the transitive-closure step a "
    "dedup pipeline needs before electing one keeper per cluster "
    "(pair output alone under-deletes: A~B, B~C but not A~C). Scale: each "
    "round is one equi-join + min-agg shuffle; rounds = cluster diameter "
    "(1-3 for LSH cliques). Oracle: DuckDB recursive-CTE transitive closure "
    "over the identical pair set.",
    tags=("dedup", "clustering", "iterative", "custom-operator"),
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc_id"),
    )


@register(
    "dedup_clusters_incremental",
    # SAME oracle as dedup_clusters_cc: incremental maintenance must be
    # indistinguishable from the full rebuild over old ∪ new edges (the
    # dedup_index_append rule applied to the CLUSTERING artifact).
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
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    )
    SELECT component AS cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="INCREMENTAL MAINTENANCE of the dedup clustering "
    "(operators/connected_components.py incremental_connected_components): "
    "the standing clusters are built from corpus-only pairs (both endpoints "
    "doc_id % 5 != 0), then today's batch's pairs (any endpoint % 5 == 0 — "
    "exactly what probing the persisted band index produces per ingest) are "
    "folded in WITHOUT re-running CC over the corpus edge set. Mechanics: "
    "each standing component contracts to one meta-node (the quotient-graph "
    "identity), the iterative CC runs on the contracted BATCH graph only, "
    "and the corpus relabels through a broadcast meta map (components "
    "actually merged, ≤ 2·|batch edges|) — at 100 TB the corpus pays one "
    "map-side relabel, never another O(corpus-edges) iteration. This "
    "completes the incremental lifecycle: index appends keep candidate "
    "PAIR discovery batch-sized (dedup_index_append), this keeps the "
    "transitive-closure step batch-sized too. Gated on the FULL-REBUILD "
    "oracle (identical to dedup_clusters_cc): a wrong merge, dropped "
    "component, or unstable id hash-mismatches.",
    tags=("dedup", "clustering", "iterative", "incremental",
          "custom-operator"),
)
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import (
        connected_components,
        incremental_connected_components,
    )

    # One materialization of the LSH pair set for BOTH slices: the corpus
    # CC consumes old_pairs and the incremental fold consumes new_pairs —
    # filtered from a lazy plan, each side would re-run the band self-join.
    # Lazy: the corpus CC's first round materializes it; no separate job.
    pairs = truncate(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    )
    is_batch_a = F.col("doc_a") % 5 == 0
    is_batch_b = F.col("doc_b") % 5 == 0
    old_pairs = pairs.filter(~is_batch_a & ~is_batch_b)
    new_pairs = pairs.filter(is_batch_a | is_batch_b)
    base = connected_components(old_pairs, "doc_a", "doc_b")
    labels = incremental_connected_components(base, new_pairs, "doc_a", "doc_b")
    return labels.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc_id"),
    )


@register(
    "dedup_cleaned_corpus",
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
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    ),
    drops AS (SELECT node FROM comp WHERE node <> component)
    SELECT lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT node FROM drops)
    GROUP BY lang
    """,
    doc="The COMPLETE near-dup removal pipeline, end to end: LSH candidate "
    "pairs -> connected-components clusters -> elect the min-doc_id keeper "
    "per cluster -> ANTI-join the losers out of the corpus -> surviving "
    "per-language stats. The drop set is duplicates-only (a small fraction "
    "of the corpus by construction), so the anti-join BROADCASTs it — the "
    "full corpus is filtered map-side with no shuffle at 100 TB.",
    tags=("dedup", "clustering", "pipeline", "custom-operator"),
)
def dedup_cleaned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    drops = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(drops), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )


_HAMMING_MAX = 2
_SH_WIDTH = 60       # signature bits (15 md5 hex chars; BIGINT-safe)
_SH_NBANDS = 3       # pigeonhole: <= 2 differing bits leave >= 1 band intact
_SH_BW_MIN, _SH_BW_MAX = 8, 20  # 3 bands x <=20 bits <= 60 signature bits

# Scale-adaptive band width: bw = clamp(floor(log2 n_docs) + 2, 8, 20),
# computed EXACTLY via LENGTH(BIN(n)) = floor(log2 n)+1 (no libm, so both
# engines derive the identical integer). Buckets per band = 2^bw >= ~2n,
# keeping expected bucket occupancy <= ~0.5 and candidate volume
# ~ NBANDS * n^2 / 2^bw = O(n) instead of the fixed-width saturation
# (8-bit bands measured 13.2M candidate pairs at sf1). Completeness is
# structural, not statistical: the 3 bands are DISJOINT bit ranges of the
# signature, so a pair with hamming <= 2 over the full 60 bits has its
# differing bits in at most 2 bands — at least one band is bit-identical
# and the equi-join emits the pair, whatever bw is. (Bits >= 3*bw sit
# outside every band; they can only ADD candidates, never hide one.)
_SH_BW_SQL = (
    f"LEAST({_SH_BW_MAX}, GREATEST({_SH_BW_MIN}, "
    "LENGTH(BIN((SELECT COUNT(*) FROM documents))) + 1))"
)


def _simhash_band_width(n_docs: int) -> int:
    """Driver-side twin of ``_SH_BW_SQL`` (exact integer arithmetic)."""
    return min(_SH_BW_MAX, max(_SH_BW_MIN, max(n_docs, 1).bit_length() + 1))


# Shared with dedup_edit_distance below (its candidate block IS this query).
_SH_HAMMING_SQL = f"""
    WITH sig AS ({_simhash_sig_sql(_SH_WIDTH)}),
    bw AS (SELECT {_SH_BW_SQL} AS w),
    bands AS (
        SELECT doc_id, simhash, b.band_idx,
               (simhash >> (bw.w * b.band_idx)) & ((1::BIGINT << bw.w) - 1)
                   AS band_val
        FROM sig, bw,
             (SELECT UNNEST(range({_SH_NBANDS})) AS band_idx) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sig_a, b.simhash AS sig_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {_HAMMING_MAX}
"""


@register(
    "dedup_simhash_hamming",
    oracle=_SH_HAMMING_SQL,
    doc="SimHash near-dup pairs within hamming distance 2 (not just the "
    "hamming-0 families of dedup_simhash): a 60-bit signature splits into 3 "
    "DISJOINT bands whose width ADAPTS to corpus size — bw = "
    "clamp(floor(log2 n)+2, 8, 20), derived from LENGTH(BIN(COUNT(*))) so "
    "both engines compute the identical integer without libm. By pigeonhole "
    "any pair differing in <= 2 bits shares at least one intact band, so "
    "the banded equi-self-join is a COMPLETE candidate generator for every "
    "bw; exact bit_count(XOR) over the full signature filters false "
    "candidates. Scale: buckets per band = 2^bw >= ~2*n_docs keeps expected "
    "occupancy <= ~0.5 and candidate volume O(n) — the fixed 8-bit banding "
    "this replaces saturated at 50k docs (13.2M candidate pairs at sf1; "
    "adaptive banding: ~60k). Above 2^18 docs the width caps at 20 and "
    "occupancy grows linearly again — the next production knob is more, "
    "narrower tables over a wider signature (k-of-n bit sampling), same "
    "plan shape. The Spark side reads n_docs via a metadata-only count "
    "(bounded scalar) and bands with literal shifts; the oracle derives "
    "the same width in-query.",
    tags=("dedup", "simhash", "lsh"),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bw = _simhash_band_width(docs.count())  # parquet metadata count
    mask = (1 << bw) - 1
    sig = _simhash_sig_df(spark, sf_dir, width=_SH_WIDTH)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("simhash", bw * b).bitwiseAND(mask).alias("band_val"),
                    )
                    for b in range(_SH_NBANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= _HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )


# The >2^18-docs continuation the adaptive-band docstring names: overlapping
# CYCLIC windows over the same 60-bit signature. 6 tables; table t keys on
# the 20 bits starting at offset 10*t (mod 60, so windows 4 and 5 wrap).
# Every bit lies in exactly 2 windows (60 positions x 2 = 6 x 20), so a pair
# differing in <= 2 bits invalidates at most 4 windows and shares >= 2 intact
# ones — candidate generation is COMPLETE by the covering design, like the
# disjoint-band pigeonhole but WITHOUT spending disjoint signature bits per
# band: each table gets the full 2^20 buckets from the same 60 bits.
_SH_BS_TABLES = 6   # covering design: every bit in exactly 2 of the 6 windows
_SH_BS_BITS = 20    # window width -> 2^20 buckets per table
_SH_BS_STEP = 10    # window t starts at bit 10*t (cyclic)

_SH_BITSAMPLE_SQL = f"""
    WITH sig AS ({_simhash_sig_sql(_SH_WIDTH)}),
    tables AS (
        SELECT doc_id, simhash, t.tab,
               (((simhash >> ({_SH_BS_STEP} * t.tab))
                 | ((simhash & ((1::BIGINT << ({_SH_BS_STEP} * t.tab)) - 1))
                    << ({_SH_WIDTH} - {_SH_BS_STEP} * t.tab)))
                & ((1::BIGINT << {_SH_BS_BITS}) - 1)) AS bucket
        FROM sig, (SELECT UNNEST(range({_SH_BS_TABLES})) AS tab) t
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sig_a, b.simhash AS sig_b
        FROM tables a JOIN tables b
          ON a.tab = b.tab AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {_HAMMING_MAX}
"""


@register(
    "dedup_simhash_bitsample",
    oracle=_SH_BITSAMPLE_SQL,
    doc="The >2^18-docs continuation dedup_simhash_hamming's docstring "
    "names, made concrete: k-of-n bit-sampled Hamming TABLES over the same "
    "60-bit signature. 6 tables; table t keys on the 20-bit CYCLIC window "
    "starting at bit 10t (windows 4-5 wrap around). Every signature bit "
    "lies in exactly 2 windows (6 x 20 = 2 x 60), so a pair within hamming "
    "2 invalidates at most 4 windows and always shares >= 2 intact ones — "
    "completeness is a covering-design argument, as structural as the "
    "disjoint-band pigeonhole, and the two entries must emit IDENTICAL "
    "pair sets (pinned by tests/test_plans.py). Scale: where disjoint "
    "bands cap at 60/3 = 20 bits and occupancy turns linear past ~2^18 "
    "docs, overlapping windows give every table the full 2^20 buckets "
    "from the same signature; more tables with a finer step extend the "
    "same trade (tables x width >= 2 x bits keeps the hamming-2 proof). "
    "Plan shape unchanged: explode 6 rows/doc, one shuffle on "
    "(table, bucket), exact bit_count(XOR) verification.",
    tags=("dedup", "simhash", "lsh"),
)
def dedup_simhash_bitsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _simhash_sig_df(spark, sf_dir, width=_SH_WIDTH)
    lo_mask = [ (1 << (_SH_BS_STEP * t)) - 1 for t in range(_SH_BS_TABLES) ]
    bucket_mask = (1 << _SH_BS_BITS) - 1
    tables = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tab"),
                        (
                            F.shiftright("simhash", _SH_BS_STEP * t)
                            .bitwiseOR(
                                F.shiftleft(
                                    F.col("simhash").bitwiseAND(lo_mask[t]),
                                    _SH_WIDTH - _SH_BS_STEP * t,
                                )
                            )
                            .bitwiseAND(bucket_mask)
                        ).alias("bucket"),
                    )
                    for t in range(_SH_BS_TABLES)
                ]
            )
        ).alias("w"),
    ).select("doc_id", "simhash", "w.tab", "w.bucket")
    a, b = tables.alias("a"), tables.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tab") == F.col("b.tab"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= _HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )


# Shared with dedup_persisted_index below: the persisted-index probe must
# produce exactly what this in-query derivation produces.
_INCR_MINHASH_ORACLE = f"""
    WITH hs AS (
        SELECT doc_id, {{base}} AS hashes
        FROM {_DOC_TOKS_SQL}
        WHERE len(toks) >= 3
    ),
    sig AS (
        SELECT doc_id, {{sig_cols}}
        FROM hs
    ),
    bands AS (
        {{bands_union}}
    ),
    corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
    batch  AS (SELECT * FROM bands WHERE doc_id % 5 = 0)
    SELECT n.doc_id AS doc_id,
           MIN(c.doc_id) AS dup_of,
           COUNT(DISTINCT n.band_idx) AS n_shared_bands
    FROM batch n JOIN corpus c
      ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
    GROUP BY n.doc_id
""".format(
    base=_base_hashes_sql(_SHINGLES_SQL),
    sig_cols=", ".join(
        f"{e} AS mh{i}" for i, e in enumerate(_minhash_sig_sql("hashes"))
    ),
    bands_union=" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5({' || chr(44) || '.join(f'mh{b * _ROWS_PER_BAND + r}::VARCHAR' for r in range(_ROWS_PER_BAND))}) AS band_hash "
        f"FROM sig"
        for b in range(_N_BANDS)
    ),
)


@register(
    "dedup_incremental_minhash",
    oracle=_INCR_MINHASH_ORACLE,
    doc="INCREMENTAL near-dedup — the shape a production ingest actually "
    "runs: a new batch (doc_id % 5 = 0 stands in for today's crawl) is "
    "checked against the EXISTING corpus's minhash band index without ever "
    "re-pairing corpus x corpus. Each batch doc reports its lowest-id corpus "
    "near-dup and how many bands collide. Scale: the corpus band index is "
    "precomputed once and stored (here derived in-query); per ingest the "
    "join touches only (batch bands) x (matching buckets) — cost tracks the "
    "BATCH size, not the corpus size, which is what makes daily dedup "
    "against a trillion-doc corpus affordable. Same band layout as "
    "dedup_minhash_lsh, so one index serves both full and incremental "
    "passes.",
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _minhash_bands(spark, sf_dir)
    corpus = bands.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("c_doc"), "band_idx", "band_hash"
    )
    batch = bands.filter(F.col("doc_id") % 5 == 0)
    return (
        batch.join(corpus, ["band_idx", "band_hash"])
        .groupBy("doc_id")
        .agg(
            F.min("c_doc").alias("dup_of"),
            F.countDistinct("band_idx").alias("n_shared_bands"),
        )
    )


@register(
    "dedup_index_append",
    # SAME oracle as dedup_incremental_minhash: banding has no trained
    # state, so the incrementally-maintained stored index (corpus-A written,
    # batch-B appended) must be EXACTLY the full rebuild over A ∪ B — the
    # probe against it hash-matches the derived-path oracle verbatim.
    oracle=_INCR_MINHASH_ORACLE,
    doc="INCREMENTAL MAINTENANCE of the persisted band index "
    "(operators/dedup_index.py append_minhash_batch): the index is built "
    "from corpus slice A (doc_id % 5 in 2..4), then slice B (doc_id % 5 = "
    "1) is sketched alone and APPENDED into the bucketed layout — the "
    "reference's add_chunk-per-batch deploy story (reducer.rb:34-42) "
    "applied to the index artifact: A's bucket files are never rewritten "
    "(mtime-pinned in tests/test_dedup_index.py), B pays cost proportional "
    "to B, and the probe batch (doc_id % 5 = 0) joins the combined index "
    "corpus-shuffle-free. Gated on the FULL-REBUILD oracle: appending must "
    "be indistinguishable from re-sketching A ∪ B.",
    tags=("dedup", "minhash", "lsh", "incremental", "persisted"),
)
def dedup_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        dedup_against_index,
        register_minhash_index,
        write_minhash_index,
    )
    from map_reduce_ruby_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_a = docs.filter(F.col("doc_id") % 5 >= 2)
    batch_b = docs.filter(F.col("doc_id") % 5 == 1)
    probe = docs.filter(F.col("doc_id") % 5 == 0)

    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    # CONTENT-fingerprinted cache (the knn_ivf_persisted rule): the
    # maintained table is deterministic — write A, append B — so a completed
    # build+append is reusable; a regenerated fixture changes the tag.
    # B's membership commits as a BATCH ID through append_minhash_batch's
    # idempotency record (the append_ivf_batch/append_nb_batch protocol),
    # so a crash-rerun never doubles B's bands: the keep-winner publish
    # keeps a committed A (half-built paths without _SUCCESS rebuild), and
    # the committed batch id turns the retry's append into a no-op — the
    # maintained index equals the full rebuild as a MULTISET, not just
    # under the probe's duplicate-invariant aggregates.
    tag = table_fingerprint(sf_dir, "documents")
    table = f"mh_idx_append_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"mh_idx_append_{tag}")
    bid = f"slice_b:{tag}"
    legacy_marker = os.path.join(path, "_APPEND_COMMITTED")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # cold or half-built: staged build + keep-winner publish (a
        # completed sibling build is attached, never deleted under its
        # readers)
        write_minhash_index(corpus_a, table, path)
    elif not spark.catalog.tableExists(table):
        # committed by a sibling process: ATTACH the existing layout —
        # rebuilding would delete its live files under that process's
        # readers (register_minhash_index docstring)
        register_minhash_index(spark, table, path)
    if os.path.exists(legacy_marker):
        # pre-batch-id layout (r8): the marker proved B was appended;
        # migrate it into the batch record so the append below no-ops
        from map_reduce_ruby_spark.operators.dedup_index import (
            _commit_batch_id,
            _maintenance_lock,
        )

        with _maintenance_lock(spark, table):
            _commit_batch_id(spark, table, bid)
    append_minhash_batch(batch_b, table, batch_id=bid)
    return dedup_against_index(spark, probe, table)


@register(
    "dedup_index_compacted",
    # SAME full-rebuild oracle as dedup_index_append: compaction merges the
    # appended generations' files but must be observationally invisible.
    oracle=_INCR_MINHASH_ORACLE,
    doc="COMPACTION of the persisted band index (operators/dedup_index.py "
    "compact_minhash_index) — the OPTIMIZE step completing the append "
    "lifecycle across all three persisted index families (IVF cells: "
    "knn_ivf_compacted; PQ codes: compact_pq_index; minhash bands: this). "
    "Each append_minhash_batch adds its own files into every bucket, so "
    "daily ingests turn the 16 buckets into hundreds of small files; the "
    "compactor forces the BUCKETED SCAN on (autoBucketedScan would demote "
    "it and scatter buckets across tasks) so each task merges exactly its "
    "bucket's files with ZERO shuffle — the layout is the shuffle, paid at "
    "append time — then flips the live table's data pointer in one ALTER "
    "TABLE SET LOCATION; readers holding the old generation keep their "
    "files until the caller reclaims the returned old location after a "
    "drain window. Appends and compactions serialize on a per-table "
    "maintenance lock. This entry builds from slice A, "
    "appends slice B, compacts, then probes slice 0 against the compacted "
    "table: gated on the SAME full-rebuild oracle as dedup_index_append, "
    "so a merge that dropped, duplicated, or re-bucketed any band row "
    "hash-mismatches; the probe plan stays bucketed and corpus-shuffle-"
    "free (plan-asserted in tests/test_dedup_index.py).",
    tags=("dedup", "minhash", "lsh", "incremental", "persisted",
          "compaction"),
)
def dedup_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        compact_minhash_index,
        dedup_against_index,
        register_minhash_index,
        write_minhash_index,
    )
    from map_reduce_ruby_spark.sources import load_table
    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_a = docs.filter(F.col("doc_id") % 5 >= 2)
    batch_b = docs.filter(F.col("doc_id") % 5 == 1)
    probe = docs.filter(F.col("doc_id") % 5 == 0)

    # Content-fingerprinted cache (the dedup_index_append rule), marker in
    # the COMPACTED generation's dir: any half-done state rebuilds cleanly.
    tag = table_fingerprint(sf_dir, "documents")
    table = f"mh_idx_cmp_{tag}"
    base_path = os.path.join(tempfile.gettempdir(), f"mh_idx_cmp_base_{tag}")
    cmp_path = os.path.join(tempfile.gettempdir(), f"mh_idx_cmp_gen2_{tag}")
    marker = os.path.join(cmp_path, "_COMPACT_COMMITTED")
    if os.path.exists(marker) and not spark.catalog.tableExists(table):
        # committed by a sibling process: attach the compacted generation
        # instead of rebuilding over its live files
        register_minhash_index(spark, table, cmp_path)
    elif not os.path.exists(marker):
        shutil.rmtree(cmp_path, ignore_errors=True)
        if spark.catalog.tableExists(table):
            spark.sql(f"DROP TABLE {table}")
        # keep-winner may KEEP a committed base from a crashed prior run
        # that already appended B; the batch id makes the re-append a
        # no-op, so the compacted generation never inherits doubled bands
        write_minhash_index(corpus_a, table, base_path)
        append_minhash_batch(batch_b, table, batch_id=f"slice_b:{tag}")
        # the returned old generation is LEFT on disk for a drain window:
        # the path is shared across processes (content-addressed in
        # tempdir), so a sibling suite's readers may still hold pre-flip
        # plans over it — an immediate rmtree is the same reader-kill the
        # attach fix closed. A few MB of /tmp until the fixture's tag
        # rotates is the price of never deleting files under a live scan.
        compact_minhash_index(spark, table, cmp_path)
        open(marker, "w").close()
    return dedup_against_index(spark, probe, table)


@register(
    "dedup_clusters_cc_star",
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
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    )
    SELECT component AS cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="dedup_clusters_cc computed by the LARGE-STAR/SMALL-STAR algorithm "
    "(operators/connected_components.py connected_components_star, Kiveris "
    "et al.) instead of min-label propagation — O(log n) rounds regardless "
    "of graph diameter, the variant a 100 TB pipeline runs when cluster "
    "chains can be long (e.g. templated near-dup families chaining across "
    "thresholds). Same recursive-CTE oracle as the propagation twin, so "
    "BOTH iterative algorithms are value-gated against an independent "
    "transitive closure, and against each other.",
    tags=("dedup", "clustering", "iterative", "custom-operator"),
)
def dedup_clusters_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators import connected_components_star

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components_star(pairs, "doc_a", "doc_b")
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc_id"),
    )


# --- exact-substring span dedup ---------------------------------------------
#
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") remove every substring that occurs more than once in the corpus,
# found via a suffix array. The distributed re-expression: positional word
# n-grams (the fixed-width analogue of suffix-array match seeds), a corpus-
# wide occurrence count per gram, and a gaps-and-islands merge of adjacent
# duplicated positions back into maximal spans. The reference engine has no
# such operator (its only dataflow is map/shuffle/reduce,
# /root/reference/lib/map_reduce/mapper.rb:43-55); this is an extension.

_SPAN_N = 5  # gram width in tokens


@register(
    "dedup_span_ngram",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_TOKENS_SQL} AS tok FROM documents
    ),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' ' ||
               tok[i+3] || ' ' || tok[i+4] AS gram
        FROM base, UNNEST(range(1, len(tok) - {_SPAN_N - 2})) AS t(i)
    ),
    d AS (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY {h32_sql('gram')}) AS cnt
        FROM g
    ),
    isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d WHERE cnt >= 2
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_SPAN_N - 1} AS span_end,
           COUNT(*) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
    doc="Exact-substring span dedup (Lee et al. 2022, suffix-array dedup "
    "re-expressed distributed): positional word-5-grams, corpus-wide "
    "occurrence count per gram hash (one shuffle on the uniform 32-bit "
    "gram hash), then adjacent duplicated positions merged into maximal "
    "spans per doc with gaps-and-islands (window partitioned by doc_id). "
    "Output = the (start, end) token spans a trainer would cut. At 100 TB "
    "each stage stays narrow or shuffles on a uniform key; no join ever "
    "pairs documents.",
    tags=("dedup", "span", "extension"),
)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n = _SPAN_N
    base = docs.select("doc_id", _tokens(F.col("text")).alias("tok"))
    # 1-based gram start positions; guard short docs (sequence() would step
    # BACKWARD for size(tok) < n and fabricate positions).
    idx = F.when(
        F.size("tok") >= n, F.sequence(F.lit(1), F.size("tok") - (n - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    gram = F.expr(
        "concat_ws(' ', " + ", ".join(f"element_at(tok, pos + {j})" for j in range(n)) + ")"
    )
    g = base.select("doc_id", F.explode(idx).alias("pos"), "tok").select(
        "doc_id", F.col("pos").cast("long").alias("pos"), gram.alias("gram")
    )
    d = g.withColumn("cnt", F.count(F.lit(1)).over(W.partitionBy(h32(F.col("gram")))))
    isl = (
        d.filter(F.col("cnt") >= 2)
        .withColumn(
            "grp",
            F.col("pos") - F.row_number().over(W.partitionBy("doc_id").orderBy("pos")),
        )
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("grp")


# --- PageRank over the near-dup similarity graph ----------------------------

_PR_D = 0.85  # damping
_PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One PageRank iteration: scaled-int64 contribution sums (r/deg rounded
    at 1e-9) so the per-node addition is shuffle-order independent — the
    same exactness rule as the k-means centroid sums."""
    p = i - 1
    return f"""
    r{i} AS (
        SELECT n.node,
               (0.15 / p.n) + {_PR_D} * (
                   CAST(COALESCE(SUM(CAST(ROUND(r.r / d.deg * 1000000000)
                                          AS BIGINT)), 0) AS DOUBLE)
                   / 1000000000.0) AS r
        FROM nodes n
        CROSS JOIN params p
        LEFT JOIN edges e ON e.b = n.node
        LEFT JOIN r{p} r ON r.node = e.a
        LEFT JOIN deg d ON d.node = e.a
        GROUP BY n.node, p.n
    )"""


@register(
    "graph_pagerank_dedup",
    oracle=f"""
    WITH pairs AS ({_LSH_PAIRS_SQL}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    params AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY a),
    r0 AS (SELECT node, 1.0 / p.n AS r FROM nodes, params p),
    {",".join(_pr_iter_sql(i) for i in range(1, _PR_ITERS + 1))}
    SELECT node AS doc_id, ROUND(r, 9) AS pagerank
    FROM r{_PR_ITERS}
    """,
    doc="PageRank (3 fixed iterations, damping 0.85) over the MinHash-LSH "
    "near-dup graph — centrality identifies template/boilerplate hubs "
    "inside duplicate families, a standard corpus-curation signal. Each "
    "iteration is one edges-to-ranks equi-join plus a per-node aggregate "
    "(the iterative join-agg shape, like the CC operators); contributions "
    "sum in scaled int64 so ranks are bit-deterministic however Spark "
    "pairs the shuffle partials, which is what lets an independent SQL "
    "rebuild hash-match float ranks. Symmetric edges mean no dangling "
    "nodes; the damping term keeps isolated-component mass bounded.",
    tags=("dedup", "graph", "iterative", "extension"),
)
def graph_pagerank_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
    # Read every iteration (2 joins each) plus nodes/deg — ~8 consumers of
    # the ~15-operator-deep LSH derivation. Pre-partitioned on the
    # per-iteration join key ``a`` so the standing edge set never
    # re-Exchanges (only the narrow rank side shuffles per iteration, and
    # ``deg`` — grouped by the same key — aggregates Exchange-free and
    # comes out co-partitioned for its join); cache() for cross-run reuse;
    # the truncate makes the unrolled 3-iteration plan analyze against a
    # LogicalRDD leaf instead of ~8 copies of the band self-join (the
    # graph_triangle_count pathology: driver-side analysis alone cost
    # ~12 s at sf0.1 on such trees). Lazy: the nodes.count() below is the
    # first action and materializes it — no separate checkpoint job.
    edges = truncate(edges.repartition(F.col("a")).cache())
    # nodes feeds r0 plus a left join in every iteration, deg a join in
    # every iteration: checkpointed (both |V|-sized) so the distinct/agg
    # over the edge set runs once, not once per unrolled iteration.
    nodes = truncate(edges.select(F.col("a").alias("node")).distinct())
    n = nodes.count()  # bounded: one integer (the |V| of the dup graph)
    if n == 0:
        return spark.createDataFrame([], "doc_id long, pagerank double")
    deg = truncate(
        edges.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    )
    r = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(r.withColumnRenamed("node", "a"), "a")
            .join(deg.withColumnRenamed("node", "a"), "a")
            .select(
                F.col("b").alias("node"),
                F.round(F.col("r") / F.col("deg") * 1_000_000_000).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        r = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(0.15 / n)
                + _PR_D * (F.coalesce(F.col("s"), F.lit(0)).cast("double") / 1e9)
            ).alias("r"),
        )
    return r.select(F.col("node").alias("doc_id"), F.round("r", 9).alias("pagerank"))


# --- Edit-distance verification on blocked candidates ------------------------

_EDIT_MAX = 25  # max Levenshtein distance for a verified near-dup pair

# Char-histogram lower bound: one edit (insert/delete/substitute) changes a
# string's character histogram by L1 <= 2, so ed(a,b) >= L1(hist_a,hist_b)/2
# — an EXACT bound, and still exact over any SUBSET of the alphabet (a
# subset only shrinks L1). Computed ONCE per document (38 replace scans),
# then each candidate pair costs 38 integer ops instead of an O(len*k) DP.
# This is the filter that separates true near-dups from the hard negatives
# SimHash banding cannot see: docs over the same token VOCABULARY (same
# distinct-token set => near-identical signatures) but with different token
# orders/repetition counts. Repetition differences move the histogram;
# token reorders that survive it are rare enough to DP directly.
_HIST_CHARS = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + [" ", "~"]
)


def _char_hist_cols_sql() -> str:
    return ", ".join(
        f"length(text) - length(replace(text, '{c}', '')) AS ch{i}"
        for i, c in enumerate(_HIST_CHARS)
    )


def _char_hist_l1_sql(a: str, b: str) -> str:
    return " + ".join(
        f"ABS({a}.ch{i} - {b}.ch{i})" for i in range(len(_HIST_CHARS))
    )


@register(
    "dedup_edit_distance",
    # Candidate block = dedup_simhash_hamming's full query (shared constant,
    # so the two stay in lockstep by construction).
    oracle=f"""
    WITH cand AS ({_SH_HAMMING_SQL}),
    hist AS (
        SELECT doc_id, text, length(text) AS len, {_char_hist_cols_sql()}
        FROM documents
    ),
    pruned AS (
        SELECT c.doc_a, c.doc_b, a.text AS text_a, b.text AS text_b
        FROM cand c
        JOIN hist a ON a.doc_id = c.doc_a
        JOIN hist b ON b.doc_id = c.doc_b
        WHERE ABS(a.len - b.len) <= {_EDIT_MAX}
          AND ({_char_hist_l1_sql('a', 'b')}) <= {2 * _EDIT_MAX}
    ),
    ed AS (
        SELECT doc_a, doc_b,
               CAST(levenshtein(text_a, text_b) AS BIGINT) AS edit_dist
        FROM pruned
    )
    SELECT doc_a, doc_b, edit_dist FROM ed WHERE edit_dist <= {_EDIT_MAX}
    """,
    doc="Edit-distance near-dup verification: SimHash-banded candidates "
    f"(hamming <= 2) re-checked with exact Levenshtein <= {_EDIT_MAX} over "
    "the raw text — the high-precision tier of a dedup cascade (fingerprint "
    "blocks cheaply; edit distance confirms). Scale: the DP runs ONLY on "
    "banded candidate pairs — O(n) of them under the adaptive banding — "
    "and only after two EXACT no-op pre-bounds skip it for nearly all hard "
    "negatives: (1) edit distance >= |length difference|; (2) edit distance "
    ">= char-histogram-L1 / 2, with per-doc histograms computed once, not "
    "per pair (sf1 measured: 1.9M candidates -> 2.1k DPs). The surviving "
    "DPs use the threshold argument of levenshtein(a, b, k) — the "
    "Ukkonen-banded O(len*k) form, not O(len^2). Texts and histograms are "
    "fetched by two doc_id equi-joins after candidate pruning.",
    tags=("dedup", "edit-distance", "lsh", "extension"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("len"),
        *[
            (
                F.length("text")
                - F.length(F.expr(f"replace(text, '{c}', '')"))
            ).alias(f"ch{i}")
            for i, c in enumerate(_HIST_CHARS)
        ],
    )
    cand = dedup_simhash_hamming(spark, sf_dir).select("doc_a", "doc_b")
    ta = hist.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("len").alias("len_a"),
        *[F.col(f"ch{i}").alias(f"a{i}") for i in range(len(_HIST_CHARS))],
    )
    tb = hist.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("len").alias("len_b"),
        *[F.col(f"ch{i}").alias(f"b{i}") for i in range(len(_HIST_CHARS))],
    )
    l1 = sum(
        F.abs(F.col(f"a{i}") - F.col(f"b{i}")) for i in range(len(_HIST_CHARS))
    )
    paired = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            (F.abs(F.col("len_a") - F.col("len_b")) <= _EDIT_MAX)
            & (l1 <= 2 * _EDIT_MAX)
        )
    )
    # threshold form: DP cost O(len * k) instead of O(len^2); -1 = "beyond".
    dist = F.levenshtein("text_a", "text_b", _EDIT_MAX)
    return (
        paired.select("doc_a", "doc_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


# --- Triangle counting on the near-dup graph ---------------------------------


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH pairs AS ({_LSH_PAIRS_SQL}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    deg AS (SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
    oe AS (
        SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS u,
               CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS v
        FROM e
        JOIN deg da ON da.node = e.a
        JOIN deg db ON db.node = e.b
    ),
    tri AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM oe e1
        JOIN oe e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e  e3 ON e3.a = LEAST(e1.v, e2.v) AND e3.b = GREATEST(e1.v, e2.v)
    ),
    per_node AS (
        SELECT corner AS node, COUNT(*) AS n_triangles FROM (
            SELECT x AS corner FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY corner
    )
    SELECT d.node AS doc_id,
           d.deg,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.deg >= 2 THEN
               ROUND(CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
                     / (d.deg * (d.deg - 1) / 2.0), 6)
           ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN per_node t ON t.node = d.node
    """,
    doc="Triangle counting + local clustering coefficient over the "
    "MinHash-LSH near-dup graph: dense triangle neighborhoods are template "
    "families (every member near-dups every other), while star-shaped "
    "zero-triangle hubs are boilerplate stitched into otherwise-unrelated "
    "docs — the two need different curation (drop family vs strip "
    "boilerplate). Degree-ordered orientation (each edge points from lower "
    "(deg, id) to higher) bounds wedge fan-out by sqrt(|E|) on skewed "
    "graphs — the standard trick that keeps the wedge join from exploding "
    "on hubs; the closing-edge check is a canonical (LEAST, GREATEST) "
    "equi-join, so every join hash-partitions.",
    tags=("dedup", "graph", "extension"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    # Edge list: cached (cross-run reuse, CacheManager dedupes the identical
    # plan) AND truncated. The truncation is what matters for plan health:
    # the LSH pair derivation is ~15 operators deep and is
    # read by 3 consumers (orientation, closing-edge probe, degrees) —
    # duplicated per consumer it made the analyzed tree ~150 Exchange nodes
    # and cost ~12 s of DRIVER-SIDE analysis per call at sf0.1 (round-10
    # measurement), before any task ran. Truncation swaps the lineage for a
    # LogicalRDD leaf (blocks context-cleaned when the frame drops), so the
    # graph math below analyzes against a leaf, and the pair join is never
    # recomputed. deg and oe get the same treatment: deg feeds 3 subtrees
    # (orientation x2, final join), oe feeds both sides of the wedge
    # self-join — at corpus scale each recompute is an O(|E|) shuffle.
    # All three are LAZY: every consumer lives in the entry's one
    # materializing job, which computes each table once and stores it
    # (round 10's eager form paid three extra jobs per call).
    e = truncate(pairs.cache())
    und = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = truncate(
        und.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    lower_first = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oe = truncate(
        ranked.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1 = oe.select(F.col("u"), F.col("v").alias("y"))
    e2 = oe.select(F.col("u"), F.col("v").alias("z"))
    wedges = e1.join(e2, "u").filter(F.col("y") < F.col("z"))
    closing = e.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
    tri = wedges.join(
        closing,
        (F.least("y", "z") == F.col("lo")) & (F.greatest("y", "z") == F.col("hi")),
    ).select(F.col("u").alias("x"), "y", "z")
    corners = (
        tri.select(F.col("x").alias("corner"))
        .unionAll(tri.select(F.col("y").alias("corner")))
        .unionAll(tri.select(F.col("z").alias("corner")))
    )
    per_node = corners.groupBy(F.col("corner").alias("node")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    out = deg.join(per_node, "node", "left").select(
        F.col("node").alias("doc_id"),
        "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1) / 2.0),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )
    return out


@register(
    "dedup_persisted_index",
    # SAME oracle as dedup_incremental_minhash: the persisted-index probe
    # path must be indistinguishable from the in-query derivation.
    oracle=_INCR_MINHASH_ORACLE,
    doc="The PERSISTED form of incremental near-dedup "
    "(operators/dedup_index.py): the corpus's MinHash band index is "
    "materialized to a table bucketed+sorted on band_hash, then the batch "
    "(doc_id % 5 = 0) is sketched fresh and probes the bucketed scan — the "
    "plan shows the corpus side reading through its bucket layout with NO "
    "exchange (the batch side broadcasts), which is the property that "
    "makes daily dedup against a trillion-doc corpus one bounded join. "
    "Gated by the same oracle as dedup_incremental_minhash, proving the "
    "stored index and the in-query derivation are interchangeable. The "
    "index build runs at query-build time (one write per session/sf).",
    tags=("dedup", "minhash", "lsh", "incremental", "custom-operator"),
)
def dedup_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from map_reduce_ruby_spark.operators.dedup_index import (
        dedup_against_index,
        register_minhash_index,
        write_minhash_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    from map_reduce_ruby_spark.sources.tables import table_fingerprint

    # deterministic tag (NOT Python hash(), which is per-process-salted): a
    # fresh process recomputes the same path and mode=overwrite reuses it.
    # The tag is a CONTENT fingerprint of the documents table (path + data
    # file sizes/mtimes), so regenerating the fixture at this sf_dir
    # invalidates the cached index instead of silently serving stale bands.
    tag = table_fingerprint(sf_dir, "documents")
    table = f"mh_band_idx_{tag}"
    # one build per (session, sf_dir); a COMPLETE path built by a sibling
    # process is ATTACHED, never rebuilt — overwrite would delete the live
    # files under that process's readers (register_minhash_index docstring)
    if not spark.catalog.tableExists(table):
        path = os.path.join(tempfile.gettempdir(), f"mh_band_idx_{tag}")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            register_minhash_index(spark, table, path)
        else:
            write_minhash_index(corpus, table, path)
    return dedup_against_index(spark, batch, table)
