"""Entity resolution / record linkage across two datasets.

The dedup family (plans/dedup_queries.py) finds near-duplicates WITHIN one
corpus via hash-based blocking (MinHash bands, SimHash bands, shingle
equi-joins). Record linkage is the cross-dataset variant with a different
classic blocking algorithm: the SORTED-NEIGHBORHOOD method (Hernandez &
Stolfo, SIGMOD'95) — sort all records from both sides by a cheap blocking
key, slide a fixed window of w neighbors, and only verify pairs that land
in the same window. Multi-pass SNM runs several independent sort keys and
unions the candidates, recovering pairs a single key's sort order splits.

Why it earns a place next to LSH blocking: candidate volume is EXACTLY
n*w per pass (data-independent — no hot-band blowup on skewed inputs),
the sort is Spark's native strength (range partition + local sort, the
TeraSort shape), and the method needs NO hash family design — the knob is
one window width. The scale-sensitive step, a GLOBAL rank over the sort
key, deliberately avoids Spark's single-partition global window: ranks
come from the repo's two-phase prefix scan (operators/prefix_sum.py —
per-bucket totals collected once, windows only WITHIN buckets), and the
window join is an equi-join on (rank + offset), never a range join.

Verification is 3-gram shingle Jaccard over the h32-HASHED shingle
universe — the dedup family's convention (dedup_ngram_jaccard hashes its
shingles the same way): both engines hash identically, so the gate stays
exact, and the verify join shuffles primitive array<long> payloads
instead of array<string> (~4x smaller; measured at sf30 the string-array
form GC-thrashed the verify stage while candidates/rank stages stayed
linear). The fixture's cross-side near-dup pairs separate cleanly
(sf0.001: matched pairs >= 0.888, best non-match 0.027), so the 0.2
threshold sits far from any rounding boundary on either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

# Window width: each record is verified against at most ER_WINDOW sorted
# neighbors per pass. The classic SNM tuning knob — bigger w buys recall
# linearly in candidate count (n*w), unlike LSH where recall is a band
# geometry property.
_ER_WINDOW = 10
_ER_THRESHOLD = 0.2  # shingle-Jaccard verify cut (dedup-family convention)

_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"

# The oracle's twin of the Spark side's h32-hashed shingle (same md5-hex
# contract as dedup_ngram_jaccard's shingle universe).
from map_reduce_ruby_spark.functions import h32_sql

_H32_SHINGLE = h32_sql("tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]")


# Session memo of the shingled+keyed record table — ONE cached copy shared
# by both SNM entries and both blocking passes (same memo rules as the
# IVF/PQ/BPE memos: keyed by applicationId, bounded LRU, unpersist on
# eviction). A per-invocation .cache() would pin a fresh copy every call.
from map_reduce_ruby_spark.plans.memo import LruMemo

_ER_KEYED_MEMO = LruMemo(capacity=8, unpersist=lambda df: df.unpersist())


def _keyed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rec_id, sh, k1, k2) for documents with >= 3 tokens: the distinct
    3-gram shingle set (the verify metric's universe) and the two SNM
    blocking keys (leading and trailing token bigram)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    return _ER_KEYED_MEMO.get_or_build(key, lambda: _build_keyed(spark, sf_dir))


def _build_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.functions import h32

    docs = load_table(spark, sf_dir, "documents")
    tok = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    toks = docs.select(
        F.col("doc_id").alias("rec_id"), tok.alias("tok")
    ).filter(F.size("tok") >= 3)
    # shingles are h32-HASHED (array<long>, distinct AFTER hashing): the
    # verify join carries this array through two pair-keyed shuffles, and
    # at sf30 the raw-string form (~6 KB/doc of string objects) GC-thrashed
    # that stage while every other stage scaled linearly; 8-byte primitive
    # elements shuffle ~4x less and never touch the JVM object heap.
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("tok") - 3),
            lambda i: h32(
                F.concat_ws(
                    " ",
                    F.element_at("tok", (i + 1).cast("int")),
                    F.element_at("tok", (i + 2).cast("int")),
                    F.element_at("tok", (i + 3).cast("int")),
                )
            ),
        )
    )
    return toks.select(
        "rec_id",
        sh.alias("sh"),
        F.concat_ws(
            " ", F.element_at("tok", 1), F.element_at("tok", 2)
        ).alias("k1"),
        F.concat_ws(
            " ", F.element_at("tok", -2), F.element_at("tok", -1)
        ).alias("k2"),
    ).cache()


def _verify_jaccard(
    cand: DataFrame, keyed: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Exact shingle-Jaccard verify of candidate pairs: two equi-joins
    back to the shingle sets, one rounded division, threshold filter.

    Both joins carry a SHUFFLE_HASH hint on the keyed (shingle-set) side.
    The default SortMergeJoin SORTS both inputs, and the second join's
    probe side is the candidate table already carrying one shingle array
    per row (n*window*passes rows x ~KB) — at sf100 that sort goes
    external per task and its spill amplification was the measured knee
    (SCALING.md rounds 9-10: >45 GB of transient spill, 405-521 s; with
    the hints the heavy side is only hash-PROBED, never sorted, and peak
    spill drops to the exchange files themselves).

    The join partitioning is pinned EXPLICITLY, sized from the known row
    geometry (n docs -> ~n/10k partitions), instead of left to AQE: the
    hash-relation build is UNSPILLABLE, and AQE's coalescing targets
    post-shuffle bytes per task across BOTH join inputs — blind to build
    memory — so at sf100 it merged the keyed side into ~150-250 MB raw
    builds that 32 concurrent tasks cannot all hold (measured: "Can't
    acquire 67108864 bytes to build hash relation"). n/10k partitions puts
    one build at ~10k docs x ~1.5 KB = ~15 MB — inside the per-task
    execution share at any scale, since docs and partitions grow together
    (at 100 TB / 5B docs that is ~500k partitions of the same 15 MB)."""
    n_docs = keyed.count()  # keyed is session-cached by _keyed_shingles
    n_parts = max(32, min(65536, n_docs // 10_000))
    la = keyed.select(F.col("rec_id").alias(a_col), F.col("sh").alias("sh_a"))
    lb = keyed.select(F.col("rec_id").alias(b_col), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = F.round(
        inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter), 6
    )
    return (
        cand.repartition(n_parts, F.col(a_col))
        .join(la.repartition(n_parts, F.col(a_col)).hint("SHUFFLE_HASH"), a_col)
        .repartition(n_parts, F.col(b_col))
        .join(lb.repartition(n_parts, F.col(b_col)).hint("SHUFFLE_HASH"), b_col)
        .select(a_col, b_col, jacc.alias("jacc"))
        .filter(F.col("jacc") >= _ER_THRESHOLD)
    )


@register(
    "er_sorted_neighborhood",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, doc_id % 2 AS side, tok FROM (
            SELECT doc_id, {_TOKENS_SQL} AS tok FROM documents)
        WHERE len(tok) >= 3
    ),
    keyed AS (
        SELECT doc_id, side,
               list_distinct(list_transform(range(1, len(tok) - 1),
                   i -> {_H32_SHINGLE})) AS sh,
               concat_ws(' ', tok[1], tok[2]) AS k1,
               concat_ws(' ', tok[-2], tok[-1]) AS k2
        FROM toks
    ),
    r1 AS (SELECT doc_id, side,
                  row_number() OVER (ORDER BY k1, doc_id) - 1 AS rk FROM keyed),
    r2 AS (SELECT doc_id, side,
                  row_number() OVER (ORDER BY k2, doc_id) - 1 AS rk FROM keyed),
    cand AS (
        SELECT DISTINCT
               CASE WHEN sa_ = 0 THEN da ELSE db END AS left_id,
               CASE WHEN sa_ = 0 THEN db ELSE da END AS right_id
        FROM (
            SELECT a.doc_id AS da, a.side AS sa_, b.doc_id AS db, b.side AS sb_
            FROM r1 a JOIN r1 b ON b.rk BETWEEN a.rk + 1 AND a.rk + {_ER_WINDOW}
            UNION ALL
            SELECT a.doc_id, a.side, b.doc_id, b.side
            FROM r2 a JOIN r2 b ON b.rk BETWEEN a.rk + 1 AND a.rk + {_ER_WINDOW}
        ) p(da, sa_, db, sb_)
        WHERE sa_ <> sb_
    )
    SELECT left_id, right_id, jacc FROM (
        SELECT c.left_id, c.right_id,
               ROUND(CAST(len(list_intersect(la.sh, lb.sh)) AS DOUBLE)
                     / (len(la.sh) + len(lb.sh)
                        - len(list_intersect(la.sh, lb.sh))), 6) AS jacc
        FROM cand c
        JOIN keyed la ON la.doc_id = c.left_id
        JOIN keyed lb ON lb.doc_id = c.right_id
    ) WHERE jacc >= {_ER_THRESHOLD}
    """,
    doc="Cross-dataset record linkage by multi-pass SORTED-NEIGHBORHOOD "
    "blocking (Hernandez & Stolfo): the corpus is split into two sides "
    "(doc_id parity — standing in for two source databases), every record "
    "gets two cheap sort keys (leading and trailing token bigram), each "
    "pass globally ranks records by its key via the two-phase prefix scan "
    "(NO single-partition window) and window-joins rank to rank+offset "
    "(equi-join on exploded offsets 1..w — candidates are exactly n*w per "
    "pass, data-independent, unlike hot LSH bands), passes union, and "
    "cross-side candidates are verified by 3-gram shingle Jaccard over "
    "the h32-hashed universe (the dedup-family convention). "
    "The oracle re-derives both sort orders with row_number() and a range "
    "self-join — the engine plan must produce the identical candidate "
    "universe and verdicts.",
    tags=("er", "dedup", "blocking", "extension", "custom-operator"),
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators.er import sorted_neighborhood_candidates

    keyed = _keyed_shingles(spark, sf_dir)
    if keyed.isEmpty():  # schema-stable empty result
        return spark.createDataFrame([], "left_id long, right_id long, jacc double")
    records = keyed.withColumn("side", F.col("rec_id") % 2)
    cand = sorted_neighborhood_candidates(
        records, keys=["k1", "k2"], window=_ER_WINDOW, cross_side_only=True
    ).select(F.col("a_id").alias("left_id"), F.col("b_id").alias("right_id"))
    return _verify_jaccard(cand, keyed, "left_id", "right_id")


@register(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, {_TOKENS_SQL} AS tok FROM documents)
        WHERE len(tok) >= 3
    ),
    keyed AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tok) - 1),
                   i -> {_H32_SHINGLE})) AS sh,
               concat_ws(' ', tok[1], tok[2]) AS k1,
               concat_ws(' ', tok[-2], tok[-1]) AS k2
        FROM toks
    ),
    r1 AS (SELECT doc_id, row_number() OVER (ORDER BY k1, doc_id) - 1 AS rk
           FROM keyed),
    r2 AS (SELECT doc_id, row_number() OVER (ORDER BY k2, doc_id) - 1 AS rk
           FROM keyed),
    cand AS (
        SELECT DISTINCT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b
        FROM (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM r1 a JOIN r1 b ON b.rk BETWEEN a.rk + 1 AND a.rk + {_ER_WINDOW}
            UNION ALL
            SELECT a.doc_id, b.doc_id
            FROM r2 a JOIN r2 b ON b.rk BETWEEN a.rk + 1 AND a.rk + {_ER_WINDOW}
        ) p(da, db)
        WHERE da <> db
    )
    SELECT doc_a, doc_b, jacc FROM (
        SELECT c.doc_a, c.doc_b,
               ROUND(CAST(len(list_intersect(la.sh, lb.sh)) AS DOUBLE)
                     / (len(la.sh) + len(lb.sh)
                        - len(list_intersect(la.sh, lb.sh))), 6) AS jacc
        FROM cand c
        JOIN keyed la ON la.doc_id = c.doc_a
        JOIN keyed lb ON lb.doc_id = c.doc_b
    ) WHERE jacc >= {_ER_THRESHOLD}
    """,
    doc="WITHIN-corpus near-dup discovery by the same multi-pass "
    "sorted-neighborhood blocking as er_sorted_neighborhood "
    "(operators/er.py, cross_side_only=False) — the dedup family's "
    "skew-safe member: MinHash/SimHash band volume degrades on hot bands "
    "(a band shared by d docs fans out d^2 candidate rows), SNM's "
    "candidate count is EXACTLY n*w per pass no matter how the blocking "
    "keys distribute. The trade is recall-by-construction (LSH) vs "
    "volume-by-construction (SNM): production pipelines run SNM when the "
    "corpus has adversarial/hot key regions. Verification is the same "
    "h32-hashed 3-gram shingle Jaccard at the same 0.2 threshold, so this "
    "entry's pairs are directly comparable to dedup_ngram_jaccard's "
    "(SNM finds the subset whose members sort near each other — the "
    "window is the recall knob).",
    tags=("dedup", "er", "blocking", "extension", "custom-operator"),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.operators.er import sorted_neighborhood_candidates

    keyed = _keyed_shingles(spark, sf_dir)
    if keyed.isEmpty():  # schema-stable empty result
        return spark.createDataFrame([], "doc_a long, doc_b long, jacc double")
    records = keyed.withColumn("side", F.lit(0))  # one corpus: constant side
    cand = sorted_neighborhood_candidates(
        records, keys=["k1", "k2"], window=_ER_WINDOW, cross_side_only=False
    ).select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    return _verify_jaccard(cand, keyed, "doc_a", "doc_b")
