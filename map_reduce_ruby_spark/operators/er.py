"""Sorted-neighborhood record linkage as a reusable operator.

``sorted_neighborhood_candidates`` is the blocking half of entity
resolution (Hernandez & Stolfo, SIGMOD'95): records from two sides are
globally sorted by each blocking key, and every record is paired with its
``window`` nearest neighbors in that order. Multi-pass (several keys)
unions the per-pass candidates. The caller supplies the verify metric —
the catalog entry (plans/er_queries.py) uses 3-gram shingle Jaccard; any
pairwise similarity over the candidate table works.

Guarantees that make it 100 TB-shaped:

- Candidate volume is EXACTLY n*window per pass, independent of the key
  distribution — the worst-case-safe alternative to LSH banding, whose
  hot buckets fan out quadratically on skewed keys.
- The global rank comes from the two-phase prefix scan
  (operators/prefix_sum.py): per-bucket totals collected once (bounded
  by distinct leading bytes of the key), windows only WITHIN buckets —
  never Spark's single-partition global window.
- The neighbor pairing is an equi-join on rank+offset (offsets exploded
  1..window) — no range join, no BroadcastNestedLoopJoin.

The default bucket is the key's first UTF-8 BYTE (binary(1)), which
orders consistently with the full string for EVERY string domain: Spark
compares strings by unsigned UTF-8 bytes (UTF8String.compareTo), and a
byte-wise prefix is monotone in that order — ASCII, multi-byte unicode,
and empty keys all bucket correctly (pinned by a hypothesis property
test with unicode keys). ``bucket_fn`` remains available as an
OPTIMIZATION (e.g. wider prefixes for corpora whose keys share a first
byte), not a correctness obligation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from map_reduce_ruby_spark.materialize import truncate


def _global_rank(
    records: DataFrame, key: str, bucket_fn: Callable[[Column], Column] | None
) -> DataFrame:
    from map_reduce_ruby_spark.operators.prefix_sum import exclusive_prefix_sum

    # Default bucket: the key's first UTF-8 byte. Spark orders strings by
    # unsigned UTF-8 bytes, so a 1-byte binary prefix is a monotone
    # coarsening of the key order for ANY string (the previous
    # ascii(substring(k,1,1)) default returned the first CODEPOINT, whose
    # int ordering also matches — but only for keys it could represent;
    # the byte prefix needs no domain caveat at all).
    bucket = (
        bucket_fn(F.col("__k"))
        if bucket_fn is not None
        else F.substring(F.encode(F.col("__k"), "UTF-8"), 1, 1)
    )
    ranked = exclusive_prefix_sum(
        records.select(
            "rec_id", "side", F.col(key).alias("__k"), F.lit(1).alias("__one")
        ),
        "__one",
        ["__k", "rec_id"],
        bucket,
        out_col="rk",
    )
    return ranked.select("rec_id", "side", "rk")


def sorted_neighborhood_candidates(
    records: DataFrame,
    keys: list[str],
    window: int,
    cross_side_only: bool = True,
    bucket_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Candidate pairs (a_id, b_id) from multi-pass sorted-neighborhood
    blocking over ``records`` (rec_id, side, <key columns>). For each key
    in ``keys``, records are globally ordered by (key, rec_id) and each
    record pairs with its next ``window`` neighbors; passes union and
    pairs dedupe. With ``cross_side_only`` (record linkage) only pairs
    whose sides differ survive, canonicalized as (side-0 id, side-1 id);
    without it (within-corpus dedup) pairs are canonicalized a_id < b_id.
    """
    if not keys:
        raise ValueError(
            "sorted_neighborhood_candidates needs at least one blocking key"
        )
    if int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    per_pass = []
    for key in keys:
        # Both join sides below consume the ranked table; without
        # materialization each side re-runs the full rank derivation —
        # the per-bucket window SORT over every record, the dominant
        # per-pass cost — twice. One LAZY checkpoint of the narrow
        # (rec_id, side, rk) table halves that: both sides fuse into the
        # pass's first consuming job (one path computes+stores each
        # partition, the other reads the blocks), with no separate
        # materialization job — the round-11 fixed-cost trim (round 10's
        # eager form paid one extra job per pass per invocation).
        ranked = truncate(_global_rank(records, key, bucket_fn))
        # two selects: materialize the exploded offset FIRST, then compute
        # rk_b from it — a single select computing (rk + off) alongside the
        # explode that defines 'off' resolves only through the analyzer's
        # Generate extraction, which is undocumented, version-sensitive
        # behavior
        left = ranked.select(
            F.col("rec_id").alias("da"), F.col("side").alias("sa"),
            F.col("rk"),
            F.explode(F.sequence(F.lit(1), F.lit(window))).alias("off"),
        ).select("da", "sa", (F.col("rk") + F.col("off")).alias("rk_b"))
        right = ranked.select(
            F.col("rec_id").alias("db"), F.col("side").alias("sb"),
            F.col("rk").alias("rk_b"),
        )
        # SHUFFLE_HASH on the un-exploded side: the left side is n*window
        # exploded rows and SortMergeJoin would sort it per task; hash-
        # building the n-row ranked side (narrow (rec_id, side, rk) rows)
        # and streaming the exploded side never sorts either input.
        per_pass.append(
            left.join(right.hint("SHUFFLE_HASH"), "rk_b")
            .select("da", "sa", "db", "sb")
        )
    pairs = per_pass[0]
    for p in per_pass[1:]:
        pairs = pairs.unionAll(p)
    if cross_side_only:
        pairs = pairs.filter(F.col("sa") != F.col("sb")).select(
            F.when(F.col("sa") == 0, F.col("da")).otherwise(F.col("db")).alias("a_id"),
            F.when(F.col("sa") == 0, F.col("db")).otherwise(F.col("da")).alias("b_id"),
        )
    else:
        pairs = pairs.select(
            F.least("da", "db").alias("a_id"), F.greatest("da", "db").alias("b_id")
        ).filter(F.col("a_id") != F.col("b_id"))
    return pairs.distinct()
