"""Skew-aware aggregation: two-stage salted groupBy.

The reference would put each hot key on one partition and degrade
(SURVEY.md §7.4.6 — its SHA1 partitioner has no skew remedy). At 100 TB a
single hot key (one viral document, one bot user) turns a groupBy into a
straggler. The standard fix, packaged as an operator:

    stage 1: group on (key, salt)  — hot keys spread over `salt_buckets`
             reducers, each holding a partial aggregate
    stage 2: group on key          — combine `salt_buckets` partials per key

Works for any algebraic aggregate (sum/count/min/max and compositions).
AQE's skew-join handling covers JOIN skew at runtime; aggregation skew still
benefits from explicit salting because the partial/final split must be
declared in the plan. For aggregates this cheap Spark's own partial
aggregation usually suffices — salting matters when per-key state is large
(collect_list-ish, large HLL sketches) or when AQE is unavailable; the
operator exists so callers can opt in per query.

DECISION RULE (proven plan-level in tests/test_aqe_skew.py, which drives a
zipfian key through both paths and asserts SortMergeJoin(skew=true) fires):

- JOIN skew, batch, sort-merge join  -> do nothing: AQE splits the
  oversized shuffle partition at runtime (even mid-key, replicating the
  other side's matching rows). This is the default remedy; it needs no
  foresight about WHICH key is hot.
- Aggregation skew                   -> salted_agg: AQE never splits a
  groupBy key across tasks, so a hot key's aggregate state stays one
  straggler without explicit two-stage salting.
- JOIN skew where AQE can't act      -> salted_join: streaming joins,
  broadcast-hash plans pinned by hints, or AQE disabled. Also when one
  key is so hot a single post-split task would still exceed memory and
  you want the split declared deterministically in the plan.
- Caveat (plan-asserted in the test): a same-key aggregate DOWNSTREAM of
  the join suppresses AQE's split — splitting would break the
  co-partitioning the aggregate reuses, adding a shuffle AQE declines by
  default. Set spark.sql.adaptive.forceOptimizeSkewedJoin=true to accept
  that trade, or salt explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-stage aggregation over ``keys``.

    partials maps output column name -> (stage1 aggregate over raw rows,
    stage2 aggregate over stage-1 partials). E.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),        F.sum("n")),
            "tot": (F.sum("x"),               F.sum("tot")),
        })

    ``salt_from``: a deterministic column to derive the salt from (so reruns
    place rows identically); defaults to a uniform hash of all columns.
    """
    salt_src = F.col(salt_from) if salt_from else F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn("__salt", F.pmod(salt_src, F.lit(salt_buckets)))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in partials.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the SKEWED side, replicate the SMALL side.

    Each skewed row gets one deterministic salt in [0, salt_buckets); every
    small-side row is exploded into all salt_buckets copies; the join runs on
    (key..., salt), spreading one hot key over ``salt_buckets`` reducers.
    Result rows are identical to ``skewed.join(small, on, how)``.

    Use when AQE skew-split cannot help: sort-merge join with a key so hot a
    single key exceeds one task even after AQE splits (AQE splits by
    partition, salting splits WITHIN the key), or when AQE is off. Cost:
    small side shuffles salt_buckets x its size — keep the small side the
    dimension. Only inner/left joins are meaningful (the salted side keeps
    exactly one salt per row; 'right'/'full' would duplicate small-side
    misses across salts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = (set(skewed.columns) & set(small.columns)) - set(on)
    if overlap:
        raise ValueError(f"column name collision outside join keys: {sorted(overlap)}")
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
