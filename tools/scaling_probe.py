"""Scaling probe: run representative headline shapes at 1x/4x/16x the sf0.1
row count (unioned scans of the same parquet — real I/O and compute, same
plans) and report wall time per scale. The point is the SHAPE of the curve:
fixed overhead should dominate at 1x and amortize toward linear-in-rows cost
by 16x, which is the behavior that extrapolates to a 1000-executor cluster.

Usage: python tools/scaling_probe.py   (writes one JSON line to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _scaled(df: DataFrame, k: int) -> DataFrame:
    return reduce(DataFrame.union, [df] * k)


def main() -> int:
    from map_reduce_ruby_spark.functions import dsum
    from map_reduce_ruby_spark.session import get_spark
    from map_reduce_ruby_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scaling_probe")
    li0 = load_table(spark, sf_dir, "lineitem")
    ev0 = load_table(spark, sf_dir, "events")
    dc0 = load_table(spark, sf_dir, "documents")

    def q_agg(li):  # q1 shape: scan-filter-8-aggregate
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
        )

    def q_join(li):  # q18 shape: self-agg + semi join + re-agg
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
            .filter(F.col("qty") > 250)
        )
        return (
            li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_window(ev):  # sessionize shape: window over user partitions
        w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        gap = F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > 600_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0)
        return (
            ev.select("user_id", "ts_us", "event_id")
            .withColumn("new_s", gap)
            .groupBy("user_id")
            .agg(F.sum("new_s").alias("n_sessions"))
        )

    def _scaled_docs(df, k):
        # copy-tagged union: WITHOUT the tag, every gram in copy i collides
        # with its twin in copy j, so at x4/x16 the cnt>=2 filter passes
        # nearly all rows and the ratio measures a selectivity jump, not
        # amortization. Tagging keeps per-copy duplication selectivity equal
        # to the x1 run (rows scale, per-row work and filter rate do not).
        return reduce(
            DataFrame.union,
            [df.withColumn("copy", F.lit(i)) for i in range(k)],
        )

    def q_dedup(docs):  # span-dedup shape: gram explode -> gram-hash shuffle
        # -> per-doc island window (the dedup family's scale signature)
        from map_reduce_ruby_spark.functions import h32

        tok = F.filter(F.split("text", r"\s+"), lambda w: w != "")
        base = docs.select("copy", "doc_id", tok.alias("tok"))
        idx = F.when(
            F.size("tok") >= 5, F.sequence(F.lit(1), F.size("tok") - 4)
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        gram = F.expr(
            "concat_ws(' ', "
            + ", ".join(f"element_at(tok, pos + {j})" for j in range(5))
            + ")"
        )
        g = base.select("copy", "doc_id", F.explode(idx).alias("pos"), "tok").select(
            "copy",
            "doc_id",
            "pos",
            h32(F.concat(F.col("copy").cast("string"), F.lit(":"), gram)).alias("gh"),
        )
        d = g.withColumn("cnt", F.count(F.lit(1)).over(W.partitionBy("gh")))
        return (
            d.filter(F.col("cnt") >= 2)
            .withColumn(
                "grp",
                F.col("pos")
                - F.row_number().over(
                    W.partitionBy("copy", "doc_id").orderBy("pos")
                ),
            )
            .groupBy("copy", "doc_id", "grp")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_triangle(li):  # graph shape: degree-oriented wedge join + closing
        # edge probe (graph_triangle_count's skeleton) over an edge list
        # derived from lineitem keys. copy-tagging (via the caller) keeps
        # per-copy graph density scale-invariant: nodes are namespaced per
        # copy, so 16x rows = 16 disjoint copies of the x1 graph, and the
        # wedge fan-out per node stays constant while total work scales.
        n_nodes = 50_000
        e = (
            li.select(
                "copy",
                (F.col("l_orderkey") % n_nodes).alias("p"),
                (F.col("l_partkey") % n_nodes).alias("q"),
            )
            .filter(F.col("p") != F.col("q"))
            .select(
                "copy", F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
            )
            .distinct()
        )
        und = e.unionByName(
            e.select("copy", F.col("b").alias("a"), F.col("a").alias("b"))
        )
        deg = und.groupBy("copy", F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        da = deg.select("copy", F.col("node").alias("a"), F.col("deg").alias("da"))
        db = deg.select("copy", F.col("node").alias("b"), F.col("deg").alias("db"))
        ranked = e.join(da, ["copy", "a"]).join(db, ["copy", "b"])
        lower = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
        oe = ranked.select(
            "copy",
            F.when(lower, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        wedges = (
            oe.select("copy", "u", F.col("v").alias("y"))
            .join(oe.select("copy", "u", F.col("v").alias("z")), ["copy", "u"])
            .filter(F.col("y") < F.col("z"))
        )
        closing = e.select(
            F.col("copy").alias("ccopy"),
            F.col("a").alias("lo"),
            F.col("b").alias("hi"),
        )
        tri = wedges.join(
            closing,
            (F.col("copy") == F.col("ccopy"))
            & (F.least("y", "z") == F.col("lo"))
            & (F.greatest("y", "z") == F.col("hi")),
        )
        return tri.groupBy("copy").agg(F.count(F.lit(1)).alias("n_tri"))

    results = {}
    for k in (1, 4, 16):
        li, ev, dc = _scaled(li0, k), _scaled(ev0, k), _scaled_docs(dc0, k)
        lit = _scaled_docs(li0, k)  # copy-tagged (graph shape)
        for name, frame in (
            ("agg", q_agg(li)),
            ("semi_join", q_join(li)),
            ("window", q_window(ev)),
            ("dedup_span", q_dedup(dc)),
            ("triangle", q_triangle(lit)),
        ):
            frame.count()  # warm
            t0 = time.perf_counter()
            frame.count()
            results[f"{name}_x{k}"] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "scaling_probe",
        "base_rows": {"lineitem": li0.count(), "events": ev0.count()},
        "times_s": results,
        "amortization": {
            name: round(results[f"{name}_x16"] / max(results[f"{name}_x1"], 1e-9), 2)
            for name in ("agg", "semi_join", "window", "dedup_span", "triangle")
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
