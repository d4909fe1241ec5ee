"""Pipeline observability without extra passes: df.observe collects named
metrics DURING the real action (one scan — the way a 100 TB materialization
reports its own row counts / quality tallies), and stat.freqItems bounds
heavy hitters without a full groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_ruby_spark.sources import load_table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    from pyspark.sql import Observation

    obs = Observation("corpus_stats")
    docs = load_table(spark, sf_dir, "documents")
    out = (
        docs.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum("n_chars").alias("chars_in"),
        )
        .filter(F.col("n_chars") > 100)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    kept = sum(r.n for r in out.collect())  # the one real action
    got = obs.get
    assert got["n_in"] == docs.count()
    assert got["chars_in"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert kept <= got["n_in"]


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    support = 0.15
    approx = set(
        ev.stat.freqItems(["event_type"], support).collect()[0][0]
    )
    n = ev.count()
    exact = {
        r.event_type
        for r in ev.groupBy("event_type").count().filter(F.col("count") > n * support).collect()
    }
    # freqItems guarantees a SUPERSET of items above the support threshold
    assert exact <= approx, (exact, approx)
