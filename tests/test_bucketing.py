"""Bucketed tables: the join and aggregation on the bucket key must run with
ZERO exchanges — the write-time shuffle is reused by every query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators.bucketing import write_bucketed
from map_reduce_ruby_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", 8, str(base / "o")
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey", 8, str(base / "l")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    # At this SF Spark would rather broadcast the small side (also shuffle-
    # free, "Bucketed: false (disabled by query planner)"); disable broadcast
    # to exercise the layout that matters when BOTH sides are fact-sized.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        ).select("l_orderkey", "o_custkey", "l_quantity")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # the bucketed-scan SMJ must also produce the RIGHT rows (the
        # count-parity test below runs under the broadcast plan, so this is
        # the only place the aligned-bucket read path is value-checked)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        assert len(rows) == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    bucketed_count = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain_count = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert bucketed_count == plain_count


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_write_bucketed_keeps_winner_and_attaches(spark, sf_dir, tmp_path):
    """write_bucketed must follow the reader-safe lifecycle: a second
    build over the same completed path (a sibling process cold-starting)
    discards its staging copy and ATTACHES the winner's files — never an
    overwrite that deletes live files under the sibling's readers."""
    import os

    from map_reduce_ruby_spark.operators.bucketing import register_bucketed

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "ob")
    write_bucketed(orders, "orders_kw1", "o_orderkey", 8, path)
    files = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    want = spark.table("orders_kw1").count()

    write_bucketed(orders, "orders_kw2", "o_orderkey", 8, path)  # "loser"
    after = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert after == files, "loser must attach, never rewrite, the winner"
    assert spark.table("orders_kw2").count() == want

    # fresh-process attach from the sidecar alone recreates the exact
    # layout: the bucketed groupBy stays exchange-free
    spark.sql("DROP TABLE orders_kw1")
    register_bucketed(spark, "orders_kw1", path)
    agg = spark.table("orders_kw1").groupBy("o_orderkey").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    spark.sql("DROP TABLE orders_kw1")
    spark.sql("DROP TABLE orders_kw2")


def test_write_bucketed_replaces_sidecarless_legacy_dir(spark, sf_dir, tmp_path):
    """A directory with _SUCCESS but NO layout sidecar is a legacy/torn
    artifact: keep-winner must REPLACE it. Keeping it would discard the
    fresh staging copy and then fail register_bucketed's hard sidecar
    requirement — losing both the old data and the new build."""
    import os

    from map_reduce_ruby_spark.operators.bucketing import _LAYOUT_SPEC

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "legacy")
    os.makedirs(path)
    open(os.path.join(path, "_SUCCESS"), "w").close()
    write_bucketed(orders, "orders_legacy", "o_orderkey", 8, path)
    assert os.path.exists(os.path.join(path, _LAYOUT_SPEC))
    assert spark.table("orders_legacy").count() == orders.count()
    spark.sql("DROP TABLE orders_legacy")


def test_write_bucketed_raises_on_layout_mismatch(spark, sf_dir, tmp_path):
    """Keep-winner attach with a DIFFERENT requested layout must raise:
    silently handing back the winner's layout when the caller asked for
    another bucket count is exactly the co-located-join corruption the
    sidecar exists to prevent."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "mm")
    write_bucketed(orders, "orders_mm1", "o_orderkey", 8, path)
    with pytest.raises(ValueError, match="different"):
        write_bucketed(orders, "orders_mm2", "o_orderkey", 4, path)
    # the winner's files and registration survive the refused build
    assert spark.table("orders_mm1").count() == orders.count()
    spark.sql("DROP TABLE orders_mm1")


def test_register_bucketed_raises_on_bad_sidecar(spark, sf_dir, tmp_path):
    import os

    import pytest

    from map_reduce_ruby_spark.operators.bucketing import (
        _LAYOUT_SPEC,
        register_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "ob2")
    write_bucketed(orders, "orders_sc", "o_orderkey", 8, path)
    spark.sql("DROP TABLE orders_sc")
    spec = os.path.join(path, _LAYOUT_SPEC)
    with open(spec, "w", encoding="utf-8") as f:
        f.write("{broken")
    with pytest.raises(ValueError, match="corrupt"):
        register_bucketed(spark, "orders_sc", path)
    os.remove(spec)
    with pytest.raises(FileNotFoundError, match="not a published"):
        register_bucketed(spark, "orders_sc", path)
