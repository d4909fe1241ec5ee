"""Bucketed range join: correctness vs a brute-force cross-join BETWEEN, plus
plan shape (the whole point of the operator is that it compiles to an
equi-join on the bin key, not a BroadcastNestedLoopJoin)."""

from __future__ import annotations

import pytest

from map_reduce_ruby_spark.operators import range_join


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [(i, i * 7 % 103) for i in range(200)], ["pid", "x"]
    )
    # Overlapping intervals of mixed widths, some empty, some spanning bins.
    intervals = spark.createDataFrame(
        [(j, j * 11 % 90, j * 11 % 90 + (j % 5) * 13) for j in range(40)],
        ["iid", "lo", "hi"],
    )
    return points, intervals


def _pairs(df):
    return {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}


def test_matches_bruteforce(spark, sides):
    points, intervals = sides
    got = range_join(points, intervals, "x", "lo", "hi", bin_width=10)
    expected = points.join(
        intervals, points.x.between(intervals.lo, intervals.hi)
    )
    assert _pairs(got) == _pairs(expected)
    # Carries every column from both sides, no helper column leaks.
    assert set(got.columns) == {"pid", "x", "iid", "lo", "hi"}


def test_bin_width_one_and_huge(spark, sides):
    points, intervals = sides
    expected = _pairs(
        points.join(intervals, points.x.between(intervals.lo, intervals.hi))
    )
    assert _pairs(range_join(points, intervals, "x", "lo", "hi", 1)) == expected
    assert _pairs(range_join(points, intervals, "x", "lo", "hi", 10_000)) == expected


def test_inclusive_bounds_and_negative_values(spark):
    points = spark.createDataFrame([(1, -5), (2, 0), (3, 5)], ["pid", "x"])
    intervals = spark.createDataFrame([(10, -5, 5)], ["iid", "lo", "hi"])
    got = _pairs(range_join(points, intervals, "x", "lo", "hi", 4))
    assert got == {(1, 10), (2, 10), (3, 10)}


def test_rejects_bad_args(spark, sides):
    points, intervals = sides
    with pytest.raises(ValueError, match="bin_width"):
        range_join(points, intervals, "x", "lo", "hi", 0)
    with pytest.raises(ValueError, match="collision"):
        range_join(points, points, "x", "pid", "x", 8)


def test_plan_is_equi_join_not_nested_loop(spark, sides):
    points, intervals = sides
    plan = range_join(
        points, intervals, "x", "lo", "hi", 10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Join" in plan


# --- salted_join (operators/skew.py) ----------------------------------------


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from map_reduce_ruby_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key — the salted path must still return
    # exactly the plain join's multiset.
    fact = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 7, i * 1.5) for i in range(1000)],
        ["rid", "k", "v"],
    )
    dim = spark.createDataFrame([(k, f"dim{k}") for k in range(7)], ["k", "label"])
    plain = fact.join(dim, ["k"]).select("rid", "k", "label")
    salted = salted_join(fact, dim, ["k"], salt_buckets=8).select("rid", "k", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_misses_once(spark):
    from map_reduce_ruby_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 10), (2, 99)], ["rid", "k"])
    dim = spark.createDataFrame([(10, "hit")], ["k", "label"])
    got = sorted(map(tuple, salted_join(fact, dim, ["k"], 4, "left")
                 .select("rid", "k", "label").collect()))
    assert got == [(1, 10, "hit"), (2, 99, None)]


def test_salted_join_rejects_unsupported(spark):
    import pytest as _pytest

    from map_reduce_ruby_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 1)], ["k", "v"])
    dim = spark.createDataFrame([(1, 2)], ["k", "w"])
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(df, dim, ["k"], 4, "full")
    with _pytest.raises(ValueError, match="collision"):
        salted_join(df, df, ["k"], 4)
