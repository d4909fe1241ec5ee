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
