"""DataFrame adapter: fast-path plan purity, custom-fold semantics, errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.core import pairs_df, reduce_by_key


def test_fastpath_plan_has_no_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.lit(1).cast("long").alias("n")
    )
    out = reduce_by_key(li, keys=["l_returnflag"], values={"n": "sum"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan, plan


def test_custom_fold_uses_pandas_group_path(spark):
    df = spark.createDataFrame([("a", 1), ("a", 5), ("b", 2)], ["k", "v"])
    out = reduce_by_key(df, keys=["k"], values={"v": lambda key, a, b: a * 10 + b})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan
    got = {r.k: r.v for r in out.collect()}
    assert got["b"] == 2
    # pairwise left-to-right within the group: 1*10+5 or 5*10+1 depending on
    # arrival order — both encode "fold actually ran" for this non-commutative
    # probe; real folds must be associative+commutative per the contract.
    assert got["a"] in (15, 51)


def test_mixed_primitive_and_custom(spark):
    df = spark.createDataFrame([("a", 1, 1), ("a", 5, 1)], ["k", "v", "n"])
    out = reduce_by_key(df, keys=["k"], values={"v": lambda k, a, b: max(a, b), "n": "sum"})
    (row,) = out.collect()
    assert (row.v, row.n) == (5, 2)


def test_unknown_primitive_raises(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError, match="unknown primitive"):
        reduce_by_key(df, keys=["k"], values={"v": "median"})


def test_pairs_df_struct_view(spark):
    df = spark.createDataFrame([("a", "F", 3.0)], ["flag", "status", "qty"])
    out = pairs_df(df, key_cols=["flag", "status"], value_cols=["qty"])
    assert out.columns == ["key", "value"]
    (row,) = out.collect()
    assert (row.key.flag, row.key.status, row.value.qty) == ("a", "F", 3.0)
