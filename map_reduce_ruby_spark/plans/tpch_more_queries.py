"""Deeper TPC-H coverage: Q8, Q10, Q13, Q14, Q15, Q18 and an adapted Q22.

The reference implements no relational operators (SURVEY.md §2.2) — these are
the Spark-native capability surface. Queries needing ``partsupp``,
``l_shipmode``, ``l_commitdate`` or ``c_phone`` (Q2/9/11/12/16/20/21, literal
Q22) are out of scope: those columns don't exist in the driver fixtures
(FIXTURES.md §B), so the shapes are adapted where possible and skipped where
not.

Determinism: every money sum runs in DECIMAL(18,6) (functions/exact.py);
every ratio divides two exact decimal sums as DOUBLE and ROUNDs to 6dp on
both engines before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import dsum, dsum_sql
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

_REVENUE_SQL = "l_extendedprice * (1 - l_discount)"
_DEC = "decimal(18,6)"


def _revenue() -> "F.Column":
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume
                                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST({_REVENUE_SQL} AS DECIMAL(18,6)) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 8-table star join with a "
    "conditional-share aggregate, supplier nation vs customer region. All six "
    "dimension joins broadcast; lineitem->orders is the only shuffled join. "
    "Share = decimal conditional sum / decimal total, rounded to 6dp. "
    "Scale: the fact table is filtered by the broadcast part(p_type) join "
    "before the orders shuffle, so shuffle volume is ~1/6 of lineitem.",
    tags=("join", "star", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    all_nations = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _revenue().cast(_DEC).alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return all_nations.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum_sql(_REVENUE_SQL, 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): date-sliced orders join "
    "return-flagged lineitem, grouped per customer, deterministic top-20 "
    "(revenue DESC, c_custkey tie-break). Scale: l_returnflag and o_orderdate "
    "predicates push to the parquet scans; customer/nation broadcast; top-20 "
    "is TakeOrderedAndProject, never a global sort.",
    tags=("join", "aggregate", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left outer join "
    "with an extra non-key predicate (customers with zero matching orders "
    "count as 0), then a second aggregation over the counts. Scale: the "
    "outer join shuffles on custkey once; the histogram re-aggregation "
    "carries at most a few hundred distinct counts.",
    tags=("join", "outer", "aggregate"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST({_REVENUE_SQL} AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST({_REVENUE_SQL} AS DECIMAL(18,6))) AS DOUBLE),
                 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14 shape (promotion effect): single broadcast join + global "
    "conditional-ratio aggregate -> one row. Both the conditional and total "
    "revenue sums run in DECIMAL; one double division rounded to 6dp. "
    "Scale: no shuffle at all beyond the 1-row final aggregate (partial "
    "aggregation happens map-side under the broadcast join).",
    tags=("join", "broadcast", "aggregate"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue().cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql(_REVENUE_SQL, 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly per-supplier revenue view, "
    "then select the max-revenue supplier(s) — ties kept, exactly the TPC-H "
    "semantics. The scalar max is computed with a whole-frame window over the "
    "per-supplier aggregate (cardinality = #suppliers, dimension-sized at "
    "every SF), so no driver round-trip and no second scan of lineitem.",
    tags=("join", "aggregate", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_revenue(), "total_revenue")
    )
    # revenue0 is supplier-cardinality (tiny): a whole-frame window max is a
    # single-partition pass over dimension-sized data, not a fact-table sort.
    with_max = revenue0.withColumn(
        "max_revenue", F.max("total_revenue").over(W.partitionBy(F.lit(1)))
    ).filter(F.col("total_revenue") == F.col("max_revenue"))
    return (
        F.broadcast(with_max)
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): HAVING-filtered semi-join "
    "back onto the fact table, per-order re-aggregation, deterministic "
    "top-100. Scale: the HAVING aggregate and the semi-join shuffle on the "
    "same key (l_orderkey), so AQE reuses the exchange; the qualifying-order "
    "set is ~1% of orders and broadcasts into the second pass.",
    tags=("join", "semi", "aggregate", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big_orders.withColumnRenamed("l_orderkey", "bo_orderkey"),
                li.l_orderkey == F.col("bo_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (global sales opportunity), adapted: c_phone doesn't "
    "exist in the fixtures, so the country bucket is c_nationkey, and "
    "'never ordered' becomes 'no orders since 2000' (the literal predicate "
    "selects zero fixture rows). Uncorrelated scalar subquery (exact-decimal "
    "average, one double division -> identical threshold on both engines) + "
    "anti join against date-filtered orders. Scale: the scalar is a 1-row "
    "broadcast cross join; the anti join shuffles only custkeys.",
    tags=("join", "anti", "subquery", "aggregate"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    # 1-row scalar broadcast: Catalyst folds any literal equi-key away, so
    # this is necessarily a (benign, O(n)) broadcast nested-loop join —
    # allow-listed in tests/test_plan_audit.py alongside tfidf_top_terms.
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
