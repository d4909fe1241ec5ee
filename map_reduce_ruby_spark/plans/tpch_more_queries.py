"""Deeper TPC-H coverage: Q8, Q10, Q13, Q14, Q15, Q18 and adapted
Q2/Q9/Q11/Q12/Q16/Q20/Q21/Q22.

The reference implements no relational operators (SURVEY.md §2.2) — these are
the Spark-native capability surface. The driver fixtures (FIXTURES.md §B)
have no ``partsupp`` table and no ``l_shipmode``/``l_commitdate``/
``l_receiptdate``/``c_phone`` columns, so the queries that need them keep
their OPERATOR SHAPE (groupwise-min join-back, fraction-of-global-total
HAVING, only-late-supplier exists/not-exists, ...) with adapted semantics:
the part-supplier relation is derived from lineitem, supply cost from
min sale price, lateness from ship-vs-order-date delay. Each docstring names
its adaptation.

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
           ROUND(CAST(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume
                                ELSE CAST(0 AS DECIMAL(18,6)) END) AS STRING) AS DOUBLE)
                 / CAST(CAST(SUM(volume) AS STRING) AS DOUBLE), 6) AS mkt_share
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
    SELECT ROUND(100.00 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST({_REVENUE_SQL} AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS STRING) AS DOUBLE)
                 / CAST(CAST(SUM(CAST({_REVENUE_SQL} AS DECIMAL(18,6))) AS STRING) AS DOUBLE),
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
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_qty
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
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
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


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
        SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, supply_cost,
               MIN(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM ps
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
          AND r_name = 'ASIA'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
    FROM cand WHERE supply_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier), adapted: no partsupp table "
    "in the fixtures, so the part-supplier relation is derived from lineitem "
    "and supply cost is each supplier's MIN sale price for the part (MIN is "
    "exact — no float-sum ambiguity). The shape is intact: regional "
    "dimension filter, groupwise-min per part, join-back keeping ties, "
    "deterministic top-100. Scale: the groupwise min is a window PARTITIONED "
    "by p_partkey (no global window); the ps aggregate and the window "
    "shuffle on the same key.",
    tags=("join", "window", "groupwise-min", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cand = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name", "supply_cost")
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
                         - (0.1 * p_retailprice * l_quantity)
                    AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
    """,
    doc="TPC-H Q9 shape (product-type profit), adapted: ps_supplycost does "
    "not exist, so cost is the synthetic 0.1 * p_retailprice per unit — the "
    "aggregate structure (revenue minus cost per line, grouped by supplier "
    "nation x order year, part-name LIKE filter) is unchanged. Scale: the "
    "LIKE filter prunes via the broadcast part join before the single "
    "orders shuffle; profit terms are per-row double math cast to DECIMAL "
    "for the order-independent sum.",
    tags=("join", "star", "aggregate"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey AS ps_partkey,
               SUM(CAST(l_quantity * p_retailprice AS DECIMAL(18,6))) AS value_dec
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT ps_partkey, CAST(CAST(value_dec AS STRING) AS DOUBLE) AS stock_value
    FROM val
    WHERE CAST(CAST(value_dec AS STRING) AS DOUBLE)
          > (SELECT CAST(CAST(SUM(value_dec) AS STRING) AS DOUBLE) FROM val)
            / 1000.0
    """,
    doc="TPC-H Q11 shape (important stock identification), adapted: stock "
    "value per part is SUM(l_quantity * p_retailprice) over one nation's "
    "suppliers' lineitems (partsupp stand-in). The defining shape — keep "
    "groups whose value exceeds a FRACTION OF THE GLOBAL TOTAL (uncorrelated "
    "scalar aggregate over the same aggregate) — is intact. Scale: the "
    "global total is a whole-frame window over the per-part aggregate "
    "(part-cardinality, dimension-sized at every SF — the q15 pattern), so "
    "no second scan and no driver round-trip.",
    tags=("join", "aggregate", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum((F.col("l_quantity") * F.col("p_retailprice")).cast(_DEC)).alias("value_dec"))
    )
    total = F.sum("value_dec").over(W.partitionBy(F.lit(1)))
    return (
        val.withColumn("total_dec", total)
        .filter(F.col("value_dec").cast("double") > F.col("total_dec").cast("double") / 1000.0)
        .select("ps_partkey", F.col("value_dec").cast("double").alias("stock_value"))
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 60 THEN 'SLOW'
                WHEN date_diff('day', o_orderdate, l_shipdate) >= 14 THEN 'REGULAR'
                ELSE 'FAST' END AS ship_speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_speed
    """,
    doc="TPC-H Q12 shape (shipping priority by mode), adapted: l_shipmode/"
    "l_commitdate/l_receiptdate don't exist, so lines are classified by "
    "ship-delay buckets (days between order and ship date). The shape — "
    "two-table join, CASE bucketing, paired conditional counts per bucket — "
    "is intact. Scale: the year predicate pushes to the lineitem scan; one "
    "shuffle on orderkey; 3-row result.",
    tags=("join", "aggregate", "case"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(delay >= 60, "SLOW").when(delay >= 14, "REGULAR").otherwise("FAST")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship), adapted: the "
    "part-supplier pairs come from DISTINCT lineitem (no partsupp), and the "
    "excluded-supplier subquery ('complaints') is suppliers with negative "
    "account balance. The shape — negated attribute filters, IN-list on "
    "size, NOT IN anti-join against a subquery, COUNT(DISTINCT supplier) "
    "per attribute triple — is intact. Scale: the NOT IN side is "
    "supplier-dimension-sized (broadcast anti join); the distinct pair "
    "projection and the count-distinct shuffle on the same keys.",
    tags=("join", "anti", "distinct", "aggregate"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad_supp), ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY l_partkey, l_suppkey
    ),
    dominant AS (
        SELECT DISTINCT l_suppkey FROM (
            SELECT l_suppkey, CAST(CAST(qty AS STRING) AS DOUBLE) AS q,
                   CAST(CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS STRING)
                        AS DOUBLE) AS tot
            FROM shipped
        ) WHERE q > 0.3 * tot
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (suppliers with excess stock), adapted: without "
    "partsupp/availqty, a supplier qualifies when their 1996 shipped "
    "quantity of a 'red%' part exceeds 30% of that part's total 1996 "
    "shipments (the availqty-vs-half-demand comparison re-expressed on "
    "shippable data). The nested-subquery chain — part-name IN, per-(part, "
    "supplier) aggregate vs per-part total, semi-join into the regional "
    "supplier list — is intact. Scale: part filter broadcasts into the "
    "lineitem scan; per-part total is a window over the already-aggregated "
    "(part,supplier) rows; final semi join is supplier-dimension-sized.",
    tags=("join", "semi", "subquery", "window"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    shipped = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )
    w = W.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("tot", F.sum("qty").over(w))
        .filter(F.col("qty").cast("double") > 0.3 * F.col("tot").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(dominant), supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_orders",
    oracle="""
    WITH lo AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                    THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
        FROM lo GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (
        SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
        FROM lo
        JOIN per_order USING (l_orderkey)
        WHERE lo.late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
    ) sole_late
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting) — the hardest "
    "TPC-H pattern: EXISTS(another supplier on the order) AND NOT "
    "EXISTS(another LATE supplier). Adapted: late = shipped more than 90 "
    "days after the order date (no l_commitdate/receiptdate). Re-expressed "
    "as one per-order aggregate (distinct suppliers, distinct late "
    "suppliers) joined back — the exists/not-exists pair collapses into "
    "n_supp > 1 AND n_late = 1, counting DISTINCT (order, supplier) pairs. "
    "Scale: ONE shuffle on orderkey serves the lo join, the per-order "
    "aggregate, and the join-back (same key); the supplier/nation joins "
    "broadcast; top-100 is TakeOrderedAndProject.",
    tags=("join", "exists", "aggregate", "topk"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .cast("int")
        .alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late"),
    )
    sole_late = (
        lo.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
