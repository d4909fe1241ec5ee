"""Relational operator coverage: aggregation, joins (broadcast / sort-merge /
semi / anti), windows, top-k, set ops, pivot, rollup.

The reference has NO relational operators (SURVEY.md §2.2) — everything here
is the Spark-native capability surface the reference's users get by switching.
Plans are declared with the DataFrame API so Catalyst handles pushdown,
pruning and join strategy; small dimensions are broadcast explicitly.

Scale notes (100 TB posture) per query are in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import davg, davg_sql, dsum, dsum_sql
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table

_REVENUE_SQL = "l_extendedprice * (1 - l_discount)"

# Exact integer-cents factors (the fixture's measures are 2-decimal by
# construction; ROUND() of a value within 1e-9 of an integer has no
# rounding boundary to land on). DuckDB sums BIGINT into int128, matching
# Spark's decimal(38,0) sum exactly at any scale.
_EP_C_SQL = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DISC_C_SQL = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_TAX_C_SQL = "CAST(ROUND(l_tax * 100) AS BIGINT)"


def _revenue() -> "F.Column":
    # Built lazily: constructing a Column requires an active SparkContext,
    # and this module must stay importable before the session exists.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           CAST(SUM({_EP_C_SQL} * (100 - {_DISC_C_SQL})) AS DOUBLE)
               / 10000.0 AS sum_disc_price,
           CAST(SUM({_EP_C_SQL} * (100 - {_DISC_C_SQL}) * (100 + {_TAX_C_SQL}))
                AS DOUBLE) / 1000000.0 AS sum_charge,
           {davg_sql('l_quantity', 'avg_qty')},
           {davg_sql('l_extendedprice', 'avg_price')},
           {davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter-aggregate, 8 aggregates over 2 group keys. "
    "Catalyst: partial HashAggregate before the shuffle (the reference's "
    "combiner, O4, for free); parquet filter pushdown on l_shipdate. "
    "Scale: group cardinality is tiny (6), so the shuffle carries only "
    "partial aggregates — bottleneck is the scan, which prunes to 8 columns. "
    "The PRODUCT sums (disc_price, charge) run in exact integer cents "
    "(measures are 2-decimal by construction): a double product cast to "
    "DECIMAL rounds via Java's shortest-string repr on Spark but via the "
    "full binary value in DuckDB, and at sf1 (6M rows) one row lands on "
    "that boundary — integer factors have no boundary to land on. The "
    "exact integer sum (decimal(38,0) / int128) casts to the same nearest "
    "double on both engines at any scale.",
    tags=("aggregate",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    disc_units = (ep_c * (100 - disc_c)).cast("decimal(38,0)")
    charge_units = (ep_c * (100 - disc_c) * (100 + tax_c)).cast("decimal(38,0)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            (F.sum(disc_units).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_units).cast("double") / 1000000.0).alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql(_REVENUE_SQL, 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dimension filter -> 3-way join -> agg -> "
    "deterministic top-10 (revenue DESC, l_orderkey tie-break). Scale: "
    "customer filter broadcast into the orders join; the lineitem join is the "
    "only large shuffle; top-k is TakeOrderedAndProject (no global sort).",
    tags=("join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp_ntz")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n_name, {dsum_sql(_REVENUE_SQL, 'revenue')}, COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: star join (fact + 4 dims) with date slice. "
    "Scale: nation/region/customer are broadcast (dims), so lineitem->orders "
    "is the only shuffled join; group-by n_name carries 25 partial rows.",
    tags=("join", "aggregate", "star"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "revenue_by_brand",
    oracle=f"""
    SELECT p_brand, {dsum_sql(_REVENUE_SQL, 'revenue')},
           {dsum_sql('l_quantity', 'sum_qty')}, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Broadcast equi-join: part is dimension-sized at every SF, so the "
    "join is map-side (no shuffle of lineitem); only the 25-brand partial "
    "aggregates shuffle. The explain plan must show BroadcastHashJoin.",
    tags=("join", "broadcast"),
)
def revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(_revenue(), "revenue"),
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "semi_join_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    doc="Left-semi join (EXISTS). Scale: semi-join only shuffles the key "
    "column of the probe side; with AQE it downgrades to broadcast when the "
    "filtered orders side is small.",
    tags=("join", "semi"),
)
def semi_join_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-anti join (NOT EXISTS / NOT IN with non-null keys).",
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-K per group via ranked window — the canonical replacement for a "
    "per-key sort. Deterministic tie-break on o_orderkey. Scale: one shuffle "
    "on o_custkey; skewed customers are split by AQE.",
    tags=("window", "topk"),
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Running total per customer (cumulative frame). The windowed sum runs "
    "in DECIMAL so the result is order-of-addition independent and matches "
    "the oracle exactly.",
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "distinct_agg_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) alongside plain aggregates — Catalyst expands to a "
    "two-phase aggregate automatically.",
    tags=("aggregate", "distinct"),
)
def distinct_agg_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@register(
    "rollup_returnflag_linestatus",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {dsum_sql('l_quantity', 'sum_qty')}, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total). NULL group markers "
    "are coalesced to 'ALL' so the hash compare is null-free.",
    tags=("aggregate", "rollup"),
)
def rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (all 4 combinations).",
    tags=("aggregate", "cube"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "set_ops_customer_cohorts",
    oracle="""
    SELECT 'intersect' AS op, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
    doc="INTERSECT / EXCEPT / UNION ALL as first-class set operators.",
    tags=("setops",),
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        building.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey")
    ).unionAll(
        building.exceptAll(rich).distinct().select(F.lit("except").alias("op"), "c_custkey")
    )


@register(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Global deterministic top-K: Spark compiles orderBy+limit to "
    "TakeOrderedAndProject (per-partition heap + driver merge of K rows), "
    "never a full global sort — exactly the right plan at 100 TB.",
    tags=("topk", "sort"),
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "pivot_qty_by_status",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_f')},
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_o')}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (wide conditional aggregation) with pinned pivot values — "
    "pinning avoids the extra distinct-values job Spark otherwise runs.",
    tags=("pivot", "aggregate"),
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )


@register(
    "star_join_full",
    oracle=f"""
    SELECT r_name, p_brand, {dsum_sql(_REVENUE_SQL, 'revenue')}, COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON l_partkey  = p_partkey
      JOIN supplier ON l_suppkey  = s_suppkey
    GROUP BY r_name, p_brand
    """,
    doc="Full star join: fact + 6 dimensions. Every dimension is broadcast; "
    "the only shuffled join is lineitem->orders (both fact-sized). At 100 TB "
    "this is one shuffle + five map-side joins, then a 125-row aggregate.",
    tags=("join", "star"),
)
def star_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy("r_name", "p_brand")
        .agg(dsum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


_Q_SQL = """
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@register(
    "sql_interface_nation_revenue",
    oracle=_Q_SQL,
    doc="The raw spark.sql face: the SAME ANSI text runs on Spark (over "
    "register_views temp views) and on DuckDB as its own oracle — proving "
    "the SQL surface is a first-class entry point, not just the DataFrame "
    "DSL. Catalyst picks broadcast joins for the dims on its own here "
    "(no explicit hints in SQL).",
    tags=("sql", "join", "aggregate"),
)
def sql_interface_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.sources import register_views

    register_views(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return spark.sql(_Q_SQL)


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate with NO group keys — the "
    "predicate-pushdown showcase. All three predicates (shipdate range, "
    "discount band, quantity cap) reach the parquet reader as PushedFilters; "
    "the scan prunes to 4 columns; the 'shuffle' is a single-row partial-agg "
    "exchange. At 100 TB this query is I/O-bound on row-group skipping — "
    "exactly what min/max statistics + pushdown buy.",
    tags=("aggregate", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS decorrelated into a LEFT SEMI "
    "join with a residual non-equi predicate (l_shipdate > o_orderdate). "
    "Catalyst plans a shuffled hash semi-join on the equi key; the semi "
    "short-circuits on first match so the lineitem side never fans out. "
    "Scale: one shuffle on orderkey (both sides fact-sized); the date filter "
    "on orders is pushed to the scan, shrinking the probe side first.",
    tags=("join", "semi", "subquery"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    return (
        filtered.join(
            li,
            (filtered.o_orderkey == li.l_orderkey) & (li.l_shipdate > filtered.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q17_below_avg_quantity",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey AS pk,
               ROUND({davg_sql('l_quantity', 'x').replace(' AS x', '')}, 6) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l_extendedprice', 'total_price')},
           COUNT(*) AS n_lines
    FROM lineitem JOIN pa ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity) decorrelated into aggregate-then-self-join. Determinism: the "
    "per-part average is decimal-exact then ROUNDed to 6 decimals BEFORE the "
    "0.5x threshold, so both engines threshold the same double. Scale: the "
    "aggregate and the join share the same key (l_partkey), so the agg "
    "output arrives already partitioned for the join — one shuffle of the "
    "base table, reused; no broadcast needed (per-part aggregate is "
    "fact-keyed, it grows with the data).",
    tags=("join", "subquery", "aggregate"),
)
def q17_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(davg("l_quantity", "x"), 6).alias("avg_qty")
    )
    return (
        li.join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus), ())
"""


@register(
    "grouping_sets_flag_status",
    oracle=_GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS (beyond the cube/rollup entries): four "
    "simultaneous groupings in one pass — Spark expands them with a single "
    "Expand node feeding ONE shuffle, not four scans. NULL group cells are "
    "coalesced to a '<all>' sentinel on both engines so the hash compare is "
    "null-free. The identical ANSI text runs on Spark and DuckDB.",
    tags=("aggregate", "grouping-sets", "sql"),
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.sources import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "monthly_revenue_mom_delta",
    oracle=f"""
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               {dsum_sql('o_totalprice', 'revenue')}
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND(revenue - COALESCE(LAG(revenue) OVER (ORDER BY month), 0.0), 6)
               AS mom_delta
    FROM m
    """,
    doc="Month-over-month revenue deltas: aggregate to months, then LAG over "
    "the month order. The unpartitioned window runs AFTER aggregation, over "
    "one row per month (bounded, ~centuries fit in one partition) — the "
    "scale-safe place for a global window; the heavy lifting is the "
    "pre-aggregation, which shuffles only partial sums. Delta rounded to 6 "
    "decimals; first month coalesced to a 0-baseline.",
    tags=("window", "lag", "aggregate"),
)
def monthly_revenue_mom_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(dsum("o_totalprice", "revenue"))
    w = W.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(
            F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.lit(0.0)), 6
        ).alias("mom_delta"),
    )


@register(
    "percentile_price_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact percentiles (p50/p90/p99) per group: Spark's percentile() and "
    "DuckDB's quantile_cont share the same linear-interpolation definition, "
    "so the values hash-match after a 6-decimal round. Exact percentile is a "
    "sort-based aggregate — fine when group count is small and per-group "
    "rows fit an executor; at 100 TB with huge groups switch to "
    "approx_percentile (t-digest, mergeable partials, one shuffle of "
    "sketches) and accept the documented error bound.",
    tags=("aggregate", "percentile"),
)
def percentile_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {q})"), 6).alias(name)
            for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    )


@register(
    "unpivot_pricing_measures",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity', 'sum_qty')},
               {dsum_sql('l_extendedprice', 'sum_base_price')}
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure, sum_qty AS value
    FROM wide
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'sum_base_price', sum_base_price
    FROM wide
    """,
    doc="Unpivot (wide -> long): the aggregated pricing measures melted into "
    "(group, measure, value) rows via DataFrame.unpivot — Spark plans a "
    "single Expand over the aggregate (one pass), the relational inverse of "
    "the pivot_qty_by_status entry. The oracle is the portable UNION ALL "
    "formulation of the same reshape.",
    tags=("unpivot", "reshape", "aggregate"),
)
def unpivot_pricing_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag", "l_linestatus"],
        values=["sum_qty", "sum_base_price"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS ship_year,
           {dsum_sql(_REVENUE_SQL, 'volume')}
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between (customer nation, "
    "supplier nation) pairs per ship year — the same dimension table "
    "(nation) joined TWICE under different roles. Both nation joins and the "
    "customer/supplier joins broadcast; the only fact-sized shuffle is "
    "lineitem->orders. The n_name inequality halves the pair space without "
    "a distinct.",
    tags=("join", "star", "multi-role"),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.date_format("l_shipdate", "yyyy").cast("long").alias("ship_year"),
        )
        .agg(dsum(_revenue(), "volume"))
    )


@register(
    "ntile_customer_spend_deciles",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, {dsum_sql('o_totalprice', 'total_spend')}
        FROM orders GROUP BY o_custkey
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           {dsum_sql('total_spend', 'decile_spend')}
    FROM (
        SELECT o_custkey, total_spend,
               NTILE(10) OVER (ORDER BY total_spend DESC, o_custkey) AS decile
        FROM spend
    )
    GROUP BY decile
    """,
    doc="Customer spend deciles: aggregate per customer, NTILE(10) over the "
    "spend ranking (deterministic tie-break on custkey), then per-decile "
    "rollup. The unpartitioned NTILE runs over the AGGREGATED series (one "
    "row per customer), the standard compromise for rank-into-quantiles; at "
    "100 TB with billions of customers the two-phase variant computes "
    "approximate spend quantile boundaries (approx_percentile partials) and "
    "buckets by range instead — documented here, exact NTILE kept for the "
    "oracle.",
    tags=("window", "ntile", "aggregate"),
)
def ntile_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spend"))
    w = W.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("total_spend", "decile_spend"),
        )
    )


@register(
    "ntile_customer_spend_deciles_ranged",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, {dsum_sql('o_totalprice', 'total_spend')}
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT [{', '.join(f'quantile_cont(total_spend, {q / 10})' for q in range(9, 0, -1))}] AS bs
        FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           {dsum_sql('total_spend', 'decile_spend')}
    FROM (
        SELECT total_spend,
               CAST(1 + len(list_filter((SELECT bs FROM b),
                                        x -> total_spend < x)) AS BIGINT) AS decile
        FROM spend
    )
    GROUP BY decile
    """,
    doc="The 100 TB-safe twin of ntile_customer_spend_deciles: instead of an "
    "unpartitioned NTILE window (which funnels every customer through ONE "
    "WindowExec task — the straggler that query's docstring warns about), "
    "boundaries are computed as the 9 interior spend quantiles in one "
    "aggregate, collected to the driver (9 doubles — bounded), and embedded "
    "as literals; bucketing is then a narrow codegen projection over the "
    "scan, and the rollup a plain 10-group aggregate. No window, no single-"
    "partition stage, two shuffles total (per-customer agg + final rollup). "
    "Ties at a boundary go to the better decile on both engines (strict <). "
    "Spark percentile() and DuckDB quantile_cont share the (n-1)q linear-"
    "interpolation definition, so the boundaries are bit-identical. Bucket "
    "POPULATIONS differ from exact NTILE only at boundary ties (NTILE "
    "balances counts; range bucketing is value-deterministic) — which is "
    "why both variants stay registered.",
    tags=("window", "ntile", "aggregate", "scale-variant"),
)
def ntile_customer_spend_deciles_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spend"))
    qlist = ", ".join(str(q / 10) for q in range(9, 0, -1))
    # 9 doubles -> driver: the bounded-aggregate-artifact pattern (same as
    # IVF centroids) — cheaper and plan-cleaner than a 1-row BNLJ crossJoin.
    bounds = spend.agg(
        F.expr(f"percentile(total_spend, array({qlist}))").alias("bs")
    ).collect()[0].bs
    if bounds is None:  # zero customers (empty ingest day): no boundaries,
        bounds = []  # every (nonexistent) row would be decile 1
    decile = F.lit(1)
    for b in bounds:
        decile = decile + (F.col("total_spend") < F.lit(float(b))).cast("int")
    return (
        spend.select("total_spend", decile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("total_spend", "decile_spend"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT COUNT(*) AS n_lines,
           {dsum_sql(_REVENUE_SQL, 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity < 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity < 30)
       OR (p_retailprice > 1500 AND l_quantity >= 40)
    """,
    doc="TPC-H Q19 shape: a disjunction of conjunctive predicates spanning "
    "BOTH join sides. Catalyst cannot push the full OR below the join, but "
    "it derives and pushes the per-side residuals it CAN (e.g. the quantity "
    "bound union on lineitem), broadcasts part, and evaluates the residual "
    "disjunction post-join in codegen. The plan to check: no cross join, "
    "part broadcast, single fact scan.",
    tags=("join", "predicate", "pushdown"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") < 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") < 30))
        | ((F.col("p_retailprice") > 1500) & (F.col("l_quantity") >= 40))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(_revenue(), "revenue"),
    )


@register(
    "window_range_frame_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400
               RANGE BETWEEN 60 PRECEDING AND CURRENT ROW
           ) AS STRING) AS DOUBLE) AS spend_60d,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400
               RANGE BETWEEN 60 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_orders_60d
    FROM orders
    """,
    doc="RANGE-framed window (value-based, not row-based): per customer, the "
    "rolling 60-day spend and order count at each order — frames defined by "
    "day distance, so same-day orders share a frame regardless of row order "
    "(which is what makes the result deterministic without a tie-break). "
    "Epoch-day arithmetic keeps the frame bound identical on both engines. "
    "Scale: one shuffle on o_custkey; frames never cross customers.",
    tags=("window", "range-frame"),
)
def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-60, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("spend_60d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_60d"),
    )


@register(
    "approx_median_price_bounds",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS exact_p50,
           TRUE AS approx_within_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (t-digest-style quantile sketch) gated the same "
    "way as the HLL query: per return flag, emit the EXACT interpolated "
    "median (Spark percentile == DuckDB quantile_cont, both (n-1)q linear "
    "interpolation) plus a boolean asserting the sketch's estimate sits "
    "within 2% of it. The sketch is the 100 TB path — fixed-size mergeable "
    "state per group instead of a full sort — and a drifting estimate "
    "flips the flag and fails the hash gate. The exact twin doubles as the "
    "per-group accuracy oracle.",
    tags=("aggregate", "approx", "sketch", "percentile"),
)
def approx_median_price_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= 0.02 * F.abs(F.col("exact_p50"))
            ).alias("approx_within_bounds"),
        )
    )


# --- data profiling (ANALYZE-style column summary) ---------------------------

@register(
    "lineitem_profile",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_val,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           CAST(MIN(l_extendedprice) AS VARCHAR),
           CAST(MAX(l_extendedprice) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS VARCHAR), CAST(MAX(l_discount) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', COUNT(*), COUNT(l_linestatus),
           COUNT(DISTINCT l_linestatus),
           MIN(l_linestatus), MAX(l_linestatus)
    FROM lineitem
    """,
    doc="ANALYZE-style table profile: row count, non-null count, exact "
    "distinct count, min/max per column, one output row per column "
    "(numeric min/max rendered via the shared %g-style formatter below so "
    "'26.0' and '26' can never hash-differ). At 100 TB each column's "
    "profile is one pass with map-side partials; exact COUNT(DISTINCT) is "
    "the one expensive piece and approx_count_distinct is the documented "
    "drop-in (the HLL query pins its bounds). Profiles drive the optimizer "
    "choices this engine otherwise delegates to Catalyst statistics (CBO "
    "ANALYZE TABLE COMPUTE STATISTICS is the built-in twin).",
    tags=("aggregate", "profiling", "extension"),
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def prof(col: str, numeric: bool) -> DataFrame:
        if numeric:
            # match DuckDB's VARCHAR cast of DOUBLE ('26.0' for integral)
            mn = F.expr(
                f"CASE WHEN MIN({col}) = CAST(MIN({col}) AS BIGINT)"
                f" THEN CONCAT(CAST(CAST(MIN({col}) AS BIGINT) AS STRING), '.0')"
                f" ELSE CAST(MIN({col}) AS STRING) END"
            )
            mx = F.expr(
                f"CASE WHEN MAX({col}) = CAST(MAX({col}) AS BIGINT)"
                f" THEN CONCAT(CAST(CAST(MAX({col}) AS BIGINT) AS STRING), '.0')"
                f" ELSE CAST(MAX({col}) AS STRING) END"
            )
        else:
            mn, mx = F.min(col).cast("string"), F.max(col).cast("string")
        return li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        ).select(F.lit(col).alias("col"), "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")

    out = prof("l_quantity", True)
    for c, numeric in [
        ("l_extendedprice", True),
        ("l_discount", True),
        ("l_returnflag", False),
        ("l_linestatus", False),
    ]:
        out = out.unionAll(prof(c, numeric))
    return out


# --- LATERAL correlated top-k ------------------------------------------------

_LATERAL_SQL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 3
    ) t
"""


@register(
    "lateral_topk_customers",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated subquery with per-group LIMIT: the same ANSI "
    "text runs on both engines (like sql_interface_nation_revenue) — top-3 "
    "customers by account balance per nation, tie-broken on name. The "
    "interesting part is the PLAN: Catalyst decorrelates the lateral into "
    "WindowGroupLimit -> Window -> broadcast join, so the per-group top-k "
    "is pre-pruned map-side BEFORE the shuffle (each task keeps <= 3 rows "
    "per nation) — the decorrelation means the 'loop over nations' surface "
    "syntax never executes as a loop, which is exactly what makes the "
    "construct usable on a 100 TB fact side.",
    tags=("sql", "lateral", "topk", "window"),
)
def lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.sources import register_views

    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(_LATERAL_SQL)


# --- Window-function breadth -------------------------------------------------


@register(
    "window_rank_breadth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rk,
           CAST(dense_rank() OVER w AS BIGINT) AS drk,
           ROUND(percent_rank() OVER w, 6) AS prk,
           ROUND(cume_dist()    OVER w, 6) AS cd,
           CAST(COALESCE(lag(o_orderkey, 1)  OVER w, -1) AS BIGINT) AS prev_key,
           CAST(COALESCE(lead(o_orderkey, 1) OVER w, -1) AS BIGINT) AS next_key,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_key,
           CAST(COALESCE(nth_value(o_orderkey, 2) OVER w, -1) AS BIGINT) AS second_key
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
    doc="The full ranking/navigation window-function surface in one query "
    "(rank, dense_rank, percent_rank, cume_dist, lag, lead, first_value, "
    "nth_value) over one shared window — all nine functions evaluate in a "
    "SINGLE WindowExec pass (one shuffle on o_custkey, one sort), which is "
    "the plan property that matters at scale: adding a window function to "
    "an existing window is free. Order key is (o_orderdate, o_orderkey) — "
    "unique per partition, so every rank/navigation value is total-ordered "
    "and exactly comparable. The reference has no window operators at all "
    "(SURVEY.md §2.2).",
    tags=("window", "rank", "navigation"),
)
def window_rank_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.coalesce(F.lag("o_orderkey", 1).over(w), F.lit(-1)).cast("long").alias("prev_key"),
        F.coalesce(F.lead("o_orderkey", 1).over(w), F.lit(-1)).cast("long").alias("next_key"),
        F.first("o_orderkey").over(wf).cast("long").alias("first_key"),
        F.coalesce(F.nth_value("o_orderkey", 2).over(wf), F.lit(-1)).cast("long").alias("second_key"),
    )


# --- Statistical aggregates from exact moments -------------------------------
#
# corr/slope/intercept computed from EXACT integer moments (per-row products
# in int64 cents — price_cents^2 <= 1.2e14, well inside int64 — summed in
# DECIMAL(38,0), which both engines add exactly in any order), then ONE cast
# to double at the end. Native corr()/regr_slope() are float sums whose
# value depends on partial-aggregation order — unusable under a bit-exact
# cross-engine gate; the moment form is the standard numerically-stable-
# enough rewrite when |corr| isn't pathologically tiny, and it is the ONLY
# order-independent one.

_MOM = {
    "x": "CAST(ROUND(l_quantity * 100) AS BIGINT)",
    "y": "CAST(ROUND(l_extendedprice * 100) AS BIGINT)",
}


# One ANSI text, both engines (like sql_interface_nation_revenue).
x, y, dec = _MOM["x"], _MOM["y"], "DECIMAL(38,0)"
_STATS_SQL = f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST({x} AS {dec})) AS sx,
               SUM(CAST({y} AS {dec})) AS sy,
               SUM(CAST({x} * {x} AS {dec})) AS sxx,
               SUM(CAST({y} * {y} AS {dec})) AS syy,
               SUM(CAST({x} * {y} AS {dec})) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_qty_price,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / n, 6) AS intercept_cents
    FROM m
"""
del x, y, dec


@register(
    "stats_moments_corr",
    oracle=_STATS_SQL,
    doc="Pearson correlation + least-squares slope/intercept of extended "
    "price vs quantity per return flag, computed from exact integer moments "
    "(cent-scaled per-row products in int64, sums in DECIMAL(38,0)) with a "
    "single cast to double at the end. Native corr()/regr_*() accumulate "
    "in floating point, so their low bits depend on how Spark pairs the "
    "partial aggregates — the moment rewrite is the order-independent form "
    "that can sit behind a bit-exact cross-engine gate, and at 100 TB it is "
    "also the FASTER plan: one pass of map-side integer partials instead of "
    "Welford-style merging. Units: slope/intercept are in cents per "
    "centi-unit (corr is scale-invariant).",
    tags=("aggregate", "statistics", "extension"),
)
def stats_moments_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.sources import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_STATS_SQL)


# --- ABC / Pareto classification ---------------------------------------------


@register(
    "abc_part_classification",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS run,
               SUM(cents) OVER () AS total
        FROM per_part
    )
    SELECT CASE WHEN run <= total * 0.8 THEN 'A'
                WHEN run <= total * 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS class_revenue
    FROM ranked
    GROUP BY 1
    """,
    doc="ABC (Pareto) classification of parts by discounted revenue: parts "
    "are ranked by exact integer-cent revenue (tie-break partkey), the "
    "RUNNING cent total against the grand total cuts the A/B/C classes at "
    "80% / 95% cumulative share, and classes roll up to (count, revenue). "
    "All comparisons are integer-cents vs total*fraction — one double "
    "multiply per boundary, no accumulated float error. Scale note: the "
    "running sum is an unpartitioned window over the PER-PART aggregate "
    "(bounded by |parts|, not |lineitems|) — the same post-aggregation "
    "global-window rule as monthly_revenue_mom_delta; with billions of "
    "parts, the ranged-quantile bucketing of "
    "ntile_customer_spend_deciles_ranged is the documented alternative.",
    tags=("aggregate", "window", "pareto", "extension"),
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("cents")
    )
    w_run = W.orderBy(F.desc("cents"), F.asc("l_partkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy()
    ranked = per_part.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w_run).alias("run"),
        F.sum("cents").over(w_all).alias("total"),
    )
    klass = (
        F.when(F.col("run") <= F.col("total") * 0.8, "A")
        .when(F.col("run") <= F.col("total") * 0.95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(klass.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("cents").cast("double") / 100.0).alias("class_revenue"),
    )
