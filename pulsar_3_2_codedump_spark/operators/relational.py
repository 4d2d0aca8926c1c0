"""Batch relational layer (SURVEY.md §2.M).

The reference has no SQL engine in-repo (Pulsar SQL / Presto connector is
archived out-of-tree, reference README.md:96); the driver's harness still
requires joins / aggregations / window functions / sorts / set ops / scalars.
All of these are native Spark — the job here is to express each one
declaratively so Catalyst plans it (broadcast the dims, push the filters,
prune the columns) and to pin deterministic output contracts for the oracle.

Scale notes (100 TB posture):
  - fact tables (lineitem, orders) are only ever filtered/aggregated —
    never collected; aggregations are partial+final (map-side combine free).
  - dimension tables (region, nation, customer at analytic SF, part,
    supplier) are broadcast — no shuffle of the fact side for those joins.
  - top-k uses orderBy().limit(k) which Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query


def _r2(c):
    return F.round(c, 2)


# --------------------------------------------------------------------------
# Aggregation: partial+final hash agg over the fact table
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    section="2.M-agg",
    doc="TPC-H Q1-style pricing summary: full-scan hash aggregate over lineitem.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)  AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
               ROUND(AVG(l_discount), 4)                                        AS avg_disc,
               COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way join + top-k (broadcast dims, TakeOrdered)
# --------------------------------------------------------------------------
@query(
    "shipping_priority",
    section="2.M-join",
    doc="TPC-H Q3-style: customer⋈orders⋈lineitem, revenue top-10 (deterministic tiebreak).",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "local_supplier_volume",
    section="2.M-join",
    doc="TPC-H Q5-style: 6-way join through region→nation→{customer,supplier}→orders→lineitem.",
    oracle="""
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@query(
    "returned_item_customers",
    section="2.M-join",
    doc="TPC-H Q10-style: top-20 customers by returned revenue.",
    oracle="""
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               ROUND(c_acctbal, 2) AS acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", _r2(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Semi / anti / outer joins
# --------------------------------------------------------------------------
@query(
    "semi_join_customers_with_orders",
    section="2.M-join",
    doc="LEFT SEMI join (EXISTS): customers having ≥1 order, counted per nation.",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_join_customers_without_orders",
    section="2.M-join",
    doc="LEFT ANTI join (NOT EXISTS): customers with no orders.",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "outer_join_order_counts",
    section="2.M-join",
    doc="LEFT OUTER join preserving customers with zero orders.",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
    )


@query(
    "theta_join_acctbal",
    section="2.M-join",
    doc="Theta (non-equi) join: per nation, customer/supplier pairs where s_acctbal > c_acctbal.",
    oracle="""
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_pairs
        FROM customer JOIN supplier
          ON c_nationkey = s_nationkey AND s_acctbal > c_acctbal
        GROUP BY c_nationkey
    """,
)
def theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    return (
        cust.join(
            F.broadcast(supp),
            (cust.c_nationkey == supp.s_nationkey) & (supp.s_acctbal > cust.c_acctbal),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------
@query(
    "rollup_revenue",
    section="2.M-agg",
    doc="ROLLUP over (returnflag, linestatus) with subtotals and grand total.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_extendedprice")).alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


@query(
    "cube_quantity",
    section="2.M-agg",
    doc="CUBE over (returnflag, linestatus).",
    oracle="""
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(_r2(F.sum("l_quantity")).alias("sum_qty"))


@query(
    "grouping_sets_priority",
    section="2.M-agg",
    doc="Explicit GROUPING SETS ((status, priority), (status), ()).",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@query(
    "window_rank_parts",
    section="2.M-window",
    doc="row_number per brand ordered by retailprice desc (unique tiebreak), top-3 per brand.",
    oracle="""
        SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS retailprice, rn
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part
        ) WHERE rn <= 3
    """,
)
def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", _r2(F.col("p_retailprice")).alias("retailprice"), "rn")
    )


@query(
    "window_running_revenue",
    section="2.M-window",
    doc="Running revenue per supplier over shipdate (ROWS frame, unique tiebreak).",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               ROUND(SUM(l_extendedprice * (1 - l_discount)) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_revenue
        FROM lineitem
        WHERE l_suppkey <= 10
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).over(w), 4).alias(
            "running_revenue"
        ),
    )


@query(
    "window_lag_lead_orders",
    section="2.M-window",
    doc="lag/lead: per-customer gap in days between consecutive orders.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               DATEDIFF('day',
                        LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS days_since_prev
        FROM orders
        WHERE o_custkey <= 100
    """,
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Sort / top-k / set ops / distinct
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    section="2.M-sort",
    doc="Global top-20 by totalprice — Spark plans TakeOrderedAndProject, not a full sort.",
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", _r2(F.col("o_totalprice")).alias("totalprice"))
    )


@query(
    "setops_nations",
    section="2.M-setop",
    doc="INTERSECT/EXCEPT/UNION over customer vs supplier nation keys, tagged.",
    oracle="""
        SELECT 'both' AS side, n FROM (
            SELECT c_nationkey AS n FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'customer_only' AS side, n FROM (
            SELECT c_nationkey AS n FROM customer
            EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersect(s).select(F.lit("both").alias("side"), "n")
    only = c.subtract(s).select(F.lit("customer_only").alias("side"), "n")  # EXCEPT DISTINCT
    return both.unionByName(only)


@query(
    "distinct_counts",
    section="2.M-agg",
    doc="COUNT(DISTINCT ...) over multiple columns in one aggregation.",
    oracle="""
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey)  AS n_parts,
               COUNT(DISTINCT l_suppkey)  AS n_supps
        FROM lineitem
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# Scalar function library / conditional pivot / subqueries
# --------------------------------------------------------------------------
@query(
    "scalar_functions",
    section="2.M-scalar",
    doc="String/date/math scalar expressions (the reference has no scalar library at all).",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand)                          AS brand_upper,
               SUBSTR(p_type, 1, 5)                    AS type_prefix,
               LENGTH(p_name)                          AS name_len,
               CONCAT(p_brand, ':', p_type)            AS brand_type,
               ROUND(ABS(p_retailprice - 1000.0), 2)   AS price_dist,
               CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket,
               p_size % 7                              AS size_mod
        FROM part WHERE p_partkey <= 500
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        _r2(F.abs(F.col("p_retailprice") - 1000.0)).alias("price_dist"),
        F.floor(F.col("p_retailprice") / 100).alias("price_bucket"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@query(
    "conditional_pivot",
    section="2.M-agg",
    doc="Manual pivot via conditional aggregation (portable form of df.pivot).",
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_open,
               ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    """,
)
def conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r2(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0))).alias(
            "qty_open"
        ),
        _r2(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0))).alias(
            "qty_filled"
        ),
    )


@query(
    "correlated_subquery_avg",
    section="2.M-subquery",
    doc="Correlated scalar subquery: parts priced above their brand average.",
    oracle="""
        SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS retailprice
        FROM part p
        WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
    """,
)
def correlated_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS retailprice
        FROM part p
        WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        """
    )


@query(
    "order_priority_check",
    section="2.M-subquery",
    doc="TPC-H Q4-style: orders per priority that had at least one late line "
    "(EXISTS semi-join into an aggregate).",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "forecast_revenue_change",
    section="2.M-agg",
    doc="TPC-H Q6-style: revenue delta from discount band — pure filter+agg, the "
    "pushdown showcase (all three predicates reach the parquet scan).",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "pivot_revenue_matrix",
    section="2.M-agg",
    doc="Native pivot (df.groupBy().pivot() with an EXPLICIT value list — "
    "never the two-pass value-discovery form, which scans twice and can't "
    "plan until runtime): line status × return flag revenue matrix. "
    "Catalyst rewrites the explicit pivot into the same single-scan "
    "conditional aggregation as the CASE form (conditional_pivot), which "
    "is also the oracle here.",
    oracle="""
        SELECT l_linestatus,
               ROUND(SUM(CASE WHEN l_returnflag = 'A'
                              THEN l_extendedprice ELSE 0 END), 2) AS rev_A,
               ROUND(SUM(CASE WHEN l_returnflag = 'N'
                              THEN l_extendedprice ELSE 0 END), 2) AS rev_N,
               ROUND(SUM(CASE WHEN l_returnflag = 'R'
                              THEN l_extendedprice ELSE 0 END), 2) AS rev_R
        FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_extendedprice"))
    )
    return p.select(
        "l_linestatus",
        F.round(F.coalesce(F.col("A"), F.lit(0.0)), 2).alias("rev_A"),
        F.round(F.coalesce(F.col("N"), F.lit(0.0)), 2).alias("rev_N"),
        F.round(F.coalesce(F.col("R"), F.lit(0.0)), 2).alias("rev_R"),
    )
