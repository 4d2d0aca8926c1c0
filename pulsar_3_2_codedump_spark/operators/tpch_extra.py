"""TPC-H-style relational completion (SURVEY.md §2.M).

The reference ships no SQL engine (Pulsar SQL archived out-of-tree,
reference README.md:96), so §2.M's surface is harness-mandated: the full
breadth of join / aggregate / subquery shapes a user of any analytics
engine expects. `relational.py` covers Q1/Q3/Q5/Q6/Q10/Q13 analogues;
this module completes the remaining TPC-H query *shapes*, adapted to the
fixture schema (no partsupp table and no shipmode/commitdate/receiptdate
columns — the partsupp-derived queries are re-expressed through the
lineitem fact chain, which preserves the plan shape that matters: the
extra join, the correlated aggregate, the nested semi-join).

Scale notes (100 TB posture):
  - every query keeps lineitem/orders on the probe side; all dimension
    joins broadcast (nation/region/part/supplier/customer are small or
    bounded relative to facts at any SF).
  - self-joins on lineitem (Q21 shape) shuffle once on l_orderkey and
    reuse that partitioning for both the EXISTS and NOT-EXISTS probes.
  - scalar-subquery thresholds (Q11/Q20 shapes) are computed as
    single-row broadcast aggregates, not driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query


def _r2(c):
    return F.round(c, 2)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q2 shape: correlated min over a join (min-cost supplier)
# --------------------------------------------------------------------------
@query(
    "min_acctbal_supplier_per_part",
    section="2.M-subquery",
    doc="TPC-H Q2 shape (adapted: no partsupp — supplier↔part via lineitem): "
    "for each STANDARD/size-15 part, the supplier with minimal acctbal among "
    "those who shipped it.",
    oracle="""
        SELECT p_partkey, p_brand, s_suppkey, ROUND(s_acctbal, 2) AS acctbal
        FROM (
            SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                      ORDER BY s.s_acctbal, s.s_suppkey) AS rn
            FROM part p
            JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
              ON l.l_partkey = p.p_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE p.p_type = 'STANDARD' AND p.p_size = 15
        ) WHERE rn = 1
    """,
)
def min_acctbal_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    )
    pairs = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = load(spark, sf_dir, "supplier")
    w = W.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_suppkey", _r2(F.col("s_acctbal")).alias("acctbal"))
    )


# --------------------------------------------------------------------------
# Q7 shape: nation-pair volume shipping
# --------------------------------------------------------------------------
@query(
    "nation_volume_shipping",
    section="2.M-join",
    doc="TPC-H Q7: bidirectional nation-pair revenue by ship year "
    "(supplier nation ↔ customer nation, both directions).",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               YEAR(l_shipdate) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY sn.n_name, cn.n_name, YEAR(l_shipdate)
    """,
)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: market share (conditional agg over a ratio)
# --------------------------------------------------------------------------
@query(
    "nation_market_share",
    section="2.M-agg",
    doc="TPC-H Q8: NATION_3's share of AMERICA-region ECONOMY-part revenue "
    "per order year (conditional aggregate forming a ratio).",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 4) AS mkt_share
        FROM (
            SELECT YEAR(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        )
        GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(region), cn.cn_region == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 shape: product profit by nation/year
# --------------------------------------------------------------------------
@query(
    "product_profit",
    section="2.M-agg",
    doc="TPC-H Q9 (adapted: p_retailprice/2 stands in for ps_supplycost): "
    "profit per supplier nation per order year for PROMO parts.",
    oracle="""
        SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
               ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              - 0.5 * p_retailprice * l_quantity
                              AS DECIMAL(20, 4))), 2)::DOUBLE AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_type = 'PROMO'
        GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    # Sum in exact decimal: the subtraction makes a double sum order-sensitive
    # at the cent level, and shuffle order is nondeterministic.
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(20,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# Q11 shape: HAVING against a scalar-subquery threshold
# --------------------------------------------------------------------------
@query(
    "important_part_values",
    section="2.M-subquery",
    doc="TPC-H Q11 (adapted: part revenue via lineitem, not partsupp stock): "
    "parts whose revenue exceeds 1.5x the mean per-part revenue — HAVING vs a "
    "broadcast single-row aggregate, never a driver collect. The threshold is "
    "scale-free (a fixed revenue fraction returns 0 rows once part count "
    "grows with sf, making the check trivially true — VERDICT r2 item 8).",
    oracle="""
        SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS value
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice * (1 - l_discount)) >
               (SELECT 1.5 * SUM(l_extendedprice * (1 - l_discount))
                           / COUNT(DISTINCT l_partkey) FROM lineitem)
    """,
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(vol).alias("raw_value"))
    threshold = li.agg(
        (F.lit(1.5) * F.sum(vol) / F.countDistinct("l_partkey")).alias("cutoff")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("cutoff"))
        .select("l_partkey", F.round("raw_value", 4).alias("value"))
    )


# --------------------------------------------------------------------------
# Q12 shape: two-bucket conditional counts per category
# --------------------------------------------------------------------------
@query(
    "priority_line_counts",
    section="2.M-agg",
    doc="TPC-H Q12 (adapted: l_linestatus stands in for l_shipmode): per line "
    "status, count of high- vs low-priority orders shipped in 1997.",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue ratio
# --------------------------------------------------------------------------
@query(
    "promo_revenue_pct",
    section="2.M-agg",
    doc="TPC-H Q14: percentage of 1997-H1 revenue from PROMO-type parts.",
    oracle="""
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-07-01 00:00:00"))
    )
    part = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0)) / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q15 shape: view + scalar-max equality
# --------------------------------------------------------------------------
@query(
    "top_supplier_revenue",
    section="2.M-subquery",
    doc="TPC-H Q15: supplier(s) whose 1997-Q1 revenue equals the maximum "
    "(revenue view joined against its own MAX).",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct-supplier variety per part attribute group
# --------------------------------------------------------------------------
@query(
    "supplier_part_variety",
    section="2.M-agg",
    doc="TPC-H Q16 (adapted: supplier↔part via lineitem, not partsupp): "
    "distinct supplier count per (brand, size) for selected sizes, "
    "excluding Brand#1.",
    oracle="""
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 14, 23, 45)
        GROUP BY p_brand, p_size
    """,
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 shape: correlated per-part average threshold
# --------------------------------------------------------------------------
@query(
    "small_quantity_revenue",
    section="2.M-subquery",
    doc="TPC-H Q17: weekly-equivalent revenue from Brand#2 lines below half "
    "their part's average quantity (correlated AVG re-expressed as a "
    "per-part aggregate join — one shuffle on partkey, no per-row subquery).",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_weekly_revenue
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#2'
          AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        # per_part_avg is #parts rows DERIVED FROM LINEITEM — estimate-
        # driven join choice (broadcasts at test SF, flips to shuffle at
        # scale); an explicit broadcast would pin a fact-derived frame
        .join(per_part_avg, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_weekly_revenue"))
    )


# --------------------------------------------------------------------------
# Q18 shape: HAVING over a fact-side aggregate feeding a join
# --------------------------------------------------------------------------
@query(
    "large_volume_customers",
    section="2.M-agg",
    doc="TPC-H Q18: customers with orders totalling >250 units "
    "(aggregate → HAVING → join back to dims, top-20).",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 250)
        .select("l_orderkey", "raw_qty")
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _r2(F.col("o_totalprice")).alias("totalprice"),
            _r2(F.col("raw_qty")).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates
# --------------------------------------------------------------------------
@query(
    "disjunctive_predicate_revenue",
    section="2.M-scalar",
    doc="TPC-H Q19: revenue under an OR of brand/size/quantity conjunctions — "
    "Catalyst extracts the common join key and pushes the residual "
    "disjunction below the join.",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q20 shape: nested semi-join chain with a relative threshold
# --------------------------------------------------------------------------
@query(
    "excess_volume_suppliers",
    section="2.M-subquery",
    doc="TPC-H Q20 (adapted: shipped quantity, not partsupp stock): suppliers "
    "whose PROMO-part shipped quantity exceeds 1.5× the average supplier's — "
    "relative threshold keeps the query scale-invariant.",
    oracle="""
        WITH promo_qty AS (
            SELECT l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'PROMO'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(qty, 2) AS promo_qty
        FROM supplier JOIN promo_qty ON s_suppkey = l_suppkey
        WHERE qty > (SELECT 1.5 * AVG(qty) FROM promo_qty)
    """,
)
def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    promo_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cutoff = promo_qty.agg((1.5 * F.avg("qty")).alias("cutoff"))
    return (
        promo_qty.join(F.broadcast(cutoff))
        .filter(F.col("qty") > F.col("cutoff"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", _r2(F.col("qty")).alias("promo_qty"))
    )


# --------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table
# --------------------------------------------------------------------------
@query(
    "sole_return_suppliers",
    section="2.M-subquery",
    doc="TPC-H Q21 (adapted: l_returnflag='R' stands in for late receipt): "
    "per supplier, returned lines in multi-supplier orders where no OTHER "
    "supplier's line was returned — EXISTS + NOT EXISTS, both probes "
    "reusing one shuffle of lineitem on l_orderkey.",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """,
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .alias("l3")
    )
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2")) & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + anti join
# --------------------------------------------------------------------------
@query(
    "idle_wealthy_customers",
    section="2.M-subquery",
    doc="TPC-H Q22 (adapted: nationkey%10 stands in for phone country code): "
    "above-average-balance customers in selected groups with no orders "
    "after mid-1999 — scalar AVG threshold + anti join.",
    oracle="""
        SELECT c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_nationkey % 10 IN (1, 3, 5, 7)
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
        GROUP BY c_nationkey % 10
    """,
)
def idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 10).isin(1, 3, 5, 7)
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-07-01 00:00:00")
    )
    avg_bal = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
