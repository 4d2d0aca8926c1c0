"""Declarative data-quality constraint audit (§2.N pipeline extension).

The Deequ/dbt-test operator family: a suite of declarative constraints —
completeness, uniqueness, referential integrity, value ranges, cross-table
temporal consistency, and an exact ledger reconciliation — evaluated in one
pass each and emitted as one verdict row per constraint. This is the data
validation gate every large-scale training-data pipeline runs before a
corpus snapshot ships; on Spark each check is a partial aggregation (or a
co-partitioned join for the referential checks), so the whole audit is a
handful of map-side-combined scans at any corpus size.

Reference analogue: none (Pulsar has no corpus ops); the closest public
prior art is AWS Deequ ("Unit tests for data"), which is itself a Spark
library — this is the same idea expressed as plain DataFrame aggregates.

Determinism note: the ledger reconciliation (o_totalprice vs the lineitem
roll-up) quantizes PER ROW at 1e-6 currency before summing, so both engines
sum exact BIGINTs — the usual float-reassociation divergence between Spark
and DuckDB cannot appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.queries import query

LEDGER_SCALE = 1_000_000  # per-row fixed-point quantum for reconciliation
LEDGER_TOL = 10_000       # 0.01 currency units at LEDGER_SCALE


def _verdict(name: str, checked, violations) -> list:
    return [
        F.lit(name).alias("constraint_name"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
        (violations.cast("long") == 0).alias("passed"),
    ]


def _count_where(df: DataFrame, name: str, bad) -> DataFrame:
    return df.agg(
        *_verdict(
            name,
            F.count(F.lit(1)),
            F.sum(F.when(bad, 1).otherwise(0)),
        )
    )


@query(
    "constraint_audit",
    section="2.N-quality",
    doc="Data-quality CONSTRAINT AUDIT (the Deequ/dbt-test family): nine "
    "declarative constraints — referential integrity both directions "
    "(lineitem→orders, orders→customer, childless orders), primary-key "
    "uniqueness, null/empty completeness, numeric range checks, "
    "cross-table temporal consistency (no lineitem ships before its "
    "order date), and an EXACT ledger reconciliation of o_totalprice "
    "against the lineitem charge roll-up in per-row fixed-point (both "
    "engines sum exact BIGINTs — float reassociation cannot diverge). "
    "One verdict row per constraint: rows checked, violations, passed. "
    "Scale shape: every check is one partial-agg scan; the referential "
    "checks are key-partitioned joins; nothing is collected.",
    oracle=f"""
        SELECT constraint_name,
               CAST(n_checked AS BIGINT) AS n_checked,
               CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM (
        SELECT 'lineitem_fk_orders' AS constraint_name,
               (SELECT COUNT(*) FROM lineitem) AS n_checked,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        UNION ALL
        SELECT 'orders_fk_customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'orders_have_lineitems',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
        UNION ALL
        SELECT 'part_pkey_unique',
               (SELECT COUNT(*) FROM part),
               (SELECT CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT) FROM part)
        UNION ALL
        SELECT 'lineitem_discount_range',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_discount < 0.0 OR l_discount > 0.1)
        UNION ALL
        SELECT 'lineitem_quantity_positive',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        UNION ALL
        SELECT 'lineitem_ships_after_order',
               (SELECT COUNT(*) FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey),
               (SELECT COUNT(*) FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_shipdate < o.o_orderdate)
        UNION ALL
        SELECT 'documents_text_complete',
               (SELECT COUNT(*) FROM documents),
               (SELECT COUNT(*) FROM documents
                WHERE text IS NULL OR length(trim(text)) = 0)
        UNION ALL
        SELECT 'orders_totalprice_reconciles',
               (SELECT COUNT(*) FROM orders o
                WHERE EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey)),
               (SELECT COUNT(*)
                FROM orders o
                JOIN (SELECT l_orderkey,
                             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 + l_tax) *
                                  (1 - l_discount) * {LEDGER_SCALE} + 0.5)
                                  AS BIGINT)) AS BIGINT) AS s
                      FROM lineitem GROUP BY l_orderkey) p
                  ON o.o_orderkey = p.l_orderkey
                WHERE abs(p.s - CAST(FLOOR(o.o_totalprice * {LEDGER_SCALE} + 0.5)
                                     AS BIGINT)) > {LEDGER_TOL})
        )
    """,
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_3_2_codedump_spark.catalog import persist_shared_corpus_frame

    # Deequ-style suites at 100 TB persist ONE projection per fact table
    # and run every check off it (r13 scan audit: 7 lineitem + 7 orders
    # scans -> 1 + 1): the columns below are the union of what the nine
    # checks reference; DISK_ONLY persist keeps lineage.
    lineitem = persist_shared_corpus_frame(
        fanout(load(spark, sf_dir, "lineitem")).select(
            "l_orderkey", "l_discount", "l_quantity", "l_shipdate",
            "l_extendedprice", "l_tax",
        )
    )
    orders = persist_shared_corpus_frame(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
        )
    )
    customer = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    documents = load(spark, sf_dir, "documents")

    okeys = orders.select("o_orderkey")
    lkeys = lineitem.select("l_orderkey")

    fk_lineitem = lineitem.join(
        okeys, lineitem["l_orderkey"] == okeys["o_orderkey"], "left_anti"
    ).agg(*_verdict("lineitem_fk_orders", F.lit(0), F.count(F.lit(1)))).select(
        "constraint_name", "n_violations"
    ).crossJoin(lineitem.agg(F.count(F.lit(1)).cast("long").alias("n_checked")))

    fk_orders = orders.join(
        customer.select("c_custkey"),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    ).agg(*_verdict("orders_fk_customer", F.lit(0), F.count(F.lit(1)))).select(
        "constraint_name", "n_violations"
    ).crossJoin(orders.agg(F.count(F.lit(1)).cast("long").alias("n_checked")))

    childless = orders.join(
        lkeys, orders["o_orderkey"] == lkeys["l_orderkey"], "left_anti"
    ).agg(*_verdict("orders_have_lineitems", F.lit(0), F.count(F.lit(1)))).select(
        "constraint_name", "n_violations"
    ).crossJoin(orders.agg(F.count(F.lit(1)).cast("long").alias("n_checked")))

    pkey = part.agg(
        *_verdict(
            "part_pkey_unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("p_partkey"),
        )
    )
    disc = _count_where(
        lineitem, "lineitem_discount_range",
        (F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1),
    )
    qty = _count_where(lineitem, "lineitem_quantity_positive", F.col("l_quantity") <= 0)

    li_o = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    )
    ships = _count_where(
        li_o, "lineitem_ships_after_order", F.col("l_shipdate") < F.col("o_orderdate")
    )

    doc_c = _count_where(
        documents, "documents_text_complete",
        F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0),
    )

    # exact fixed-point ledger: quantize each lineitem charge PER ROW, sum
    # BIGINTs (order-independent), compare to the quantized order total
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 + F.col("l_tax"))
                * (1 - F.col("l_discount"))
                * LEDGER_SCALE
                + F.lit(0.5)
            ).cast("long")
        ).alias("s")
    )
    ledger = _count_where(
        orders.join(per_order, orders["o_orderkey"] == per_order["l_orderkey"]),
        "orders_totalprice_reconciles",
        F.abs(
            F.col("s")
            - F.floor(F.col("o_totalprice") * LEDGER_SCALE + F.lit(0.5)).cast("long")
        )
        > LEDGER_TOL,
    )

    out = None
    for c in [fk_lineitem, fk_orders, childless, pkey, disc, qty, ships, doc_c, ledger]:
        c = c.select("constraint_name", "n_checked", "n_violations",
                     (F.col("n_violations") == 0).alias("passed"))
        out = c if out is None else out.unionByName(c)
    return out
