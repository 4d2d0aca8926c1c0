"""Constraint-audit suite: synthetic fixtures with known violation counts."""

import datetime
import tempfile

import pytest


@pytest.fixture(scope="module")
def audit_dir(spark):
    d = tempfile.mkdtemp()
    date = datetime.date
    # customer 1..3; order 40 references missing customer 9
    spark.createDataFrame(
        [(1, "a", 1, 0.0, "m"), (2, "b", 1, 0.0, "m"), (3, "c", 1, 0.0, "m")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    # orders: 10/20 reconcile-able; 30 childless; 40 orphan custkey + ships-early child
    spark.createDataFrame(
        [
            (10, 1, "O", 110.0, date(2024, 1, 1), "1-URGENT"),
            (20, 2, "O", 999.0, date(2024, 1, 2), "1-URGENT"),  # off ledger
            (30, 3, "O", 50.0, date(2024, 1, 3), "1-URGENT"),   # childless
            (40, 9, "O", 60.0, date(2024, 1, 4), "1-URGENT"),   # fk violation
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    # lineitem: key 10 sums to 110 exactly; 20 doesn't match 999; 99 is an
    # orphan; 40's item ships BEFORE the order date; one bad discount; one
    # non-positive quantity
    li = [
        # (okey, pkey, skey, ln, qty, extprice, disc, tax, rf, ls, shipdate)
        (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.1, "N", "O", date(2024, 2, 1)),  # 110
        (20, 1, 1, 1, 2.0, 100.0, 0.5, 0.0, "N", "O", date(2024, 2, 1)),  # bad disc, 50
        (40, 1, 1, 1, -1.0, 60.0, 0.0, 0.0, "N", "O", date(2023, 12, 31)),  # early+qty
        (99, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", date(2024, 2, 1)),  # orphan
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date",
    ).write.parquet(f"{d}/lineitem.parquet")
    # part: duplicate partkey 7
    spark.createDataFrame(
        [(7, "red bolt", "B", "T", 1, 1.0), (7, "red bolt copy", "B", "T", 1, 1.0),
         (8, "blue nut", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(f"{d}/part.parquet")
    # documents: one empty text
    spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "   ", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_constraint_audit_counts_each_violation_class(spark, audit_dir):
    from pulsar_3_2_codedump_spark.functions.quality_audit import constraint_audit

    out = {r["constraint_name"]: r for r in constraint_audit(spark, audit_dir).collect()}
    assert len(out) == 9

    assert out["lineitem_fk_orders"]["n_violations"] == 1          # okey 99
    assert out["lineitem_fk_orders"]["n_checked"] == 4
    assert not out["lineitem_fk_orders"]["passed"]

    assert out["orders_fk_customer"]["n_violations"] == 1          # custkey 9
    assert out["orders_have_lineitems"]["n_violations"] == 1       # order 30
    assert out["part_pkey_unique"]["n_violations"] == 1            # dup key 7
    assert out["lineitem_discount_range"]["n_violations"] == 1     # disc 0.5
    assert out["lineitem_quantity_positive"]["n_violations"] == 1  # qty -1
    assert out["lineitem_ships_after_order"]["n_violations"] == 1  # order 40
    assert out["lineitem_ships_after_order"]["n_checked"] == 3     # joined rows
    assert out["documents_text_complete"]["n_violations"] == 1     # doc 2

    # ledger: order 10 reconciles exactly (100 * 1.1 = 110); order 20 does
    # not (charge 50 vs totalprice 999); orders 30 (childless) and 40
    # (charge 60 == totalprice 60) — 40's single item has qty<0 but the
    # ledger only checks price roll-up, and 60 == 60 reconciles
    assert out["orders_totalprice_reconciles"]["n_checked"] == 3   # 10, 20, 40
    assert out["orders_totalprice_reconciles"]["n_violations"] == 1
    for name, r in out.items():
        assert r["passed"] == (r["n_violations"] == 0), name
