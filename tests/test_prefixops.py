"""Distributed prefix aggregation helpers (operators/prefixops.py) vs the
single-partition window forms they replace."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.operators.prefixops import (
    distributed_rank,
    exclusive_prefix,
    range_bucket,
)


def test_exclusive_prefix_sum_and_max_match_window(spark):
    rng = random.Random(11)
    rows = [(b, rng.randint(-50, 100)) for b in range(17) for _ in range(rng.randint(1, 4))]
    partials = (
        spark.createDataFrame(rows, "bucket int, v long")
        .groupBy("bucket")
        .agg(F.sum("v").alias("sv"), F.max("v").alias("mv"))
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    expect = {
        r["bucket"]: (r["es"], r["em"])
        for r in partials.withColumn("es", F.sum("sv").over(w))
        .withColumn("em", F.max("mv").over(w))
        .collect()
    }
    got_s = {r["bucket"]: r["c"] for r in exclusive_prefix(partials, "bucket", "sv", "sum", "c").collect()}
    got_m = {r["bucket"]: r["c"] for r in exclusive_prefix(partials, "bucket", "mv", "max", "c").collect()}
    for b, (es, em) in expect.items():
        assert got_s[b] == es
        assert got_m[b] == em
    # first bucket has no predecessor -> NULL carry
    assert got_s[min(expect)] is None and got_m[min(expect)] is None


def test_distributed_rank_equals_global_row_number(spark):
    rng = random.Random(23)
    # heavy ties across bucket boundaries stress the monotone-bucket contract
    rows = [(i, rng.randint(0, 30)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long")
    b = range_bucket(df, "k", 8)
    got = {
        r["id"]: r["rn"]
        for r in distributed_rank(b, F.col("bucket"), [F.col("k"), F.col("id")]).collect()
    }
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(W.orderBy("k", "id"))).collect()
    }
    assert got == expect


def test_range_bucket_is_monotone_and_in_range(spark):
    rng = random.Random(7)
    df = spark.createDataFrame([(i, rng.randint(-1000, 1000)) for i in range(300)], "id long, k long")
    rows = range_bucket(df, "k", 16).select("k", "bucket").collect()
    assert all(0 <= r["bucket"] <= 15 for r in rows)
    by_k = sorted(rows, key=lambda r: r["k"])
    assert all(a["bucket"] <= b["bucket"] for a, b in zip(by_k, by_k[1:]))
    # single-value degenerate input -> one bucket, no div-by-zero
    one = spark.createDataFrame([(1, 5), (2, 5)], "id long, k long")
    assert {r["bucket"] for r in range_bucket(one, "k", 16).collect()} == {0}
