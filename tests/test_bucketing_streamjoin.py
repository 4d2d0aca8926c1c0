"""Scale patterns with evidence: bucketed co-located joins (no shuffle) and
stream-stream interval joins (SURVEY §2.M at streaming time).

Bucketing is the 100 TB answer to repeated fact-fact joins: both tables
hash-bucketed on the join key at write time ⇒ SortMergeJoin with NO Exchange
on either side. The test asserts that from the physical plan.
"""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_root):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_root}/warehouse'")
    try:
        (
            load(spark, SF_DIR, "orders")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").format("parquet").saveAsTable("bktdb.orders_b")
        )
        (
            load(spark, SF_DIR, "lineitem")
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").format("parquet").saveAsTable("bktdb.lineitem_b")
        )
        o = spark.table("bktdb.orders_b")
        li = spark.table("bktdb.lineitem_b")
        joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself is exchange-free: co-located buckets feed the SMJ
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result matches the unbucketed join
        expected = (
            load(spark, SF_DIR, "lineitem")
            .join(load(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        )
        got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        want = {r["o_orderpriority"]: r["n"] for r in expected.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_stream_stream_interval_join(spark, tmp_root):
    """Stream-stream interval join over two topic streams: each purchase
    joined to the same user's views within the preceding hour; checked
    against the identical batch join."""
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    tp = T.create_topic(tmp_root, "ev", n_partitions=2)
    T.append(spark, env, tp)

    def side(kind):
        s = (
            spark.readStream.format("pulsarlike").option("path", tp).load()
            .filter(F.col("properties")["event_type"] == kind)
            .withWatermark("event_time", "1 hour")
        )
        return s.select(
            F.col("key").alias(f"{kind}_key"),
            F.col("sequence_id").alias(f"{kind}_seq"),
            F.col("event_time").alias(f"{kind}_time"),
        )

    purchases, views = side("purchase"), side("view")
    joined = purchases.join(
        views,
        (F.col("purchase_key") == F.col("view_key"))
        & (F.col("view_time") <= F.col("purchase_time"))
        & (F.col("view_time") >= F.col("purchase_time") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_key", "purchase_seq", "view_seq")
    q = (
        joined.writeStream.format("memory").queryName("ssj").outputMode("append")
        .option("checkpointLocation", tmp_root + "/ck_ssj")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {(r["purchase_seq"], r["view_seq"]) for r in spark.sql("select * from ssj").collect()}

    ev = load(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pseq"), F.col("ts").alias("pt")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("vseq"), F.col("ts").alias("vt")
    )
    batch = p.join(
        v,
        (F.col("u") == F.col("u2"))
        & (F.col("vt") <= F.col("pt"))
        & (F.col("vt") >= F.col("pt") - F.expr("INTERVAL 1 HOUR")),
    )
    want = {(r["pseq"], r["vseq"]) for r in batch.collect()}
    assert got == want and len(got) > 0
