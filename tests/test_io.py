"""Pulsar IO bridges, non-persistent topics, interceptors, metrics
(§2.A6-A8, §2.A10, §2.J7, §2.H2)."""

import time

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.io import (
    InterceptorListener,
    ingest_external,
    nonpersistent_stream,
    sink_to_external,
)
from pulsar_3_2_codedump_spark.streaming.function_runtime import with_metrics
from tests.conftest import SF_DIR


def test_source_connector_ingests_parquet(spark, tmp_root):
    tp = T.create_topic(tmp_root, "ingested", n_partitions=4)
    ends = ingest_external(
        spark, f"{SF_DIR}/orders.parquet", "parquet", tp,
        key_col="o_custkey", event_time_col="o_orderdate",
    )
    assert sum(ends.values()) == 1500
    env = T.read_topic(spark, tp)
    # payload is JSON of the source row; key is the custkey
    row = env.first()
    assert row["key"].isdigit()
    assert b"o_orderkey" in bytes(row["value"])


def test_sink_connector_exports_topic(spark, tmp_root):
    tp = T.create_topic(tmp_root, "exp", n_partitions=2)
    ingest_external(
        spark, f"{SF_DIR}/orders.parquet", "parquet", tp,
        key_col="o_custkey", event_time_col="o_orderdate",
    )
    out = tmp_root + "/export"
    q = sink_to_external(
        spark, tp, out, "parquet", tmp_root + "/ck_exp",
        transform=lambda df: df.select("key", "partition", "offset", "publish_time"),
    )
    q.awaitTermination(180)
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == 1500
    assert "batch_id" in back.columns  # per-batch idempotent layout


def test_nonpersistent_stream_flows_without_storage(spark, tmp_root):
    src = nonpersistent_stream(spark, rows_per_second=200)
    q = (
        src.groupBy("partition").count()
        .writeStream.format("memory").queryName("np").outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = 0
        while time.time() < deadline:
            got = sum(r["count"] for r in spark.sql("select * from np").collect())
            if got > 0:
                break
            time.sleep(1)
        assert got > 0
    finally:
        q.stop()


def test_interceptor_listener_records_batches(spark, tmp_root):
    tp = T.create_topic(tmp_root, "obs", n_partitions=2)
    ingest_external(
        spark, f"{SF_DIR}/orders.parquet", "parquet", tp,
        key_col="o_custkey", event_time_col="o_orderdate",
    )
    lis = InterceptorListener().attach(spark)
    try:
        src = spark.readStream.format("pulsarlike").option("path", tp).load()
        observed = with_metrics(src, "envelope_metrics", F.count(F.lit(1)).alias("n"))
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", tmp_root + "/ck_obs")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        time.sleep(2)  # listener events are async
        progress = [e for e in lis.events if e["type"] == "progress" and e["numInputRows"]]
        assert progress
        assert progress[0]["numInputRows"] == 1500
        obs = progress[0]["observed"].get("envelope_metrics")
        assert obs is not None and obs["n"] == 1500
    finally:
        lis.detach(spark)
