"""§2.A8 concrete connector round-trip through the REAL spark-jdbc path
(embedded Derby — ships in every Spark distro). Reference:
pulsar-io/jdbc/core/.../JdbcAbstractSink.java:52,180 (sink),
the pulsar-io source fleet (source side).
"""

import json

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import io as IO
from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from tests.conftest import SF_DIR


def _derby_url(tmp_root, name):
    return f"jdbc:derby:{tmp_root}/{name};create=true"


def _seed_table(spark, url, table):
    nation = load(spark, SF_DIR, "nation")
    (
        nation.write.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("driver", IO.DERBY_DRIVER).mode("overwrite").save()
    )
    return nation


def test_ingest_jdbc_row_identity(spark, tmp_root):
    """External DB table → topic; decoding the payloads reproduces the
    source rows exactly."""
    url = _derby_url(tmp_root, "src_db")
    nation = _seed_table(spark, url, "nation_src")
    tp = T.create_topic(tmp_root, "jdbc-in", n_partitions=2)
    IO.ingest_jdbc(spark, url, "nation_src", tp, key_col="n_nationkey", event_time_col=None)
    env = T.read_topic(spark, tp)
    decoded = env.select(
        F.from_json(
            F.col("value").cast("string"),
            "n_nationkey int, n_name string, n_regionkey int",
        ).alias("r")
    ).select("r.*")
    want = {tuple(r) for r in nation.collect()}
    got = {tuple(r) for r in decoded.collect()}
    assert got == want


def test_sink_jdbc_round_trip(spark, tmp_root):
    """Topic → external DB via foreachBatch + JVM jdbc writer; reading the
    table back shows every message exactly once for a single clean run."""
    tp = T.create_topic(tmp_root, "jdbc-out", n_partitions=2)
    env = (
        wrap_events(load(spark, SF_DIR, "events"))
        .filter(F.col("sequence_id") < 100)
        .drop("partition", "offset")
    )
    T.append(spark, env, tp, dedup=False)
    n = env.count()

    url = _derby_url(tmp_root, "sink_db")
    q = IO.sink_jdbc(spark, tp, url, "events_out", checkpoint=f"{tmp_root}/ck")
    q.awaitTermination(180)

    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "events_out")
        .option("driver", IO.DERBY_DRIVER).load()
    )
    assert back.count() == n
    assert back.select("sequence_id").distinct().count() == n
    assert set(back.columns) >= {"key", "sequence_id", "publish_time", "__batch_id"}


def test_jdbc_roundtrip_query_matches_source(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    q = load_all()["jdbc_roundtrip"]
    got = {tuple(r) for r in q.fn(spark, SF_DIR).collect()}
    want = {tuple(r) for r in load(spark, SF_DIR, "nation").collect()}
    assert got == want


def test_ingest_kafka_requires_kafka_package(spark, tmp_root):
    """No kafka package/broker in this container: the connector must fail
    with Spark's missing-data-source error (i.e., the code path is the real
    spark-kafka form), not some earlier bug."""
    import pytest as _pytest

    tp = T.create_topic(tmp_root, "kafka-in", n_partitions=1)
    with _pytest.raises(Exception) as exc:
        IO.ingest_kafka(spark, "localhost:9092", "events", tp)
    assert "kafka" in str(exc.value).lower()
