"""SURVEY §7's minimum end-to-end slice: ingest events → topic →
readStream → windowed aggregation → sink topic, checked against the batch
equivalent over the same rows. This exercises source, envelope, watermark,
window agg, sink, and offsets — the spine of everything else."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.streaming.replicator import windowed_with_late_side_output
from tests.conftest import SF_DIR


def test_spine_windowed_agg_to_sink_topic(spark, tmp_root):
    src = T.create_topic(tmp_root, "events", n_partitions=4)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    T.append(spark, env, src)
    agg_tp = T.create_topic(tmp_root, "events-windowed", n_partitions=2)
    late_tp = T.create_topic(tmp_root, "events-late", n_partitions=2)

    q = windowed_with_late_side_output(
        spark, src, agg_tp, late_tp,
        window_duration="1 hour", watermark_lag="30 seconds",
        checkpoint=tmp_root + "/ck_spine",
    )
    q.awaitTermination(240)

    # sink topic holds one message per (window, event_type) with count payload
    out = T.read_topic(spark, agg_tp, )
    decoded = out.select(
        F.col("key").alias("etype"),
        F.col("event_time").alias("window_start"),
        F.col("value").cast("string").cast("long").alias("n"),
    )
    # batch oracle over the same rows (single batch → no late drops)
    expected = (
        load(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("event_type").alias("etype"), F.col("w.start").alias("window_start"), "n")
    )
    got = {(r["etype"], r["window_start"]): r["n"] for r in decoded.collect()}
    want = {(r["etype"], r["window_start"]): r["n"] for r in expected.collect()}
    assert got == want
    assert T.read_topic(spark, late_tp).count() == 0  # one batch → nothing late


def test_spine_late_data_routed_on_second_batch(spark, tmp_root):
    """Events older than (max seen − lag) on a later batch land in the late
    topic (WindowConfig.lateDataTopic semantics, §2.G6)."""
    src = T.create_topic(tmp_root, "events2", n_partitions=2)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    T.append(spark, env.filter(F.col("sequence_id") < 500), src)
    agg_tp = T.create_topic(tmp_root, "agg2", n_partitions=2)
    late_tp = T.create_topic(tmp_root, "late2", n_partitions=2)

    def run():
        q = windowed_with_late_side_output(
            spark, src, agg_tp, late_tp,
            window_duration="1 hour", watermark_lag="30 seconds",
            checkpoint=tmp_root + "/ck2",
        )
        q.awaitTermination(240)

    run()  # batch 1 establishes the watermark
    # append a replay of OLD events (they are now far behind the watermark)
    old = env.filter(F.col("sequence_id") < 100).withColumn(
        "producer_name", F.lit("replayer")
    )
    T.append(spark, old, src)
    run()  # batch 2 routes them to the late topic
    assert T.read_topic(spark, late_tp).count() == 100
