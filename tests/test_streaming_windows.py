"""Watermarked streaming window aggregation vs batch oracle (§2.G2/G5).

Append-mode window emission is watermark-driven: a window emits only once
the event-time watermark passes its end. With availableNow single-batch
runs, run N's data sets the watermark that run N+1 uses — so the test
replays the topic in two runs and checks run 2 emits exactly the windows
that closed under run 1's watermark.
"""

import datetime as dt

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from tests.conftest import SF_DIR

LAG = "30 seconds"


def test_append_mode_window_emission_matches_watermark_closure(spark, tmp_root):
    tp = T.create_topic(tmp_root, "wm", n_partitions=2)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    first = env.filter(F.col("sequence_id") < 500)
    T.append(spark, first, tp)

    src = spark.readStream.format("pulsarlike").option("path", tp).load()
    agg = (
        src.withWatermark("event_time", LAG)
        .groupBy(F.window("event_time", "1 hour").alias("w"), F.col("properties")["event_type"].alias("etype"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "etype", "n")
    )

    emitted: list = []

    def grab(batch, _bid):
        emitted.extend(batch.collect())

    def run_once():
        q = (
            agg.writeStream.foreachBatch(grab)
            .outputMode("append")
            .option("checkpointLocation", tmp_root + "/ck_wm")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    assert emitted == []  # nothing closed yet: watermark trails by one batch
    T.append(spark, env.filter(F.col("sequence_id").between(500, 599)), tp)
    run_once()

    # oracle: windows over the first 500 whose end ≤ (max event_time − lag)
    wm = first.agg(F.max("event_time")).collect()[0][0] - dt.timedelta(seconds=30)
    expected_df = (
        first.groupBy(
            F.window("event_time", "1 hour").alias("w"),
            F.col("properties")["event_type"].alias("etype"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(wm))
        .select(F.col("w.start").alias("ws"), "etype", "n")
    )
    expected = {(r["ws"], r["etype"]): r["n"] for r in expected_df.collect()}
    got = {(r["ws"], r["etype"]): r["n"] for r in emitted}
    # run-2's new rows can add counts only to OPEN windows (not yet emitted),
    # so every emitted closed window must match the batch count exactly
    assert got == expected
    assert len(got) > 0


def test_streaming_session_windows_close_under_watermark(spark, tmp_root):
    """Session windows on a stream (beyond-reference G-ext): sessions emit
    once the watermark passes their close (last event + gap); emitted
    sessions match the batch session_window computation over the same rows."""
    tp = T.create_topic(tmp_root, "sess", n_partitions=2)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    first = env.filter(F.col("sequence_id") < 600)
    T.append(spark, first, tp)

    src = spark.readStream.format("pulsarlike").option("path", tp).load()
    agg = (
        src.withWatermark("event_time", "30 seconds")
        .groupBy(F.session_window("event_time", "30 minutes").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "key", "n")
    )
    emitted: list = []

    def grab(batch, _bid):
        emitted.extend(batch.collect())

    def run_once():
        q = (
            agg.writeStream.foreachBatch(grab).outputMode("append")
            .option("checkpointLocation", tmp_root + "/ck_sess")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    run_once()
    assert emitted == []
    T.append(spark, env.filter(F.col("sequence_id").between(600, 699)), tp)
    run_once()
    assert len(emitted) > 0

    import datetime as dt

    wm = first.agg(F.max("event_time")).collect()[0][0] - dt.timedelta(seconds=30)
    expected_df = (
        first.groupBy(F.session_window("event_time", "30 minutes").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(wm))
        .select(F.col("w.start").alias("ws"), "key", "n")
    )
    expected = {(r["ws"], r["key"]): r["n"] for r in expected_df.collect()}
    got = {(r["ws"], r["key"]): r["n"] for r in emitted}
    assert got == expected


def test_streaming_sliding_windows_emit_on_watermark_closure(spark, tmp_root):
    """Sliding windows (G2: slidingIntervalDurationMs, WindowConfig.java:33-39)
    on a stream: each event lands in window_len/slide overlapping windows;
    append-mode emission under the watermark matches the batch computation."""
    tp = T.create_topic(tmp_root, "slide", n_partitions=2)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    first = env.filter(F.col("sequence_id") < 600)
    T.append(spark, first, tp)

    src = spark.readStream.format("pulsarlike").option("path", tp).load()
    agg = (
        src.withWatermark("event_time", LAG)
        .groupBy(F.window("event_time", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    emitted: list = []

    def grab(batch, _bid):
        emitted.extend(batch.collect())

    def run_once():
        q = (
            agg.writeStream.foreachBatch(grab).outputMode("append")
            .option("checkpointLocation", tmp_root + "/ck_slide")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    run_once()
    assert emitted == []
    T.append(spark, env.filter(F.col("sequence_id").between(600, 699)), tp)
    run_once()
    assert len(emitted) > 0

    wm = first.agg(F.max("event_time")).collect()[0][0] - dt.timedelta(seconds=30)
    expected_df = (
        first.groupBy(F.window("event_time", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(wm))
        .select(F.col("w.start").alias("ws"), "n")
    )
    expected = {(r["ws"],): r["n"] for r in expected_df.collect()}
    got = {(r["ws"],): r["n"] for r in emitted}
    assert got == expected


def test_streaming_late_side_topic_routes_exactly_the_watermark_late_rows(spark):
    from pyspark.sql import functions as F

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.envelope import wrap_events
    from pulsar_3_2_codedump_spark.queries import load_all
    from tests.conftest import SF_DIR

    out = load_all()["streaming_late_side_topic"].fn(spark, SF_DIR)
    got = {(r["key"], r["sequence_id"]) for r in out.collect()}
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 600)
    wm = (
        env.filter(F.col("sequence_id") % 7 != 3)
        .agg(F.max("event_time"))
        .collect()[0][0]
    )
    want = {
        (r["key"], r["sequence_id"])
        for r in env.filter(
            (F.col("sequence_id") % 7 == 3)
            & (F.col("event_time") < F.lit(wm) - F.expr("INTERVAL 1 HOUR"))
        ).collect()
    }
    assert got == want and got  # non-vacuous: the fixture has late rows
