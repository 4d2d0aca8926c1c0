"""Streaming dedup (dropDuplicatesWithinWatermark) and stream-stream interval
join — batch-oracle equivalence at sf0.001 (the driver hash-checks the same
queries against DuckDB; these tests pin the semantics in the suite)."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.queries import load_all
from tests.conftest import SF_DIR


def test_streaming_dedup_suppresses_redelivered_duplicates(spark):
    out = load_all()["streaming_dedup"].fn(spark, SF_DIR).collect()
    seqs = [r["sequence_id"] for r in out]
    # exactly one row per distinct sequence — the re-appended 100..200 storm
    # must be suppressed by cross-run state, the fresh 300..399 must appear
    assert len(seqs) == len(set(seqs))
    expected = {
        r["sequence_id"]
        for r in wrap_events(load(spark, SF_DIR, "events"))
        .filter(F.col("sequence_id") < 400)
        .select("sequence_id")
        .collect()
    }
    assert set(seqs) == expected


def test_stream_stream_join_matches_batch_interval_join(spark):
    out = load_all()["streaming_stream_stream_join"].fn(spark, SF_DIR)
    got = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in out.collect()}
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 2000)
    c = env.filter(F.col("properties")["event_type"] == "click").select(
        F.col("key").alias("c_key"), F.col("sequence_id").alias("click_seq"),
        F.col("event_time").alias("ct"),
    )
    p = env.filter(F.col("properties")["event_type"] == "purchase").select(
        F.col("key").alias("p_key"), F.col("sequence_id").alias("purchase_seq"),
        F.col("event_time").alias("pt"),
    )
    batch = (
        c.join(p, F.expr("c_key = p_key AND pt >= ct AND pt <= ct + interval 240 minutes"))
        .select(
            F.col("c_key").alias("key"), "click_seq", "purchase_seq",
            (F.unix_micros("pt") - F.unix_micros("ct")).alias("lag_us"),
        )
    )
    want = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_left_outer_join_matches_batch_left_join(spark):
    out = load_all()["streaming_left_outer_join"].fn(spark, SF_DIR)
    got = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in out.collect()}
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 1200)
    c = env.filter(F.col("properties")["event_type"] == "click").select(
        F.col("key").alias("c_key"), F.col("sequence_id").alias("click_seq"),
        F.col("event_time").alias("ct"),
    )
    p = env.filter(F.col("properties")["event_type"] == "purchase").select(
        F.col("key").alias("p_key"), F.col("sequence_id").alias("purchase_seq"),
        F.col("event_time").alias("pt"),
    )
    batch = c.join(
        p,
        F.expr("c_key = p_key AND pt >= ct AND pt <= ct + interval 240 minutes"),
        "leftOuter",
    ).select(
        F.col("c_key").alias("key"), "click_seq", "purchase_seq",
        (F.unix_micros("pt") - F.unix_micros("ct")).alias("lag_us"),
    )
    want = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in batch.collect()}
    assert got == want
    # the outer leg actually fired: some clicks have no purchase in-window
    assert any(r[2] is None for r in got)
    # and no sentinel artifacts leaked into the result
    assert all(r[0] != "__sentinel__" for r in got)


def test_stream_full_outer_join_matches_batch_full_join(spark):
    out = load_all()["streaming_full_outer_join"].fn(spark, SF_DIR)
    got = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in out.collect()}
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 1200)
    c = env.filter(F.col("properties")["event_type"] == "click").select(
        F.col("key").alias("c_key"), F.col("sequence_id").alias("click_seq"),
        F.col("event_time").alias("ct"),
    )
    p = env.filter(F.col("properties")["event_type"] == "purchase").select(
        F.col("key").alias("p_key"), F.col("sequence_id").alias("purchase_seq"),
        F.col("event_time").alias("pt"),
    )
    batch = c.join(
        p,
        F.expr("c_key = p_key AND pt >= ct AND pt <= ct + interval 240 minutes"),
        "fullOuter",
    ).select(
        F.coalesce(F.col("c_key"), F.col("p_key")).alias("key"),
        "click_seq", "purchase_seq",
        (F.unix_micros("pt") - F.unix_micros("ct")).alias("lag_us"),
    )
    want = {(r["key"], r["click_seq"], r["purchase_seq"], r["lag_us"]) for r in batch.collect()}
    assert got == want
    # both outer legs actually fired
    assert any(r[2] is None for r in got)  # click with no purchase
    assert any(r[1] is None for r in got)  # purchase with no click
    assert all(r[0] != "__sentinel__" for r in got)
