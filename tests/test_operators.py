"""Batch operator semantics spot-checks (the full oracle parity run lives in
tools/verify_local.py; these pin the SEMANTICS, not just oracle agreement)."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.operators.compaction import (
    compact,
    latest_per_key,
    strategic_compact,
)
from pulsar_3_2_codedump_spark.operators.dedup import dedup_exact, dedup_highest_sequence
from pulsar_3_2_codedump_spark.operators.routing import key_shared_bucket, route_by_key
from pulsar_3_2_codedump_spark.operators.timeops import visible_as_of
from tests.conftest import SF_DIR


def _env(spark):
    return wrap_events(load(spark, SF_DIR, "events"))


def test_envelope_offsets_dense_per_partition(spark):
    env = _env(spark)
    for r in env.groupBy("partition").agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n")
    ).collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_tableview_one_row_per_key_latest_offset(spark):
    env = _env(spark)
    tv = latest_per_key(env)
    assert tv.count() == env.select("key").distinct().count()
    # each key's row carries that key's max (partition, offset)
    joined = tv.alias("t").join(env.alias("e"), "key").filter(
        (F.col("e.partition") == F.col("t.partition")) & (F.col("e.offset") > F.col("t.offset"))
    )
    assert joined.count() == 0


def test_compaction_drops_keys_whose_latest_is_tombstone(spark):
    env = _env(spark)
    kept = compact(env, tombstone=F.col("properties")["event_type"] == "error")
    # no kept row is a tombstone
    assert kept.filter(F.col("properties")["event_type"] == "error").count() == 0
    # and keys are a subset of all keys
    assert kept.count() <= env.select("key").distinct().count()


def test_strategic_compaction_picks_max_rank(spark):
    env = _env(spark).withColumn("rank_expr", F.col("sequence_id").cast("double"))
    out = strategic_compact(env, F.col("rank_expr"), ["sequence_id"])
    # keep-rule = max sequence_id per key
    expected = env.groupBy("key").agg(F.max("sequence_id").alias("sequence_id"))
    diff = out.select("key", "sequence_id").exceptAll(expected)
    assert diff.count() == 0


def test_dedup_exact_collapses_replays(spark):
    env = _env(spark)
    replayed = env.unionByName(env.filter(F.col("sequence_id") % 3 == 0))
    assert dedup_exact(replayed).count() == env.count()
    hwm = dedup_highest_sequence(env)
    assert hwm.count() == 4  # producers


def test_visible_as_of_excludes_pending_delays(spark):
    env = _env(spark)
    # pick an instant strictly inside some message's delay window so at least
    # one message is published-but-held (delays are ≤490s, so a fixed date
    # rarely catches one at small SF)
    import datetime as dt

    probe = (
        env.filter(F.col("deliver_at") > F.col("publish_time") + F.expr("INTERVAL 10 SECONDS"))
        .select("publish_time")
        .first()
    )
    as_of = (probe["publish_time"] + dt.timedelta(seconds=2)).strftime("%Y-%m-%d %H:%M:%S")
    vis = visible_as_of(env, as_of)
    # nothing published later is visible
    assert vis.filter(F.col("publish_time") > F.lit(as_of).cast("timestamp")).count() == 0
    # nothing still delayed is visible
    assert vis.filter(F.col("deliver_at") > F.lit(as_of).cast("timestamp")).count() == 0
    # but some delayed messages published before as_of are excluded
    held = env.filter(
        (F.col("publish_time") <= F.lit(as_of).cast("timestamp"))
        & (F.col("deliver_at") > F.lit(as_of).cast("timestamp"))
    )
    assert held.count() > 0
    assert vis.count() + held.count() == env.filter(
        F.col("publish_time") <= F.lit(as_of).cast("timestamp")
    ).count()


def test_key_shared_bucket_stable_and_total(spark):
    env = _env(spark)
    assigned = env.withColumn("consumer", key_shared_bucket(F.col("key"), 4))
    # every message lands on exactly one consumer 0..3
    mn, mx = assigned.agg(F.min("consumer"), F.max("consumer")).collect()[0]
    assert 0 <= mn and mx <= 3
    # a key maps to exactly one consumer (per-key ordering preservable)
    multi = assigned.groupBy("key").agg(F.countDistinct("consumer").alias("nc")).filter("nc > 1")
    assert multi.count() == 0


def test_route_by_key_colocates_keys(spark):
    env = _env(spark)
    routed = route_by_key(env, 8)
    pid = F.spark_partition_id()
    spread = (
        routed.withColumn("pid", pid)
        .groupBy("key")
        .agg(F.countDistinct("pid").alias("np"))
        .filter("np > 1")
    )
    assert spread.count() == 0


def test_consistent_hash_ring_selector(spark):
    """ConsistentHashingStickyKeyConsumerSelector parity: roughly balanced
    assignment, and the consistent-hashing stability guarantee — removing a
    consumer reassigns ONLY that consumer's keys."""
    from pulsar_3_2_codedump_spark.operators.routing import (
        consistent_hash_ring,
        consistent_hash_select,
    )

    consumers = ["c0", "c1", "c2", "c3"]
    ring4 = consistent_hash_ring(consumers, points_per_consumer=25)
    ring3 = consistent_hash_ring(consumers[:3], points_per_consumer=25)
    # ring3 is ring4 minus c3's points, verbatim (ring is per-consumer stable)
    assert set(ring3) == {p for p in ring4 if p[1] != "c3"}

    keys = spark.range(2000).select(F.concat(F.lit("k"), "id").alias("key"))
    both = keys.select(
        "key",
        consistent_hash_select(F.col("key"), ring4).alias("with4"),
        consistent_hash_select(F.col("key"), ring3).alias("with3"),
    ).collect()
    share = {c: sum(1 for r in both if r["with4"] == c) / len(both) for c in consumers}
    assert all(0.10 < s < 0.45 for s in share.values()), share
    moved = [r for r in both if r["with4"] != r["with3"]]
    assert moved and all(r["with4"] == "c3" for r in moved)


def test_ordering_key_overrides_key_for_key_shared_dispatch(spark):
    # PulsarApi.proto:140 / Message.getOrderingKey: Key_Shared dispatch
    # hashes the ordering key when present, the partition key otherwise —
    # two messages sharing a key but carrying different ordering keys may
    # land on different consumers, and vice versa
    from pulsar_3_2_codedump_spark.operators.routing import (
        dispatch_key,
        key_shared_bucket,
    )

    df = spark.createDataFrame(
        [
            ("user-1", None),            # falls back to key
            ("user-1", b"device-a"),     # overridden
            ("user-2", b"device-a"),     # same ordering key -> same consumer
        ],
        "key string, ordering_key binary",
    )
    out = df.withColumn("consumer", key_shared_bucket(dispatch_key(df), 4)).collect()
    by = {(r["key"], bytes(r["ordering_key"]) if r["ordering_key"] else None): r["consumer"] for r in out}
    # rows 2 and 3 share the ordering key -> identical consumer
    assert by[("user-1", b"device-a")] == by[("user-2", b"device-a")]
    # fallback row hashes the key itself
    ref = df.filter("ordering_key IS NULL").withColumn(
        "consumer", key_shared_bucket(F.col("key"), 4)
    ).collect()[0]["consumer"]
    assert by[("user-1", None)] == ref
    # frames WITHOUT the column keep hashing the key (back-compat path)
    plain = spark.createDataFrame([("user-1",)], "key string")
    got = plain.withColumn("consumer", key_shared_bucket(dispatch_key(plain), 4)).collect()
    assert got[0]["consumer"] == ref


def test_entry_filter_reschedule_redelivers_after_delay(spark):
    # EntryFilter.FilterResult.RESCHEDULE (EntryFilter.java:42-54): a
    # rescheduled entry is postponed, NOT dropped — it must re-dispatch once
    # its postponement elapses, and a REJECTed entry must never appear.
    from pulsar_3_2_codedump_spark.operators.routing import entry_filter_dispatch

    rows = [
        # (key, event_type, publish_time)
        ("a", "purchase", "2024-01-10 00:00:00"),  # ACCEPT
        ("b", "signup", "2024-01-14 23:00:00"),    # RESCHEDULE, due 01:00
        ("c", "signup", "2024-01-14 21:00:00"),    # RESCHEDULE, due 23:00
        ("d", "click", "2024-01-10 00:00:00"),     # REJECT
    ]
    env = spark.createDataFrame(rows, "key string, et string, pt string").select(
        "key",
        F.create_map(F.lit("event_type"), F.col("et")).alias("properties"),
        F.col("pt").cast("timestamp").alias("publish_time"),
    )
    et = F.col("properties")["event_type"]
    verdict = (
        F.when(et == "click", F.lit("REJECT"))
        .when(et == "signup", F.lit("RESCHEDULE"))
        .otherwise(F.lit("ACCEPT"))
    )

    def dispositions(as_of):
        out = entry_filter_dispatch(env, verdict, as_of, delay_hours=2)
        return {r["key"]: r["disposition"] for r in out.collect()}

    # T1 = 2024-01-15 00:00: c's 2h postponement elapsed (due 23:00), b's
    # has not (due 01:00 next day) — b sits in the redelivery set
    at_t1 = dispositions("2024-01-15 00:00:00")
    assert at_t1 == {
        "a": "delivered",
        "b": "pending",
        "c": "redelivered",
        "d": "rejected",
    }
    # T2 = 2024-01-15 02:00: b's postponement elapsed too — the pending
    # entry re-delivered; the REJECTed entry still never delivers
    at_t2 = dispositions("2024-01-15 02:00:00")
    assert at_t2 == {
        "a": "delivered",
        "b": "redelivered",
        "c": "redelivered",
        "d": "rejected",
    }
