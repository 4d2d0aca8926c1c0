"""The pulsarlike data source: batch/stream read, offsets, seek, sink (§2.A, §4)."""

import json

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from tests.conftest import SF_DIR


def _make_topic(spark, root, name="events", parts=4):
    tp = T.create_topic(root, name, n_partitions=parts)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    T.append(spark, env, tp)
    return tp


def test_batch_read_matches_topic(spark, tmp_root):
    tp = _make_topic(spark, tmp_root)
    df = spark.read.format("pulsarlike").option("path", tp).load()
    assert df.count() == 1000
    assert set(df.columns) >= {"key", "value", "partition", "offset", "publish_time"}
    # per-key ordering guarantee: within a partition offsets are unique+dense
    stats = df.groupBy("partition").agg(F.max("offset").alias("hi"), F.count("*").alias("n")).collect()
    for r in stats:
        assert r["hi"] == r["n"] - 1


def test_stream_read_available_now(spark, tmp_root):
    tp = _make_topic(spark, tmp_root)
    q = (
        spark.readStream.format("pulsarlike").option("path", tp).load()
        .groupBy("partition").count()
        .writeStream.format("memory").queryName("src_all").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["partition"]: r["count"] for r in spark.sql("select * from src_all").collect()}
    assert sum(got.values()) == 1000


def test_stream_flow_control_bounded_read(spark, tmp_root):
    """maxRecordsPerTrigger = flow-control permits (§2.J2): one trigger
    advances each partition by at most the cap."""
    tp = _make_topic(spark, tmp_root)
    q = (
        spark.readStream.format("pulsarlike").option("path", tp)
        .option("maxRecordsPerTrigger", "50").load()
        .writeStream.format("memory").queryName("src_capped").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from src_capped").collect()[0]["c"]
    assert n == 4 * 50  # 4 partitions × cap


def test_starting_offsets_latest_and_explicit(spark, tmp_root):
    tp = _make_topic(spark, tmp_root)
    ends = T.end_offsets(T.read_manifest(tp))
    # latest → nothing to read
    q = (
        spark.readStream.format("pulsarlike").option("path", tp)
        .option("startingOffsets", "latest").load()
        .writeStream.format("memory").queryName("src_latest").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) c from src_latest").collect()[0]["c"] == 0
    # explicit offsets → exact suffix count
    start = {str(p): e - 5 for p, e in ends.items()}
    q2 = (
        spark.readStream.format("pulsarlike").option("path", tp)
        .option("startingOffsets", json.dumps(start)).load()
        .writeStream.format("memory").queryName("src_explicit").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    assert spark.sql("select count(*) c from src_explicit").collect()[0]["c"] == 20


def test_seek_by_timestamp_matches_predicate(spark, tmp_root):
    """startingOffsets=timestamp:<iso> ≙ filter(publish_time >= ts) (§2.F5)."""
    tp = _make_topic(spark, tmp_root)
    ts = "2024-01-15T00:00:00"
    q = (
        spark.readStream.format("pulsarlike").option("path", tp)
        .option("startingOffsets", f"timestamp:{ts}").load()
        .writeStream.format("memory").queryName("src_seek").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) c from src_seek").collect()[0]["c"]
    expected = (
        spark.read.format("pulsarlike").option("path", tp).load()
        .filter(F.col("publish_time") >= F.lit(ts).cast("timestamp")).count()
    )
    assert got == expected


def test_stream_sink_roundtrip_and_offsets(spark, tmp_root):
    src_tp = _make_topic(spark, tmp_root)
    dst_tp = T.create_topic(tmp_root, "copy", n_partitions=4)
    q = (
        spark.readStream.format("pulsarlike").option("path", src_tp).load()
        .writeStream.format("pulsarlike").option("path", dst_tp)
        .option("checkpointLocation", tmp_root + "/ck")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    out = spark.read.format("pulsarlike").option("path", dst_tp).load()
    assert out.count() == 1000
    for r in out.groupBy("partition").agg(F.max("offset").alias("hi"), F.count("*").alias("n")).collect():
        assert r["hi"] == r["n"] - 1  # sink assigned dense offsets
    # restart with same checkpoint: no new data → no duplicates (idempotent)
    q2 = (
        spark.readStream.format("pulsarlike").option("path", src_tp).load()
        .writeStream.format("pulsarlike").option("path", dst_tp)
        .option("checkpointLocation", tmp_root + "/ck")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(180)
    assert spark.read.format("pulsarlike").option("path", dst_tp).load().count() == 1000


def test_batch_writer_via_format(spark, tmp_root):
    """A1 batch producer surface: df.write.format('pulsarlike').save()."""
    tp = T.create_topic(tmp_root, "w", n_partitions=4)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("offset")
    env.write.format("pulsarlike").option("path", tp).mode("append").save()
    out = spark.read.format("pulsarlike").option("path", tp).load()
    assert out.count() == 1000
    for r in out.groupBy("partition").agg(F.max("offset").alias("hi"), F.count("*").alias("n")).collect():
        assert r["hi"] == r["n"] - 1


def test_batch_reader_filter_pushdown_prunes(spark, tmp_root):
    """§2.C1 at the custom source: offset/partition predicates are pushed
    into segment listing (and results still correct)."""
    tp = _make_topic(spark, tmp_root)
    df = spark.read.format("pulsarlike").option("path", tp).load()
    sub = df.filter((F.col("offset") >= 100) & (F.col("partition") == 2))
    rows = sub.collect()
    full = {(r["partition"], r["offset"]) for r in df.collect()}
    assert {(r["partition"], r["offset"]) for r in rows} == {
        (p, o) for (p, o) in full if p == 2 and o >= 100
    }
    # the predicates were CONSUMED by pushdown: no post-scan Filter node remains
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" not in plan and "+- Filter" not in plan


def test_multi_topic_streaming_union(spark, tmp_root):
    """A5 streaming form: one query consuming N topics via unionByName of
    sources (MultiTopicsConsumerImpl semantics), each with its own offsets."""
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    tp_a = T.create_topic(tmp_root, "ta", n_partitions=2)
    tp_b = T.create_topic(tmp_root, "tb", n_partitions=2)
    T.append(spark, env.filter(F.col("sequence_id") < 400), tp_a)
    T.append(spark, env.filter(F.col("sequence_id") >= 400), tp_b)
    a = spark.readStream.format("pulsarlike").option("path", tp_a).load().withColumn("topic", F.lit("ta"))
    b = spark.readStream.format("pulsarlike").option("path", tp_b).load().withColumn("topic", F.lit("tb"))
    q = (
        a.unionByName(b).groupBy("topic").count()
        .writeStream.format("memory").queryName("mt").outputMode("complete")
        .option("checkpointLocation", tmp_root + "/ck_mt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r["topic"]: r["count"] for r in spark.sql("select * from mt").collect()}
    assert got == {"ta": 400, "tb": 600}


def test_per_key_order_preserved_through_stream_copy(spark, tmp_root):
    """Key_Shared's core guarantee end-to-end (§2.B3): after a full
    stream-copy (source -> sink), each key's messages appear in the
    destination in the same relative order (by offset) as in the source."""
    src_tp = _make_topic(spark, tmp_root, parts=4)
    dst_tp = T.create_topic(tmp_root, "ordered-copy", n_partitions=4)
    q = (
        spark.readStream.format("pulsarlike").option("path", src_tp).load()
        .writeStream.format("pulsarlike").option("path", dst_tp)
        .option("checkpointLocation", tmp_root + "/ck_ord")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    def key_sequences(tp):
        df = spark.read.format("pulsarlike").option("path", tp).load()
        rows = df.select("key", "partition", "offset", "sequence_id").collect()
        seqs = {}
        for r in sorted(rows, key=lambda r: (r["partition"], r["offset"])):
            seqs.setdefault(r["key"], []).append(r["sequence_id"])
        return seqs

    src_seqs = key_sequences(src_tp)
    dst_seqs = key_sequences(dst_tp)
    assert set(src_seqs) == set(dst_seqs)
    for k in src_seqs:
        assert src_seqs[k] == dst_seqs[k], f"per-key order broken for key {k}"
