"""Multi-version AUTO_CONSUME decode + streaming TableView (§1.3 / §2.A4)."""

import tempfile

from pyspark.sql import functions as F, types as T

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.schema_registry import (
    decode_multi_version,
    register_schema,
)
from tests.conftest import SF_DIR


def _mk_env(spark, rows):
    return spark.createDataFrame(
        [(bytearray(p.encode()), v) for p, v in rows],
        "value binary, schema_version long",
    )


def test_multi_version_decode_conforms_to_reader(spark, tmp_root):
    v0 = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    v1 = T.StructType(v0.fields + [T.StructField("c", T.DoubleType())])
    register_schema(tmp_root, v0)
    register_schema(tmp_root, v1)
    env = _mk_env(
        spark,
        [
            ('{"a": 1, "b": "x"}', 0),
            ('{"a": 2, "b": "y", "c": 2.5}', 1),
        ],
    )
    got = {
        r["data"]["a"]: (r["data"]["b"], r["data"]["c"])
        for r in decode_multi_version(env, tmp_root).collect()
    }
    # v0 row surfaces NULL for the field its writer schema didn't have
    assert got == {1: ("x", None), 2: ("y", 2.5)}


def test_multi_version_decode_drops_unknown_versions(spark, tmp_root):
    v0 = T.StructType([T.StructField("a", T.LongType())])
    register_schema(tmp_root, v0)
    env = _mk_env(spark, [('{"a": 1}', 0), ('{"a": 9}', 99)])
    rows = decode_multi_version(env, tmp_root).collect()
    assert [r["data"]["a"] for r in rows] == [1]


def test_multi_version_decode_reader_dropped_field(spark, tmp_root):
    # FORWARD evolution: reader (latest) REMOVED field b — old payloads'
    # b bytes must disappear from the conformed view.
    v0 = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    v1 = T.StructType([T.StructField("a", T.LongType())])
    register_schema(tmp_root, v0, strategy="FORWARD")
    register_schema(tmp_root, v1, strategy="FORWARD")
    env = _mk_env(spark, [('{"a": 1, "b": "gone"}', 0), ('{"a": 2}', 1)])
    out = decode_multi_version(env, tmp_root)
    assert [f.name for f in out.schema["data"].dataType.fields] == ["a"]
    assert sorted(r["data"]["a"] for r in out.collect()) == [1, 2]


def test_streaming_tableview_matches_batch_view(spark):
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import (
        streaming_tableview,
    )

    got = {
        r["key"]: (r["last_seq"], r["n_updates"])
        for r in streaming_tableview(spark, SF_DIR).collect()
    }
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 400)
    want = {
        r["key"]: (r["last_seq"], r["n_updates"])
        for r in env.groupBy("key")
        .agg(
            F.max("sequence_id").alias("last_seq"),
            F.count(F.lit(1)).alias("n_updates"),
        )
        .collect()
    }
    assert got == want


def test_versioned_view_replay_and_restart_idempotency(spark, tmp_root):
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import _versioned_view

    schema = "k string, cnt long"

    def batch_agg(b):
        return b.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))

    def merge_agg(u):
        return u.groupBy("k").agg(F.sum("cnt").cast("long").alias("cnt"))

    d1 = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    d2 = spark.createDataFrame([("a",), ("c",)], "k string")

    upsert, state = _versioned_view(tmp_root, schema, batch_agg, merge_agg)
    upsert(d1, 0)
    p0 = state["path"]
    upsert(d1, 0)  # same-process replay of batch 0 must be a no-op
    assert state["path"] == p0
    upsert(d2, 1)
    got = {r["k"]: r["cnt"] for r in spark.read.parquet(state["path"]).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}  # no double-count from the replay

    # driver restart: a fresh sink over the same root must ADOPT completed
    # batch dirs instead of re-merging them
    upsert2, state2 = _versioned_view(tmp_root, schema, batch_agg, merge_agg)
    upsert2(d1, 0)
    upsert2(d2, 1)
    got2 = {r["k"]: r["cnt"] for r in spark.read.parquet(state2["path"]).collect()}
    assert got2 == got
    # and new work on top of the adopted state merges normally
    upsert2(spark.createDataFrame([("b",)], "k string"), 2)
    got3 = {r["k"]: r["cnt"] for r in spark.read.parquet(state2["path"]).collect()}
    assert got3 == {"a": 3, "b": 2, "c": 1}
