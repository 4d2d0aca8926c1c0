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
