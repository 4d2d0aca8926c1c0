"""Schema registry: version log, compatibility strategies, decode (§1.1/§1.3)."""

import pytest

from pyspark.sql import functions as F, types as T

from pulsar_3_2_codedump_spark import schema_registry as SR
from pulsar_3_2_codedump_spark import topic as TP
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from tests.conftest import SF_DIR

V1 = T.StructType([T.StructField("k", T.LongType(), True)])
V2_OK = T.StructType(
    [T.StructField("k", T.LongType(), True), T.StructField("extra", T.StringType(), True)]
)
V2_BAD = T.StructType([T.StructField("k", T.StringType(), True)])  # type change


def test_register_and_resolve_latest(tmp_root):
    tp = TP.create_topic(tmp_root, "t", 1)
    assert SR.register_schema(tp, V1) == 0
    assert SR.register_schema(tp, V2_OK) == 1
    assert SR.get_schema(tp).fieldNames() == ["k", "extra"]  # AUTO_CONSUME = latest
    assert SR.get_schema(tp, 0).fieldNames() == ["k"]


def test_backward_rejects_type_change(tmp_root):
    tp = TP.create_topic(tmp_root, "t", 1)
    SR.register_schema(tp, V1)
    with pytest.raises(SR.SchemaIncompatibleError):
        SR.register_schema(tp, V2_BAD, strategy="BACKWARD")


def test_forward_rejects_required_removal(tmp_root):
    tp = TP.create_topic(tmp_root, "t", 1)
    wide = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.LongType(), False)]
    )
    narrow = T.StructType([T.StructField("k", T.LongType(), False)])
    SR.register_schema(tp, wide)
    # FORWARD: old (wide, with required v) must read new (narrow) data → fails
    with pytest.raises(SR.SchemaIncompatibleError):
        SR.register_schema(tp, narrow, strategy="FORWARD")
    # BACKWARD allows dropping a field (new reader ignores old extra field)
    assert SR.register_schema(tp, narrow, strategy="BACKWARD") == 1


def test_none_strategy_accepts_anything(tmp_root):
    tp = TP.create_topic(tmp_root, "t", 1)
    SR.register_schema(tp, V1)
    assert SR.register_schema(tp, V2_BAD, strategy="NONE") == 1


def test_decode_value_roundtrip(spark, tmp_root):
    tp = TP.create_topic(tmp_root, "t", 2)
    env = wrap_events(load(spark, SF_DIR, "events")).drop("partition", "offset")
    TP.append(spark, env, tp)
    SR.register_schema(tp, V1)
    decoded = SR.decode_auto_consume(TP.read_topic(spark, tp), tp)
    row = decoded.filter(F.col("data.k").isNotNull()).select("data.k").first()
    assert row is not None and isinstance(row["k"], int)
    # decoded k matches the JSON in properties
    chk = decoded.withColumn("k2", F.get_json_object(F.col("properties")["props"], "$.k").cast("long"))
    assert chk.filter(F.col("data.k") != F.col("k2")).count() == 0


def test_key_value_schema_shape():
    kv = SR.key_value_schema(T.StringType(), V1)
    assert kv.fieldNames() == ["key", "value"]
    assert kv["value"].dataType == V1


def test_registry_protobuf_roundtrip_and_compat(spark, tmp_root):
    """PROTOBUF registered format: decode_value dispatches to the wire-format
    codec; the descriptor compat gate rejects wire-type changes even under
    strategy NONE's structural pass-through counterpart."""
    import pytest as _pytest

    from pyspark.sql import functions as F, types as T2

    from pulsar_3_2_codedump_spark import schema_registry as SR
    from pulsar_3_2_codedump_spark import topic as T
    from pulsar_3_2_codedump_spark.functions.proto_codec import proto_encode

    tp = T.create_topic(tmp_root, "pbt", n_partitions=1)
    sch = T2.StructType(
        [T2.StructField("a", T2.LongType()), T2.StructField("b", T2.StringType())]
    )
    SR.register_schema(tp, sch, schema_type="PROTOBUF")
    src = spark.createDataFrame([(1, "x"), (2, "y")], sch)
    env = proto_encode(src, sch, out_col="value")
    decoded = SR.decode_value(env, tp).select("data.a", "data.b")
    assert sorted(tuple(r) for r in decoded.collect()) == [(1, "x"), (2, "y")]

    # adding a field (new number) is admitted
    SR.register_schema(
        tp, T2.StructType(sch.fields + [T2.StructField("c", T2.DoubleType())]),
        schema_type="PROTOBUF",
    )
    # descriptor-level value-add: RENAME field 1 and change its wire type —
    # structural (name-keyed) BACKWARD admits it (old 'a' dropped, new
    # nullable 'a2'), but field NUMBER 1 changed long→string on the wire,
    # which makes old payloads undecodable → rejected
    with _pytest.raises(SR.SchemaIncompatibleError):
        SR.register_schema(
            tp,
            T2.StructType([T2.StructField("a2", T2.StringType(), True), sch.fields[1]]),
            strategy="BACKWARD",
            schema_type="PROTOBUF",
        )
    # strategy NONE (AlwaysCompatible) skips every check, descriptor included
    SR.register_schema(
        tp,
        T2.StructType([T2.StructField("a", T2.StringType()), sch.fields[1]]),
        strategy="NONE",
        schema_type="PROTOBUF",
    )


def test_protobuf_decode_keeps_value_column(spark, tmp_root):
    """All three formats must return the same envelope shape: the raw 'value'
    column survives decode_value for PROTOBUF exactly as it does for JSON and
    AVRO (ADVICE r5: the PROTOBUF branch used to consume it)."""
    from pyspark.sql import types as T2

    from pulsar_3_2_codedump_spark.functions.proto_codec import proto_encode

    tp = TP.create_topic(tmp_root, "pbkeep", n_partitions=1)
    sch = T2.StructType(
        [T2.StructField("a", T2.LongType()), T2.StructField("b", T2.StringType())]
    )
    SR.register_schema(tp, sch, schema_type="PROTOBUF")
    src = spark.createDataFrame([(1, "x"), (2, "y")], sch)
    env = proto_encode(src, sch, out_col="value")
    decoded = SR.decode_value(env, tp)
    assert "value" in decoded.columns and "data" in decoded.columns
    # the retained binary still decodes: select envelope cols after decode
    got = decoded.select("value", "data.a", "data.b").collect()
    assert sorted((r["a"], r["b"]) for r in got) == [(1, "x"), (2, "y")]
    assert all(r["value"] is not None for r in got)


def _env_rows(spark, payloads, seq_start=0):
    from pyspark.sql import Row

    rows = [
        Row(
            key=str(i),
            value=p.encode() if p is not None else None,
            properties={},
            event_time=None,
            publish_time=None,
            producer_name="producer-0",
            sequence_id=seq_start + i,
            deliver_at=None,
            marker_type=None,
            replicated_from=None,
        )
        for i, p in enumerate(payloads)
    ]
    from pulsar_3_2_codedump_spark.envelope import ENVELOPE_SCHEMA
    from pyspark.sql import types as T

    # rows carry only the 10 producer-visible fields; conform_envelope adds
    # the remaining nullable envelope columns (crypto fields) at append
    names = {
        "key", "value", "properties", "event_time", "publish_time",
        "producer_name", "sequence_id", "deliver_at", "marker_type",
        "replicated_from",
    }
    schema = T.StructType([f for f in ENVELOPE_SCHEMA.fields if f.name in names])
    return spark.createDataFrame(rows, schema)


def test_auto_produce_validation_rejects_undecodable_payloads(spark, tmp_root):
    # AutoProduceBytesSchema.java: raw-bytes producers are validated against
    # the topic's registered schema at publish time
    tp = TP.create_topic(tmp_root, "t", 1)
    strict = T.StructType(
        [T.StructField("a", T.LongType(), False), T.StructField("b", T.StringType(), True)]
    )
    SR.register_schema(tp, strict)

    good = _env_rows(spark, ['{"a": 1, "b": "x"}', '{"a": 2}'])
    TP.append(spark, good, tp, validate_schema=True)  # decodes -> accepted
    assert sum(TP.end_offsets(TP.read_manifest(tp)).values()) == 2

    # malformed JSON -> rejected, nothing lands
    with pytest.raises(SR.SchemaIncompatibleError):
        TP.append(spark, _env_rows(spark, ['not-json at all']), tp, validate_schema=True)
    # missing the non-nullable field 'a' -> rejected
    with pytest.raises(SR.SchemaIncompatibleError):
        TP.append(spark, _env_rows(spark, ['{"b": "no-a"}']), tp, validate_schema=True)
    assert sum(TP.end_offsets(TP.read_manifest(tp)).values()) == 2

    # same bad payload without validation appends fine (plain BYTES producer)
    TP.append(
        spark, _env_rows(spark, ['{"b": "no-a"}'], seq_start=10), tp, validate_schema=False
    )
    assert sum(TP.end_offsets(TP.read_manifest(tp)).values()) == 3

    # null_value messages are never validated (no payload to decode)
    TP.append(spark, _env_rows(spark, [None], seq_start=20), tp, validate_schema=True)
    assert sum(TP.end_offsets(TP.read_manifest(tp)).values()) == 4


def test_auto_produce_requires_registered_schema(spark, tmp_root):
    tp = TP.create_topic(tmp_root, "t", 1)
    with pytest.raises(LookupError):
        TP.append(spark, _env_rows(spark, ['{"a": 1}']), tp, validate_schema=True)
