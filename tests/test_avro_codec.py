"""AVRO spec codec + KEY_VALUE encodings + per-format compat (§1.3, §2.C2).

Reference semantics: SchemaType.java:61 (AVRO), :120 (KEY_VALUE);
KeyValueEncodingType.java:33 (INLINE), :38 (SEPARATED);
AvroSchemaCompatibilityCheck.java / KeyValueSchemaCompatibilityCheck.java.
"""

import pytest

from pyspark.sql import Row, functions as F, types as T

from pulsar_3_2_codedump_spark import schema_registry as SR
from pulsar_3_2_codedump_spark import topic as TP
from pulsar_3_2_codedump_spark.functions import avro_codec as AV

FULL = T.StructType(
    [
        T.StructField("b", T.BooleanType(), False),
        T.StructField("i", T.IntegerType(), False),
        T.StructField("l", T.LongType(), False),
        T.StructField("f", T.FloatType(), False),
        T.StructField("d", T.DoubleType(), False),
        T.StructField("s", T.StringType(), False),
        T.StructField("y", T.BinaryType(), False),
        T.StructField("nl", T.LongType(), True),
        T.StructField("ns", T.StringType(), True),
        T.StructField("arr", T.ArrayType(T.LongType(), False), False),
        T.StructField(
            "rec",
            T.StructType([T.StructField("x", T.LongType(), False)]),
            True,
        ),
    ]
)

SAMPLE = {
    "b": True,
    "i": -123456,
    "l": -(2**62) - 7,
    "f": 1.5,
    "d": 3.141592653589793,
    "s": "héllo avro",
    "y": b"\x00\xff\x10",
    "nl": None,
    "ns": "present",
    "arr": [0, -1, 1, 2**40],
    "rec": {"x": 42},
}


def test_record_roundtrip_all_types():
    out = AV.decode_record(AV.encode_record(SAMPLE, FULL), FULL)
    assert out == SAMPLE


@pytest.mark.parametrize("v", [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**63), 2**63 - 1])
def test_zigzag_long_edges(v):
    sch = T.StructType([T.StructField("l", T.LongType(), False)])
    assert AV.decode_record(AV.encode_record({"l": v}, sch), sch) == {"l": v}


def test_known_bytes_zigzag():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04
    sch = T.StructType([T.StructField("l", T.LongType(), False)])
    for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04")]:
        assert AV.encode_record({"l": v}, sch) == b


def test_avro_schema_mapping():
    js = AV.avro_schema_of(FULL, name="rec_top")
    by_name = {f["name"]: f["type"] for f in js["fields"]}
    assert by_name["l"] == "long" and by_name["nl"] == ["null", "long"]
    assert by_name["arr"] == {"type": "array", "items": "long"}
    with pytest.raises(TypeError):
        AV.avro_schema_of(T.MapType(T.LongType(), T.LongType()))


def test_dataframe_encode_decode(spark):
    rows = [
        Row(id=1, name="alpha", score=1.25, tag=None),
        Row(id=2, name="βeta", score=-0.5, tag="t"),
    ]
    sch = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("score", T.DoubleType(), False),
            T.StructField("tag", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(rows, sch)
    enc = AV.avro_encode(df, sch)
    assert enc.columns == ["value"]
    dec = AV.avro_decode(enc, sch).select("data.*").orderBy("id")
    got = [r.asDict() for r in dec.collect()]
    assert got == [r.asDict() for r in rows]


def test_registry_avro_dispatch(spark, tmp_root):
    """register_schema(type=AVRO) → decode_value routes through the codec."""
    tp = TP.create_topic(tmp_root, "t", 1)
    sch = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("tag", T.StringType(), True)]
    )
    df = spark.createDataFrame([Row(k=7, tag="x"), Row(k=9, tag=None)], sch)
    env = AV.avro_encode(df, sch)  # just the binary value column
    SR.register_schema(tp, sch, schema_type="AVRO")
    decoded = SR.decode_value(env, tp)
    assert sorted((r["data"]["k"], r["data"]["tag"]) for r in decoded.collect()) == [
        (7, "x"),
        (9, None),
    ]


def test_kv_inline_framing_bytes(spark):
    """Byte-exact INLINE layout: len-BE|key|len-BE|value, -1 for null key."""
    df = spark.range(1).select(
        AV.kv_encode_inline(
            F.to_binary(F.lit("ab"), F.lit("utf-8")), F.to_binary(F.lit("xyz"), F.lit("utf-8"))
        ).alias("p"),
        AV.kv_encode_inline(
            F.lit(None).cast("binary"), F.to_binary(F.lit("v"), F.lit("utf-8"))
        ).alias("pnull"),
    )
    row = df.first()
    assert bytes(row["p"]) == b"\x00\x00\x00\x02ab\x00\x00\x00\x03xyz"
    assert bytes(row["pnull"]) == b"\xff\xff\xff\xff\x00\x00\x00\x01v"


def test_kv_inline_roundtrip(spark):
    cases = [("k1", "hello"), (None, "only-value"), ("key-long" * 10, "")]
    df = spark.createDataFrame(cases, "k string, v string")
    enc = df.select(
        "k",
        "v",
        AV.kv_encode_inline(
            F.to_binary(F.col("k"), F.lit("utf-8")), F.to_binary(F.col("v"), F.lit("utf-8"))
        ).alias("p"),
    )
    dec = enc.select("k", "v", AV.kv_decode_inline(F.col("p")).alias("kv"))
    bad = dec.filter(
        ~(
            F.coalesce(F.col("kv.key").cast("string"), F.lit("∅"))
            .eqNullSafe(F.coalesce(F.col("k"), F.lit("∅")))
            & F.col("kv.value").cast("string").eqNullSafe(F.col("v"))
        )
    )
    assert bad.count() == 0


def test_kv_separated_roundtrip(spark):
    df = spark.createDataFrame([("k1", b"payload")], "k string, v binary")
    key_col, val_col = AV.kv_encode_separated(
        F.to_binary(F.col("k"), F.lit("utf-8")), F.col("v")
    )
    enc = df.select(key_col.alias("key"), val_col.alias("value"))
    dec = enc.select(AV.kv_decode_separated(F.col("key"), F.col("value")).alias("kv"))
    row = dec.first()
    assert bytes(row["kv"]["key"]) == b"k1" and bytes(row["kv"]["value"]) == b"payload"


KEY_V1 = T.StructType([T.StructField("id", T.LongType(), False)])
VAL_V1 = T.StructType([T.StructField("a", T.LongType(), False)])
VAL_V2_OK = T.StructType(
    [T.StructField("a", T.LongType(), False), T.StructField("b", T.StringType(), True)]
)
VAL_V2_BAD = T.StructType([T.StructField("a", T.StringType(), False)])


def test_kv_compat_matrix():
    existing = [(KEY_V1, VAL_V1)]
    # adding a nullable value field is BACKWARD-compatible
    AV.check_key_value_compatibility(KEY_V1, VAL_V2_OK, existing, "BACKWARD")
    # value type change rejected
    with pytest.raises(SR.SchemaIncompatibleError):
        AV.check_key_value_compatibility(KEY_V1, VAL_V2_BAD, existing, "BACKWARD")
    # key type change rejected even when value is fine
    with pytest.raises(SR.SchemaIncompatibleError):
        AV.check_key_value_compatibility(T.StringType(), VAL_V1, [(T.LongType(), VAL_V1)], "FULL")
    # NONE admits anything
    AV.check_key_value_compatibility(T.StringType(), VAL_V2_BAD, existing, "NONE")
