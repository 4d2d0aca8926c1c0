"""AVRO + KEY_VALUE typed schema decode (SURVEY §1.3, §2.C2).

The reference registry admits AVRO / KEY_VALUE schemas with per-format compat
checks (pulsar-broker/.../service/schema/AvroSchemaCompatibilityCheck.java,
KeyValueSchemaCompatibilityCheck.java; types
pulsar-client-api/.../common/schema/SchemaType.java:61,120; encodings
pulsar-client-api/.../common/schema/KeyValueEncodingType.java:33,38).

Spark re-expression:

* **AVRO binary** — the container ships no ``spark-avro`` module and no Python
  avro package, so the Avro *binary encoding* (public spec:
  https://avro.apache.org/docs/1.11.1/specification/ — zigzag-varint ints,
  little-endian IEEE floats, length-prefixed strings/bytes, branch-indexed
  unions, block-encoded arrays) is implemented here directly and run as
  Arrow-batched pandas UDFs (``avro_encode`` / ``avro_decode``).  This is the
  documented slow path — a cluster with spark-avro on the classpath swaps in
  ``from_avro``/``to_avro`` behind the same (column, StructType) signature and
  the whole stage returns to JVM codegen.
* **KEY_VALUE** — both encodings are pure JVM column expressions (codegen,
  scan-speed at 100 TB):
  - INLINE  (KeyValueEncodingType.java:33): payload = ``int32-BE key length
    (-1 = null) | key bytes | int32-BE value length | value bytes`` — the
    framing of the reference's ``KeyValue.encode``
    (pulsar-common/.../schema/KeyValue.java).
  - SEPARATED (KeyValueEncodingType.java:38): key bytes ride the envelope
    ``key`` field (base64, since the envelope key is STRING), value bytes stay
    in ``value``.

Compatibility: AVRO record resolution reduces to the reader/writer field rule
already implemented in ``schema_registry._can_read``; KEY_VALUE checks key and
value schemas independently (KeyValueSchemaCompatibilityCheck.java — a KV
schema is compatible iff both parts are).
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query

# ---------------------------------------------------------------------------
# Avro schema mapping: Spark StructType <-> Avro record schema (json dict)
# ---------------------------------------------------------------------------

_PRIMITIVE = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}


def avro_schema_of(dt: T.DataType, nullable: bool = False, name: str = "record"):
    """Spark type -> Avro schema (SchemaType.java:61 AVRO; the same mapping
    SURVEY §1.3 tabulates). Nullable fields become ``["null", T]`` unions."""
    if isinstance(dt, T.StructType):
        base = {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f.name, "type": avro_schema_of(f.dataType, f.nullable, f.name + "_r")}
                for f in dt.fields
            ],
        }
    elif isinstance(dt, T.ArrayType):
        base = {"type": "array", "items": avro_schema_of(dt.elementType, dt.containsNull, name)}
    elif isinstance(dt, T.TimestampType):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    else:
        base = _PRIMITIVE.get(dt)
        if base is None:
            raise TypeError(f"unsupported Avro mapping for {dt}")
    return ["null", base] if nullable else base


# ---------------------------------------------------------------------------
# Avro binary codec (public spec). Compiled to per-type closures once per
# schema, then applied row-wise inside Arrow batches.
# ---------------------------------------------------------------------------


def _write_uvarint(buf: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _write_zigzag(buf: bytearray, v: int) -> None:
    # 64-bit zigzag; Python ints are unbounded so mask after the transform
    _write_uvarint(buf, ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF)


def _read_zigzag(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _encoder(dt: T.DataType, nullable: bool):
    if isinstance(dt, T.StructType):
        fields = [(f.name, _encoder(f.dataType, f.nullable)) for f in dt.fields]

        def enc_rec(buf, v):
            for name, fe in fields:
                fe(buf, v.get(name) if isinstance(v, dict) else getattr(v, name))

        base = enc_rec
    elif isinstance(dt, T.ArrayType):
        item = _encoder(dt.elementType, dt.containsNull)

        def enc_arr(buf, v):
            items = list(v)
            if items:
                _write_zigzag(buf, len(items))
                for it in items:
                    item(buf, it)
            _write_zigzag(buf, 0)

        base = enc_arr
    elif isinstance(dt, (T.LongType, T.IntegerType)):
        base = lambda buf, v: _write_zigzag(buf, int(v))  # noqa: E731
    elif isinstance(dt, T.TimestampType):
        base = lambda buf, v: _write_zigzag(buf, int(pd.Timestamp(v).value // 1000))  # noqa: E731
    elif isinstance(dt, T.BooleanType):
        base = lambda buf, v: buf.append(1 if v else 0)  # noqa: E731
    elif isinstance(dt, T.FloatType):
        base = lambda buf, v: buf.extend(_struct.pack("<f", float(v)))  # noqa: E731
    elif isinstance(dt, T.DoubleType):
        base = lambda buf, v: buf.extend(_struct.pack("<d", float(v)))  # noqa: E731
    elif isinstance(dt, T.StringType):

        def enc_str(buf, v):
            b = str(v).encode("utf-8")
            _write_zigzag(buf, len(b))
            buf.extend(b)

        base = enc_str
    elif isinstance(dt, T.BinaryType):

        def enc_bin(buf, v):
            b = bytes(v)
            _write_zigzag(buf, len(b))
            buf.extend(b)

        base = enc_bin
    else:
        raise TypeError(f"unsupported Avro encode for {dt}")

    if not nullable:
        return base

    def enc_union(buf, v):
        # union ["null", T]: branch index then value
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            _write_zigzag(buf, 0)
        else:
            _write_zigzag(buf, 1)
            base(buf, v)

    return enc_union


def _decoder(dt: T.DataType, nullable: bool):
    if isinstance(dt, T.StructType):
        fields = [(f.name, _decoder(f.dataType, f.nullable)) for f in dt.fields]

        def dec_rec(data, pos):
            out = {}
            for name, fd in fields:
                out[name], pos = fd(data, pos)
            return out, pos

        base = dec_rec
    elif isinstance(dt, T.ArrayType):
        item = _decoder(dt.elementType, dt.containsNull)

        def dec_arr(data, pos):
            out = []
            while True:
                n, pos = _read_zigzag(data, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix (spec-allowed)
                    n = -n
                    _, pos = _read_zigzag(data, pos)
                for _ in range(n):
                    v, pos = item(data, pos)
                    out.append(v)

        base = dec_arr
    elif isinstance(dt, (T.LongType, T.IntegerType)):
        base = _read_zigzag
    elif isinstance(dt, T.TimestampType):

        def dec_ts(data, pos):
            v, pos = _read_zigzag(data, pos)
            return pd.Timestamp(v * 1000), pos

        base = dec_ts
    elif isinstance(dt, T.BooleanType):
        base = lambda data, pos: (data[pos] == 1, pos + 1)  # noqa: E731
    elif isinstance(dt, T.FloatType):
        base = lambda data, pos: (_struct.unpack_from("<f", data, pos)[0], pos + 4)  # noqa: E731
    elif isinstance(dt, T.DoubleType):
        base = lambda data, pos: (_struct.unpack_from("<d", data, pos)[0], pos + 8)  # noqa: E731
    elif isinstance(dt, T.StringType):

        def dec_str(data, pos):
            n, pos = _read_zigzag(data, pos)
            return data[pos : pos + n].decode("utf-8"), pos + n

        base = dec_str
    elif isinstance(dt, T.BinaryType):

        def dec_bin(data, pos):
            n, pos = _read_zigzag(data, pos)
            return bytes(data[pos : pos + n]), pos + n

        base = dec_bin
    else:
        raise TypeError(f"unsupported Avro decode for {dt}")

    if not nullable:
        return base

    def dec_union(data, pos):
        branch, pos = _read_zigzag(data, pos)
        if branch == 0:
            return None, pos
        return base(data, pos)

    return dec_union


def encode_record(row: dict, schema: T.StructType) -> bytes:
    """Encode one record dict -> Avro binary (single-record, no container)."""
    buf = bytearray()
    _encoder(schema, False)(buf, row)
    return bytes(buf)


def decode_record(data: bytes, schema: T.StructType) -> dict:
    out, _ = _decoder(schema, False)(data, 0)
    return out


# ---------------------------------------------------------------------------
# DataFrame surface: Arrow-batched encode/decode stages
# ---------------------------------------------------------------------------


def avro_encode(df: DataFrame, schema: T.StructType, out_col: str = "value") -> DataFrame:
    """Encode ``schema``'s columns of ``df`` into one Avro-binary column,
    keeping all other columns (the producer-side schema-encode step,
    ProducerImpl.serializeAndSendMessage). Arrow-batched mapInPandas."""
    enc = _encoder(schema, False)
    names = [f.name for f in schema.fields]
    passthrough = [c for c in df.columns if c not in names]
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + [T.StructField(out_col, T.BinaryType(), False)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = pdf[names].to_dict("records")
            payloads = []
            for r in recs:
                buf = bytearray()
                enc(buf, r)
                payloads.append(bytes(buf))
            out = pdf[passthrough].copy()
            out[out_col] = payloads
            yield out

    return df.mapInPandas(kernel, out_schema)


def avro_decode(
    df: DataFrame, schema: T.StructType, value_col: str = "value", out_col: str = "data"
) -> DataFrame:
    """Decode an Avro-binary column to a typed struct column (consumer-side
    AUTO_CONSUME decode, AutoConsumeSchema.java:123). Arrow-batched."""
    dec = _decoder(schema, False)
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, schema, True)])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [dec(bytes(b), 0)[0] if b is not None else None for b in pdf[value_col]]
            out = pdf.copy()
            out[out_col] = decoded
            yield out

    return df.mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# KEY_VALUE encodings — pure JVM column expressions
# ---------------------------------------------------------------------------


def _int32_be(n: Column) -> Column:
    # 4-byte big-endian length; hex(-1) = 16 F's, lpad-8 keeps the low word
    return F.unhex(F.substring(F.lpad(F.hex(n.cast("long")), 8, "0"), -8, 8))


def kv_encode_inline(key_bin: Column, value_bin: Column) -> Column:
    """KeyValueEncodingType.INLINE framing (KeyValue.java encode):
    int32-BE key length (-1 null) | key | int32-BE value length (-1 null) | value."""
    klen = F.when(key_bin.isNull(), F.lit(-1)).otherwise(F.octet_length(key_bin))
    vlen = F.when(value_bin.isNull(), F.lit(-1)).otherwise(F.octet_length(value_bin))
    empty = F.to_binary(F.lit(""), F.lit("utf-8"))
    return F.concat(
        _int32_be(klen),
        F.coalesce(key_bin, empty),
        _int32_be(vlen),
        F.coalesce(value_bin, empty),
    )


def kv_decode_inline(payload: Column) -> Column:
    """Inverse of :func:`kv_encode_inline` -> struct<key binary, value binary>."""
    klen_u = F.conv(F.hex(F.substring(payload, 1, 4)), 16, 10).cast("long")
    klen = F.when(klen_u == 0xFFFFFFFF, F.lit(-1)).otherwise(klen_u)
    key = F.when(klen >= 0, payload.substr(F.lit(5), klen.cast("int")))
    vpos = (F.lit(5) + F.greatest(klen, F.lit(0)) + F.lit(4)).cast("int")
    vlen_u = F.conv(
        F.hex(payload.substr((F.lit(5) + F.greatest(klen, F.lit(0))).cast("int"), F.lit(4))),
        16,
        10,
    ).cast("long")
    value = F.when(vlen_u != 0xFFFFFFFF, payload.substr(vpos, vlen_u.cast("int")))
    return F.struct(key.alias("key"), value.alias("value"))


def kv_encode_separated(key_bin: Column, value_bin: Column) -> tuple[Column, Column]:
    """KeyValueEncodingType.SEPARATED: key bytes ride the envelope key field
    (base64 — envelope key is STRING), value bytes stay the payload."""
    return F.base64(key_bin), value_bin


def kv_decode_separated(key_str: Column, value_bin: Column) -> Column:
    return F.struct(F.unbase64(key_str).alias("key"), value_bin.alias("value"))


# ---------------------------------------------------------------------------
# Registry glue: per-format compatibility (KeyValueSchemaCompatibilityCheck)
# ---------------------------------------------------------------------------


def check_key_value_compatibility(
    new_key: T.StructType | T.DataType,
    new_value: T.StructType,
    existing: list[tuple[T.DataType, T.StructType]],
    strategy: str,
) -> None:
    """KEY_VALUE compat = key compat AND value compat, each under the same
    strategy (KeyValueSchemaCompatibilityCheck.java)."""
    from pulsar_3_2_codedump_spark.schema_registry import check_compatibility

    def as_struct(dt):
        return dt if isinstance(dt, T.StructType) else T.StructType([T.StructField("k", dt, False)])

    check_compatibility(as_struct(new_key), [as_struct(k) for k, _ in existing], strategy)
    check_compatibility(new_value, [v for _, v in existing], strategy)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

_ORDERS_AVRO = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)


@query(
    "avro_decode_value",
    section="1.3-schema",
    doc="AVRO round-trip: encode 4 orders columns to Avro binary (zigzag/varint "
    "spec codec, Arrow-batched), decode back to a typed struct, aggregate on the "
    "decoded fields. Proves byte-level codec correctness: any drift in "
    "varint/union/IEEE encoding breaks the aggregate against the relational oracle.",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
               MAX(o_totalprice) AS max_price,
               MIN(o_orderpriority) AS min_priority
        FROM orders GROUP BY o_orderstatus
    """,
)
def avro_decode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    encoded = avro_encode(orders, _ORDERS_AVRO)  # -> single binary `value` column
    decoded = avro_decode(encoded, _ORDERS_AVRO)
    return decoded.groupBy(F.col("data.o_orderstatus").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("data.o_orderkey").alias("sum_orderkey"),
        F.max("data.o_totalprice").alias("max_price"),
        F.min("data.o_orderpriority").alias("min_priority"),
    )


@query(
    "keyvalue_decode",
    section="1.3-schema",
    doc="KEY_VALUE INLINE round-trip, pure JVM codegen: frame customer key/value "
    "bytes with the reference's int32-BE length prefixes (KeyValue.java), decode, "
    "parse, aggregate per market segment.",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
               MAX(c_acctbal) AS max_acctbal
        FROM customer GROUP BY c_mktsegment
    """,
)
def keyvalue_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    key_bin = F.to_binary(F.col("c_custkey").cast("string"), F.lit("utf-8"))
    val_bin = F.to_binary(
        F.to_json(F.struct("c_mktsegment", "c_acctbal")), F.lit("utf-8")
    )
    framed = cust.select(kv_encode_inline(key_bin, val_bin).alias("payload"))
    kv = framed.select(kv_decode_inline(F.col("payload")).alias("kv"))
    parsed = kv.select(
        F.col("kv.key").cast("string").cast("long").alias("custkey"),
        F.from_json(
            F.col("kv.value").cast("string"), "c_mktsegment STRING, c_acctbal DOUBLE"
        ).alias("v"),
    )
    return parsed.groupBy(F.col("v.c_mktsegment").alias("c_mktsegment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("custkey").alias("sum_custkey"),
        F.max("v.c_acctbal").alias("max_acctbal"),
    )
