"""PROTOBUF / PROTOBUF_NATIVE typed schema decode (SURVEY §1.3, §2.C2).

Reference: SchemaType.java:56 (PROTOBUF), :145 (PROTOBUF_NATIVE);
ProtobufNativeSchemaCompatibilityCheck.java (descriptor-based compat);
structs pulsar-client/.../schema/ProtobufNativeSchema.java. The container
ships no ``protobuf`` python package and no spark-protobuf module, so —
exactly like the avro codec (avro_codec.py) — the protobuf *wire format*
(public spec: https://protobuf.dev/programming-guides/encoding/ — varint
tags ``(field_number << 3) | wire_type``, two's-complement int64 varints,
little-endian IEEE doubles/floats, length-delimited strings/bytes/messages)
is implemented directly and run as Arrow-batched pandas UDFs.

Schema mapping is positional: Spark StructType field i ↔ protobuf field
number i+1 (the generated-message convention for a flat record). Unknown
field numbers are skipped per spec — a reader with an older schema ignores
new fields, which is what makes protobuf schema evolution
backward-compatible (the property ProtobufNativeSchemaCompatibilityCheck
verifies on the descriptor level: same field numbers, compatible types).

Slow-path note (same posture as avro_codec): on a cluster with
spark-protobuf on the classpath, ``from_protobuf``/``to_protobuf`` replace
these two UDFs behind the same (column, StructType) signature and the stage
returns to JVM codegen. The Spark-side plumbing — envelope BINARY column in,
typed struct out — is identical either way.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query

# wire types (protobuf encoding spec)
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

_MASK64 = (1 << 64) - 1


def _wire_type_of(dt: T.DataType) -> int:
    # TimestampType rides as int64 epoch-micros (the generated-code idiom for
    # a flat message; PROTOBUF_NATIVE's Timestamp well-known-type would be a
    # nested LEN message — the positional mapping here keeps flat rows flat)
    if isinstance(dt, (T.BooleanType, T.IntegerType, T.LongType, T.TimestampType)):
        return _VARINT
    if isinstance(dt, T.DoubleType):
        return _I64
    if isinstance(dt, T.FloatType):
        return _I32
    if isinstance(dt, (T.StringType, T.BinaryType, T.StructType)):
        return _LEN
    raise TypeError(f"unsupported protobuf field type: {dt}")


def _write_uvarint(buf: bytearray, n: int) -> None:
    n &= _MASK64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _field_encoder(dt: T.DataType):
    """Value encoder for one field (tag written by the caller)."""
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return lambda buf, v: _write_uvarint(buf, int(v))
    if isinstance(dt, T.BooleanType):
        return lambda buf, v: _write_uvarint(buf, 1 if v else 0)
    if isinstance(dt, T.TimestampType):
        return lambda buf, v: _write_uvarint(buf, int(pd.Timestamp(v).value // 1000))
    if isinstance(dt, T.DoubleType):
        return lambda buf, v: buf.extend(_struct.pack("<d", float(v)))
    if isinstance(dt, T.FloatType):
        return lambda buf, v: buf.extend(_struct.pack("<f", float(v)))
    if isinstance(dt, T.StringType):

        def enc_str(buf, v):
            raw = str(v).encode("utf-8")
            _write_uvarint(buf, len(raw))
            buf.extend(raw)

        return enc_str
    if isinstance(dt, T.BinaryType):

        def enc_bin(buf, v):
            raw = bytes(v)
            _write_uvarint(buf, len(raw))
            buf.extend(raw)

        return enc_bin
    if isinstance(dt, T.StructType):
        sub = [( _field_encoder(f.dataType), _wire_type_of(f.dataType)) for f in dt.fields]

        def enc_msg(buf, v):
            inner = bytearray()
            _encode_fields(inner, v, dt, sub)
            _write_uvarint(buf, len(inner))
            buf.extend(inner)

        return enc_msg
    raise TypeError(f"unsupported protobuf field type: {dt}")


def _encode_fields(buf: bytearray, row: dict, schema: T.StructType, encs) -> None:
    for i, f in enumerate(schema.fields):
        v = row.get(f.name) if isinstance(row, dict) else row[i]
        if v is None or (not isinstance(v, (bytes, str, dict)) and pd.isna(v)):
            continue  # proto3: absent field == default/null (None/NaN/NaT)
        enc, wt = encs[i]
        _write_uvarint(buf, ((i + 1) << 3) | wt)
        enc(buf, v)


def encode_message(row: dict, schema: T.StructType) -> bytes:
    encs = [(_field_encoder(f.dataType), _wire_type_of(f.dataType)) for f in schema.fields]
    buf = bytearray()
    _encode_fields(buf, row, schema, encs)
    return bytes(buf)


def _field_decoder(dt: T.DataType):
    """(data, pos) -> (value, new_pos) for one LEN/I64/I32/VARINT payload."""
    if isinstance(dt, (T.IntegerType, T.LongType)):

        def dec_int(data, pos):
            u, pos = _read_uvarint(data, pos)
            return _to_signed64(u), pos

        return dec_int
    if isinstance(dt, T.BooleanType):

        def dec_bool(data, pos):
            u, pos = _read_uvarint(data, pos)
            return bool(u), pos

        return dec_bool
    if isinstance(dt, T.TimestampType):

        def dec_ts(data, pos):
            u, pos = _read_uvarint(data, pos)
            return pd.Timestamp(_to_signed64(u) * 1000), pos

        return dec_ts
    if isinstance(dt, T.DoubleType):
        return lambda data, pos: (_struct.unpack_from("<d", data, pos)[0], pos + 8)
    if isinstance(dt, T.FloatType):
        return lambda data, pos: (_struct.unpack_from("<f", data, pos)[0], pos + 4)
    if isinstance(dt, T.StringType):

        def dec_str(data, pos):
            n, pos = _read_uvarint(data, pos)
            return data[pos : pos + n].decode("utf-8"), pos + n

        return dec_str
    if isinstance(dt, T.BinaryType):

        def dec_bin(data, pos):
            n, pos = _read_uvarint(data, pos)
            return bytes(data[pos : pos + n]), pos + n

        return dec_bin
    if isinstance(dt, T.StructType):

        def dec_msg(data, pos):
            n, pos = _read_uvarint(data, pos)
            return decode_message(data[pos : pos + n], dt), pos + n

        return dec_msg
    raise TypeError(f"unsupported protobuf field type: {dt}")


def _skip(data: bytes, pos: int, wire_type: int) -> int:
    """Skip an unknown field per spec (forward compatibility)."""
    if wire_type == _VARINT:
        _, pos = _read_uvarint(data, pos)
        return pos
    if wire_type == _I64:
        return pos + 8
    if wire_type == _I32:
        return pos + 4
    if wire_type == _LEN:
        n, pos = _read_uvarint(data, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wire_type}")


def decode_message(data: bytes, schema: T.StructType) -> dict:
    decs = {i + 1: (_field_decoder(f.dataType), f.name) for i, f in enumerate(schema.fields)}
    out = {f.name: None for f in schema.fields}
    pos, n = 0, len(data)
    while pos < n:
        tag, pos = _read_uvarint(data, pos)
        field_num, wire_type = tag >> 3, tag & 0x7
        hit = decs.get(field_num)
        if hit is None:
            pos = _skip(data, pos, wire_type)  # unknown field → skip
            continue
        dec, name = hit
        out[name], pos = dec(data, pos)
    return out


# ---------------------------------------------------------------------------
# Arrow-batched column codecs (the §2.C2 decode surface)
# ---------------------------------------------------------------------------


def proto_encode(df: DataFrame, schema: T.StructType, out_col: str = "value") -> DataFrame:
    """Encode ``schema``'s columns of ``df`` into one protobuf BINARY column.
    Arrow-batched (mapInPandas) — the documented Python slow path; swaps for
    ``to_protobuf`` on clusters with spark-protobuf."""
    names = [f.name for f in schema.fields]
    passthrough = [c for c in df.columns if c not in names]
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + [T.StructField(out_col, T.BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [
                encode_message({n: row[n] for n in names}, schema)
                for row in pdf[names].to_dict("records")
            ]
            out = pdf[passthrough].copy()
            out[out_col] = payload
            yield out

    return df.mapInPandas(kernel, out_schema)


def proto_decode(
    df: DataFrame,
    schema: T.StructType,
    in_col: str = "value",
    prefix: str = "",
    keep_in_col: bool = False,
) -> DataFrame:
    """Decode a protobuf BINARY column into typed columns (§2.C2).

    ``keep_in_col=True`` keeps the raw binary column in the output alongside
    the decoded fields (the envelope-preserving posture schema_registry
    .decode_value needs so all formats return the same shape)."""
    passthrough = [c for c in df.columns if keep_in_col or c != in_col]
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [T.StructField(prefix + f.name, f.dataType) for f in schema.fields]
    )

    nulls = {f.name: None for f in schema.fields}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payloads (compaction tombstones, marker rows) decode to
            # all-null fields, same as avro_decode's guard
            decoded = [
                decode_message(b, schema) if b is not None else dict(nulls)
                for b in pdf[in_col]
            ]
            out = pdf[passthrough].copy()
            # explicit columns: a zero-row batch yields an empty 'decoded'
            # list, and pd.DataFrame([]) would have no columns at all
            dec_df = pd.DataFrame(
                decoded, index=pdf.index, columns=[f.name for f in schema.fields]
            )
            for f in schema.fields:
                out[prefix + f.name] = dec_df[f.name]
            yield out

    return df.mapInPandas(kernel, out_schema)


_EVENT_PROTO_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@query(
    "protobuf_decode_value",
    section="2.C2",
    doc="PROTOBUF schema decode (SchemaType.java:56,145; wire format per the "
    "public encoding spec): events rows are encoded to protobuf payloads and "
    "decoded back through the Arrow-batched codec; any varint/zigzag/endian "
    "defect breaks the value hash against the oracle reading the raw table. "
    "Aggregated per event_type so the check spans every row.",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(event_id) AS BIGINT) AS sum_id,
               ROUND(SUM(value), 3) AS sum_value,
               MAX(ts) AS max_ts
        FROM events
        GROUP BY event_type
    """,
)
def protobuf_decode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value", "ts")
    encoded = proto_encode(ev, _EVENT_PROTO_SCHEMA, out_col="payload")
    decoded = proto_decode(encoded, _EVENT_PROTO_SCHEMA, in_col="payload")
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_id"),
        F.round(F.sum("value"), 3).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


def check_protobuf_compatibility(reader: T.StructType, writer: T.StructType) -> None:
    """Descriptor-level compat check
    (ProtobufNativeSchemaCompatibilityCheck.java: a new PROTOBUF_NATIVE
    schema is admitted iff every field NUMBER shared with the old schema
    keeps a wire-compatible type; added fields are skipped by old readers,
    removed fields decode as null for new readers).

    Positional mapping (field i ↔ number i+1) makes this a pairwise walk.
    Raises ``schema_registry.SchemaIncompatibleError`` on the first
    violation; composes with ``schema_registry.check_compatibility``'s
    strategy surface via the ``protobuf_strategy`` wrapper semantics: the
    shared-field-number rule is symmetric, so one check covers BACKWARD,
    FORWARD and FULL."""
    from pulsar_3_2_codedump_spark.schema_registry import SchemaIncompatibleError

    for i, (rf, wf) in enumerate(zip(reader.fields, writer.fields)):
        num = i + 1
        if rf.name != wf.name:
            # positional mapping means a shared position IS a shared field
            # number; a name change there is a remove-and-shift (or rename),
            # which would silently decode the OLD field's bytes into the NEW
            # field — reject rather than remap values
            # (ProtobufNativeSchemaCompatibilityCheck keeps numbers stable;
            # our positional registry must therefore keep names stable too)
            raise SchemaIncompatibleError(
                f"field {num}: name changed {wf.name!r} -> {rf.name!r} — "
                "removing or renaming a middle field shifts later field "
                "numbers and remaps old payload values"
            )
        r_wt, w_wt = _wire_type_of(rf.dataType), _wire_type_of(wf.dataType)
        if r_wt != w_wt:
            raise SchemaIncompatibleError(
                f"field {num} ({rf.name}): wire type changed "
                f"{w_wt} -> {r_wt} — old payloads undecodable"
            )
        r_struct = isinstance(rf.dataType, T.StructType)
        w_struct = isinstance(wf.dataType, T.StructType)
        if r_struct != w_struct:
            raise SchemaIncompatibleError(
                f"field {num} ({rf.name}): message <-> scalar change is not "
                "wire-compatible"
            )
        if r_struct:
            check_protobuf_compatibility(rf.dataType, wf.dataType)
    # fields beyond the shared prefix: added (skipped by old readers) or
    # removed (null for new readers) — both compatible per spec
