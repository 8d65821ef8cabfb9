"""Avro binary serde, executed for real (F11 — the Avro leg).

The reference's Avro path is Confluent's ``AvroConverter`` wired through a
mock schema registry (MockAvroConverter.java:24-39) and selected per-test by
the harness (IntegrationTestHarness.java:335-349). Its wire format is:

    0x00 (magic) | 4-byte big-endian schema id | Avro binary body

This module implements that format from the published Avro 1.x binary spec
(https://avro.apache.org/docs/1.11.1/specification/#binary-encoding) in pure
Python, so the Avro leg **executes** in this sandbox — no spark-avro jar
required. The JVM `from_avro`/`to_avro` fast path (serde.decode_avro) stays
preferred when `org.apache.spark:spark-avro_2.13:<spark-version>` is on the
classpath; this codec is the jar-free executable reference and the
correctness oracle for it.

Supported schema subset = everything the reference's data providers emit
(OrderDataProvider.java:38-43): null, boolean, int, long, float, double,
string, bytes, record, array, map, and unions (nullable fields). Enum/fixed
are out of the reference's exercised surface.

Spark integration is Arrow-batched ``mapInPandas`` — Avro is inherently a
row-oriented byte format, so a per-record Python decode is unavoidable
without the jar, but batching keeps transfer columnar and amortized exactly
like the multimodal decode path (operators/multimodal.py).
"""

from __future__ import annotations

import base64
import io
import json
import struct
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, DataType,
                               DoubleType, FloatType, IntegerType, LongType,
                               MapType, StringType, StructField, StructType)

# ---------------------------------------------------------------------------
# primitive binary encoding (Avro spec §binary-encoding)
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return zigzag_encode(len(raw)) + raw


def _dec_string(buf: io.BytesIO) -> str:
    n = zigzag_decode(buf)
    return buf.read(n).decode("utf-8")


def _enc_bytes(b: bytes | str) -> bytes:
    if isinstance(b, str):
        # the to_json bridge in encode_avro_py base64-encodes BinaryType
        # fields; decode back to the raw bytes before framing
        b = base64.b64decode(b)
    b = bytes(b)
    return zigzag_encode(len(b)) + b


def _dec_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(zigzag_decode(buf))


# ---------------------------------------------------------------------------
# schema-driven encoder / decoder
# ---------------------------------------------------------------------------

_PRIMITIVE_ENC: dict[str, Callable[[Any], bytes]] = {
    "null": lambda v: b"",
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "int": zigzag_encode,
    "long": zigzag_encode,
    "float": lambda v: struct.pack("<f", v),
    "double": lambda v: struct.pack("<d", v),
    "string": _enc_string,
    "bytes": _enc_bytes,
}

_PRIMITIVE_DEC: dict[str, Callable[[io.BytesIO], Any]] = {
    "null": lambda buf: None,
    "boolean": lambda buf: buf.read(1) == b"\x01",
    "int": zigzag_decode,
    "long": zigzag_decode,
    "float": lambda buf: struct.unpack("<f", buf.read(4))[0],
    "double": lambda buf: struct.unpack("<d", buf.read(8))[0],
    "string": _dec_string,
    "bytes": _dec_bytes,
}


def _schema_type(schema: Any) -> Any:
    """Normalize {"type": "long"} shorthand nesting to its type member."""
    while isinstance(schema, dict) and isinstance(schema.get("type"), dict):
        schema = schema["type"]
    return schema


def encode_datum(schema: Any, value: Any) -> bytes:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema not in _PRIMITIVE_ENC:
            raise ValueError(f"unsupported avro type: {schema}")
        return _PRIMITIVE_ENC[schema](value)
    if isinstance(schema, list):  # union: long branch index, then value
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                return zigzag_encode(i) + encode_datum(branch, value)
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    t = schema["type"]
    if t == "record":
        return b"".join(encode_datum(f["type"], value.get(f["name"]))
                        for f in schema["fields"])
    if t == "array":  # one block: count, items, terminator 0
        if not value:
            return zigzag_encode(0)
        body = b"".join(encode_datum(schema["items"], v) for v in value)
        return zigzag_encode(len(value)) + body + zigzag_encode(0)
    if t == "map":
        if not value:
            return zigzag_encode(0)
        body = b"".join(_enc_string(k) + encode_datum(schema["values"], v)
                        for k, v in sorted(value.items()))
        return zigzag_encode(len(value)) + body + zigzag_encode(0)
    if t in _PRIMITIVE_ENC:  # {"type": "long", ...} long-form primitive
        return _PRIMITIVE_ENC[t](value)
    raise ValueError(f"unsupported avro type: {t}")


def _matches(branch: Any, value: Any) -> bool:
    branch = _schema_type(branch)
    name = branch if isinstance(branch, str) else branch.get("type")
    if name == "null":
        return value is None
    return value is not None


def decode_datum(schema: Any, buf: io.BytesIO) -> Any:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema not in _PRIMITIVE_DEC:
            raise ValueError(f"unsupported avro type: {schema}")
        return _PRIMITIVE_DEC[schema](buf)
    if isinstance(schema, list):
        return decode_datum(schema[zigzag_decode(buf)], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_datum(f["type"], buf)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-legal writer form)
                zigzag_decode(buf)
                n = -n
            out.extend(decode_datum(schema["items"], buf) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                zigzag_decode(buf)
                n = -n
            for _ in range(n):
                # key must be read before the value (RHS evaluates first in
                # `d[k] = v`, which would consume bytes out of order)
                k = _dec_string(buf)
                out[k] = decode_datum(schema["values"], buf)
    if t in _PRIMITIVE_DEC:
        return _PRIMITIVE_DEC[t](buf)
    raise ValueError(f"unsupported avro type: {t}")


# ---------------------------------------------------------------------------
# Confluent wire framing (magic 0 + schema id), as AvroConverter emits
# ---------------------------------------------------------------------------

MAGIC = b"\x00"


def confluent_frame(schema_id: int, body: bytes) -> bytes:
    return MAGIC + struct.pack(">I", schema_id) + body


def confluent_unframe(msg: bytes) -> tuple[int, bytes]:
    if not msg or msg[0:1] != MAGIC:
        raise ValueError("not Confluent-Avro framed (bad magic byte)")
    return struct.unpack(">I", msg[1:5])[0], msg[5:]


# ---------------------------------------------------------------------------
# avro schema → Spark type
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK: dict[str, DataType] = {
    "boolean": BooleanType(), "int": IntegerType(), "long": LongType(),
    "float": FloatType(), "double": DoubleType(), "string": StringType(),
    "bytes": BinaryType(),
}


def avro_to_spark_type(schema: Any) -> DataType:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        return _AVRO_TO_SPARK[schema]
    if isinstance(schema, list):  # nullable union → the non-null branch
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"only nullable unions supported: {schema}")
        return avro_to_spark_type(branches[0])
    t = schema["type"]
    if t == "record":
        return StructType([
            StructField(f["name"], avro_to_spark_type(f["type"]), True)
            for f in schema["fields"]])
    if t == "array":
        return ArrayType(avro_to_spark_type(schema["items"]), True)
    if t == "map":
        return MapType(StringType(), avro_to_spark_type(schema["values"]), True)
    if t in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[t]
    raise ValueError(f"unsupported avro type: {t}")


# ---------------------------------------------------------------------------
# Spark integration: Arrow-batched encode / decode over a binary column
# ---------------------------------------------------------------------------


def decode_avro_py(df: DataFrame, value_col: str, avro_schema: str | dict,
                   *, framed: bool = True, out_col: str = "value") -> DataFrame:
    """Binary Avro column → typed struct column, via mapInPandas.

    ``framed=True`` expects Confluent wire framing (what AvroConverter
    produces); ``framed=False`` takes a bare Avro body. All non-value
    columns pass through untouched.
    """
    schema = (json.loads(avro_schema) if isinstance(avro_schema, str)
              else avro_schema)
    spark_t = avro_to_spark_type(schema)
    passthrough = [f for f in df.schema.fields if f.name != value_col]
    out_schema = StructType(passthrough + [StructField(out_col, spark_t, True)])
    names = [f.name for f in passthrough]

    def decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded = []
            for raw in pdf[value_col]:
                body = confluent_unframe(bytes(raw))[1] if framed else bytes(raw)
                decoded.append(decode_datum(schema, io.BytesIO(body)))
            out = pdf[names].copy()
            out[out_col] = decoded
            yield out

    return df.mapInPandas(decode, out_schema)


def encode_avro_py(df: DataFrame, struct_col: str, avro_schema: str | dict,
                   *, schema_id: int = 1, framed: bool = True,
                   out_col: str = "value") -> DataFrame:
    """Typed struct column → binary Avro column (Confluent-framed)."""
    schema = (json.loads(avro_schema) if isinstance(avro_schema, str)
              else avro_schema)
    passthrough = [f for f in df.schema.fields if f.name != struct_col]
    out_schema = StructType(passthrough +
                            [StructField(out_col, BinaryType(), True)])
    names = [f.name for f in passthrough]
    src = df.withColumn(struct_col, F.to_json(F.col(struct_col)))

    def encode(batches: Iterator) -> Iterator:
        for pdf in batches:
            bodies = []
            for j in pdf[struct_col]:
                body = encode_datum(schema, json.loads(j))
                bodies.append(confluent_frame(schema_id, body)
                              if framed else body)
            out = pdf[names].copy()
            out[out_col] = bodies
            yield out

    return src.mapInPandas(encode, out_schema)


__all__ = [
    "zigzag_encode", "zigzag_decode", "encode_datum", "decode_datum",
    "confluent_frame", "confluent_unframe", "avro_to_spark_type",
    "decode_avro_py", "encode_avro_py",
]
