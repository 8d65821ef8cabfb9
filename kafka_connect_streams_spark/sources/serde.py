"""Serde layer: the Connect converter pipeline as column expressions (§1.5).

Reference converters:
- JSON with embedded schema envelope ``{"schema": ..., "payload": ...}``
  (JsonSerializer.java:28-51, JsonDeserializer.java:28-51; enabled by
  ``schemas.enable=true``, examples/DatabaseWordCount.java:83-84)
- schema-less KSQL JSON (KsqlJsonConverter.java:44-63)
- Avro via schema registry (MockAvroConverter.java:24-39) — needs the
  spark-avro package; gated.
- delimited/CSV (IntegrationTestHarness.java:344-345)
- primitive string/long serdes (KafkaWordCountTest.java:68-73)

All of these are *expressions*, so they run inside codegen at scan speed —
the reference pays a per-record virtual-dispatch converter chain.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DataType, DoubleType, LongType,
                               MapType, StringType, StructField, StructType)

# -- Connect JSON schema envelope ------------------------------------------

_CONNECT_TYPES: dict[str, DataType] = {
    "int8": LongType(), "int16": LongType(), "int32": LongType(),
    "int64": LongType(), "float32": DoubleType(), "float64": DoubleType(),
    "string": StringType(),
}


def connect_schema_to_spark(schema: dict) -> DataType:
    """Translate a Connect JSON schema (the envelope's "schema" member) to a
    Spark type. Covers the types the reference exercises (§1.3)."""
    t = schema["type"]
    if t in _CONNECT_TYPES:
        return _CONNECT_TYPES[t]
    if t == "array":
        return ArrayType(connect_schema_to_spark(schema["items"]))
    if t == "map":
        return MapType(connect_schema_to_spark(schema["keys"]),
                       connect_schema_to_spark(schema["values"]))
    if t == "struct":
        return StructType([
            StructField(f["field"], connect_schema_to_spark(f), True)
            for f in schema["fields"]])
    raise ValueError(f"unsupported connect type: {t}")


def decode_json_envelope(col: Column, connect_schema: dict) -> Column:
    """Decode ``{"schema":..., "payload":...}`` → typed payload struct.

    The schema member is resolved at stream-definition time (SURVEY.md §1.4:
    one schema per topic per run — per-record drift is out of scope exactly
    as in practice in the reference), so the hot path is a single from_json.
    """
    payload_type = connect_schema_to_spark(connect_schema)
    envelope = StructType([StructField("payload", payload_type, True)])
    return F.from_json(col.cast("string"), envelope)["payload"]


def encode_json_envelope(payload: Column, connect_schema: dict) -> Column:
    """Encode a payload struct into the schema-embedded envelope."""
    return F.to_json(F.struct(
        F.lit(json.dumps(connect_schema)).alias("schema_json"),
        payload.alias("payload")))


# -- plain serdes -----------------------------------------------------------

def decode_json(col: Column, schema: StructType) -> Column:
    """Schema-less KSQL JSON → struct (malformed input → null → filter)."""
    return F.from_json(col.cast("string"), schema)


def decode_csv(col: Column, schema: StructType) -> Column:
    return F.from_csv(col.cast("string"), F.lit(schema.simpleString()))


def decode_primitive(col: Column, kind: str) -> Column:
    """String/Long primitive serdes (KafkaWordCountTest.java:68-73)."""
    return col.cast({"string": "string", "long": "bigint"}[kind])


def decode_avro(col: Column, avro_schema: str) -> Column:
    """Avro decode via the JVM fast path — requires the spark-avro package
    (`org.apache.spark:spark-avro_2.13`), import-gated. When the jar is
    absent use `sources.avro_codec.decode_avro_py` (pure-Python, Arrow-
    batched, spec-conformance-tested against the shipped avro-1.x jar)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro package not on the classpath in this environment") from e
    return from_avro(col, avro_schema)
