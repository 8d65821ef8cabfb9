"""Kafka topic source/sink builders (S1/S5) and header handling (S12).

The reference's real-topic path: ``builder.stream(inputTopic)`` in,
``.to(outputTopic)`` out (examples/KafkaWordCount.java:58, 66-67). The Spark
equivalents are option bundles on ``readStream``/``writeStream`` with
``format("kafka")``.

The spark-sql-kafka connector jar is not shipped in this environment, so the
builders are pure option/plan constructors: ``kafka_source`` returns a
configured reader, callable anywhere the package exists; ``decode_records``
and ``encode_records`` (the parts that carry real logic — serde + envelope)
work on ANY DataFrame with the Kafka wire schema and are unit-tested against
batch frames of that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the Kafka source wire schema (what format("kafka") emits)
KAFKA_WIRE_COLUMNS = ("key", "value", "topic", "partition", "offset",
                      "timestamp", "timestampType", "headers")


def kafka_source(spark: SparkSession, *, brokers: str, subscribe: str,
                 starting_offsets: str = "earliest",
                 include_headers: bool = True,
                 max_offsets_per_trigger: int | None = None):
    """Configured Kafka reader (unstarted). ``maxOffsetsPerTrigger`` is the
    backpressure bound replacing the reference's 5000-record queue semaphore
    (ConnectSourceConsumer.java:169)."""
    r = (spark.readStream.format("kafka")
         .option("kafka.bootstrap.servers", brokers)
         .option("subscribe", subscribe)
         .option("startingOffsets", starting_offsets)
         .option("includeHeaders", str(include_headers).lower()))
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return r


def decode_records(raw: DataFrame, value_schema: StructType,
                   value_format: str = "json",
                   keep_headers: bool = False) -> DataFrame:
    """Kafka wire bytes → typed columns + rowkey/rowtime pseudo-columns.

    Mirrors the converter chain (JsonDeserializer.java:28-51 /
    KsqlJsonConverter.java:44-63) plus KSQL's implicit ROWKEY/ROWTIME
    (DatabaseSelectAndProjectIntTest.java:216-218). Malformed records yield a
    null struct and are dropped — the bad-data skip behavior
    (StreamsSelectAndProjectIntTest.java:151-166).
    """
    key = F.col("key").cast("string").alias("rowkey")
    # The wire timestamp is a UTC instant. format("kafka") delivers it as
    # TIMESTAMP → unix_micros reads the instant directly. The filebroker
    # stand-in delivers TIMESTAMP_NTZ whose wall time IS the UTC instant; a
    # cast to TIMESTAMP would re-interpret that wall time in the session
    # zone and shift rowtime in any non-UTC session, so compute the epoch
    # with NTZ-to-NTZ arithmetic, which never consults the zone.
    if dict(raw.dtypes).get("timestamp") == "timestamp_ntz":
        rowtime = F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', timestamp) div 1000"
        ).alias("rowtime")
    else:
        rowtime = F.expr(
            "unix_micros(cast(timestamp as timestamp)) div 1000"
        ).alias("rowtime")
    if value_format == "json":
        parsed = F.from_json(F.col("value").cast("string"), value_schema)
    elif value_format == "csv":
        parsed = F.from_csv(F.col("value").cast("string"),
                            F.lit(value_schema.simpleString()))
    else:
        raise ValueError(f"unsupported value_format: {value_format}")
    cols = [key, rowtime, parsed.alias("v")]
    if keep_headers:
        # S12: headers ride along as array<struct<key:string,value:binary>>
        # (convertHeaderFor, ConnectSourceConsumer.java:300-312)
        cols.append(F.col("headers"))
    out = raw.select(*cols)
    # PERMISSIVE from_json maps malformed input to an all-null struct — drop
    # rows where every declared field is null (the bad-data skip contract)
    any_field = None
    for f in value_schema.fields:
        c = F.col(f"v.{f.name}").isNotNull()
        any_field = c if any_field is None else (any_field | c)
    tail = ["headers"] if keep_headers else []
    return out.filter(any_field).select("rowkey", "rowtime", "v.*", *tail)


def encode_records(df: DataFrame, *, key_col: str,
                   value_format: str = "json") -> DataFrame:
    """Typed columns → Kafka wire (key, value) for writeStream.format("kafka").

    The CSAS ``WITH (value_format=...)`` conversion surface (F11).
    """
    payload = [c for c in df.columns if c != key_col]
    if value_format == "json":
        value = F.to_json(F.struct(*[F.col(c) for c in payload]))
    elif value_format == "csv":
        value = F.concat_ws(",", *[F.col(c).cast("string") for c in payload])
    else:
        raise ValueError(f"unsupported value_format: {value_format}")
    return df.select(F.col(key_col).cast("string").alias("key"),
                     value.alias("value"))


def kafka_sink(df: DataFrame, *, brokers: str, topic: str, checkpoint: str):
    """Configured Kafka writer (unstarted) for an encoded (key, value) frame."""
    return (df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint))
