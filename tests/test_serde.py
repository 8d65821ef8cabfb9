"""Serde/converter pipeline: JSON envelope, plain JSON, CSV, primitives,
Kafka wire decode with bad-data skip (§1.5, FIXTURES.md §6)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from kafka_connect_streams_spark.sources.kafka import (decode_records,
                                                       encode_records)
from kafka_connect_streams_spark.sources.serde import (connect_schema_to_spark,
                                                       decode_json_envelope,
                                                       decode_primitive)

ORDER_SCHEMA = StructType([
    StructField("ordertime", LongType()),
    StructField("orderid", StringType()),
    StructField("itemid", StringType()),
    StructField("orderunits", DoubleType()),
])


class TestConnectEnvelope:
    CONNECT_SCHEMA = {
        "type": "struct",
        "fields": [
            {"field": "id", "type": "int64"},
            {"field": "lines", "type": "string"},
        ],
    }

    def test_schema_translation(self):
        t = connect_schema_to_spark(self.CONNECT_SCHEMA)
        assert [f.name for f in t.fields] == ["id", "lines"]

    def test_envelope_decode(self, spark):
        env = json.dumps({
            "schema": {"type": "struct", "fields": [
                {"field": "id", "type": "int64"},
                {"field": "lines", "type": "string"}]},
            "payload": {"id": 7, "lines": "to be or not"},
        })
        df = spark.createDataFrame([(env,)], "value string")
        out = df.select(decode_json_envelope(
            F.col("value"), self.CONNECT_SCHEMA).alias("p")).select("p.*")
        row = out.collect()[0]
        assert (row.id, row.lines) == (7, "to be or not")


class TestKafkaWire:
    def _wire(self, spark, payloads):
        rows = [(None, p.encode() if isinstance(p, str) else p,
                 "orders", 0, i, 1_700_000_000_000 + i)
                for i, p in enumerate(payloads)]
        return spark.createDataFrame(
            rows, "key binary, value binary, topic string, partition int, "
                  "offset long, timestamp long") \
            .withColumn("timestamp", F.expr("timestamp_micros(timestamp*1000)"))

    def test_decode_with_rowtime_and_baddata_skip(self, spark):
        good = json.dumps({"ordertime": 1, "orderid": "ORDER_1",
                           "itemid": "ITEM_1", "orderunits": 10.0})
        bad = "something that is not json"  # StreamsSelectAndProjectIntTest.java:151-166
        out = decode_records(self._wire(spark, [good, bad]), ORDER_SCHEMA)
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0].orderid == "ORDER_1"
        assert rows[0].rowtime == 1_700_000_000_000

    def test_ntz_rowtime_is_session_zone_independent(self, spark):
        """The filebroker stand-in delivers TIMESTAMP_NTZ whose wall time IS
        the UTC instant. decode_records must recover the exact epoch even in
        a non-UTC session — a plain cast to TIMESTAMP re-interprets the wall
        time in the session zone and shifts rowtime by the zone offset."""
        good = json.dumps({"ordertime": 1, "orderid": "ORDER_1",
                           "itemid": "ITEM_1", "orderunits": 10.0})
        # zone-independent literal: 1_700_000_000_000 ms == 2023-11-14
        # 22:13:20 UTC, stored as the NTZ wall time per the wire contract
        ntz = self._wire(spark, [good]).withColumn(
            "timestamp", F.expr("TIMESTAMP_NTZ '2023-11-14 22:13:20'"))
        assert dict(ntz.dtypes)["timestamp"] == "timestamp_ntz"
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            rows = decode_records(ntz, ORDER_SCHEMA).collect()
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        assert rows[0].rowtime == 1_700_000_000_000

    def test_encode_roundtrip(self, spark):
        df = spark.createDataFrame(
            [("8", "ORDER_8", 80.0)], "rowkey string, orderid string, orderunits double")
        wire = encode_records(df, key_col="rowkey")
        row = wire.collect()[0]
        assert row.key == "8"
        assert json.loads(row.value) == {"orderid": "ORDER_8", "orderunits": 80.0}


class TestPrimitives:
    def test_string_long(self, spark):
        df = spark.createDataFrame([("42",)], "value string")
        assert df.select(decode_primitive(F.col("value"), "long").alias("v")) \
                 .collect()[0].v == 42
