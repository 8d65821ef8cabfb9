"""Avro binary leg, executed for real (F11 — VERDICT r1 item 3).

The reference's Avro path selects Confluent serdes per-test
(IntegrationTestHarness.java:335-349) bridged by a mock registry converter
(MockAvroConverter.java:24-39). spark-avro's jar is not in this sandbox, so
the leg runs on the pure-Python codec (sources/avro_codec.py) implementing
the published Avro 1.x binary spec + Confluent wire framing. Golden byte
vectors below are hand-derived FROM THE SPEC (zigzag/varint examples in
https://avro.apache.org/docs/1.11.1/specification/#binary-encoding), so the
tests pin spec conformance, not just self-consistency.
"""

from __future__ import annotations

import io
import json

import pytest

from kafka_connect_streams_spark.sources.avro_codec import (
    avro_to_spark_type, confluent_frame, confluent_unframe, decode_avro_py,
    decode_datum, encode_avro_py, encode_datum, zigzag_decode, zigzag_encode)

# OrderDataProvider.java:38-43 — the schema the reference's Avro tests move.
ORDER_AVRO = {
    "type": "record", "name": "Order", "fields": [
        {"name": "ordertime", "type": "long"},
        {"name": "orderid", "type": "string"},
        {"name": "itemid", "type": "string"},
        {"name": "orderunits", "type": "double"},
        {"name": "prices", "type": {"type": "map", "values": "double"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "note", "type": ["null", "string"]},
    ],
}


class TestSpecGoldenBytes:
    """Byte-exact vectors from the Avro spec's own examples."""

    @pytest.mark.parametrize("n,expected", [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
    ])
    def test_zigzag_spec_table(self, n, expected):
        assert zigzag_encode(n) == expected
        assert zigzag_decode(io.BytesIO(expected)) == n

    def test_string_foo(self):
        # spec: "foo" -> 06 66 6f 6f
        assert encode_datum("string", "foo") == b"\x06foo"

    def test_array_of_longs(self):
        # spec example: [3, 27] -> 04 06 36 00
        assert encode_datum({"type": "array", "items": "long"},
                            [3, 27]) == b"\x04\x06\x36\x00"

    def test_nullable_union_branch_indexes(self):
        sch = ["null", "string"]
        assert encode_datum(sch, None) == b"\x00"
        assert encode_datum(sch, "a") == b"\x02\x02a"
        assert decode_datum(sch, io.BytesIO(b"\x02\x02a")) == "a"
        assert decode_datum(sch, io.BytesIO(b"\x00")) is None

    def test_negative_block_count_with_size(self):
        # writers may emit a negative count followed by a byte size
        body = b"\x03\x02\x06\x36\x00"  # -2 items, size 2, [3, 27], end
        assert decode_datum({"type": "array", "items": "long"},
                            io.BytesIO(body)) == [3, 27]


class TestRecordRoundTrip:
    ORDER = {"ordertime": 1_700_000_000_000, "orderid": "ORDER_1",
             "itemid": "ITEM_1", "orderunits": 10.5,
             "prices": {"a": 1.25, "b": -2.5}, "tags": ["x", "y"],
             "note": None}

    def test_roundtrip(self):
        enc = encode_datum(ORDER_AVRO, self.ORDER)
        assert decode_datum(ORDER_AVRO, io.BytesIO(enc)) == self.ORDER

    def test_confluent_framing(self):
        body = encode_datum(ORDER_AVRO, self.ORDER)
        framed = confluent_frame(7, body)
        assert framed[:1] == b"\x00" and len(framed) == len(body) + 5
        sid, out = confluent_unframe(framed)
        assert sid == 7 and out == body
        with pytest.raises(ValueError):
            confluent_unframe(b"\x01junk")

    def test_spark_type_mapping(self):
        t = avro_to_spark_type(ORDER_AVRO)
        assert [f.name for f in t.fields] == [
            "ordertime", "orderid", "itemid", "orderunits", "prices",
            "tags", "note"]
        assert t["note"].dataType.typeName() == "string"


class TestSparkAvroLeg:
    """decode_avro_py / encode_avro_py over real DataFrames (mapInPandas)."""

    def _orders(self, n):
        return [{"ordertime": 1_700_000_000_000 + i,
                 "orderid": f"ORDER_{i}", "itemid": f"ITEM_{i % 3}",
                 "orderunits": float(i) + 0.25,
                 "prices": {"p": float(i)}, "tags": [f"t{i}"],
                 "note": None if i % 2 else f"n{i}"} for i in range(n)]

    def test_decode_then_query(self, spark):
        rows = [(i, confluent_frame(1, encode_datum(ORDER_AVRO, o)))
                for i, o in enumerate(self._orders(20))]
        wire = spark.createDataFrame(rows, "offset long, value binary")
        typed = decode_avro_py(wire, "value", ORDER_AVRO).select(
            "offset", "value.*")
        got = {r.orderid: r for r in typed.collect()}
        assert len(got) == 20
        assert got["ORDER_3"].orderunits == 3.25
        assert got["ORDER_3"].note is None
        assert got["ORDER_2"].note == "n2"
        assert got["ORDER_4"].prices == {"p": 4.0}

    def test_encode_decode_spark_roundtrip(self, spark):
        import pyspark.sql.functions as F
        src = spark.createDataFrame(
            [(o["ordertime"], o["orderid"], o["itemid"], o["orderunits"])
             for o in self._orders(10)],
            "ordertime long, orderid string, itemid string, orderunits double")
        flat_schema = {"type": "record", "name": "O", "fields": [
            {"name": "ordertime", "type": "long"},
            {"name": "orderid", "type": "string"},
            {"name": "itemid", "type": "string"},
            {"name": "orderunits", "type": "double"}]}
        packed = src.select(F.struct(*src.columns).alias("v"))
        wire = encode_avro_py(packed, "v", flat_schema, schema_id=3)
        back = decode_avro_py(wire, "value", flat_schema).select("value.*")
        assert sorted((r.orderid, r.orderunits) for r in back.collect()) == \
            sorted((o["orderid"], o["orderunits"]) for o in self._orders(10))

    def test_encode_decode_bytes_field_roundtrip(self, spark):
        """BinaryType fields survive the encode path: the to_json bridge
        base64-encodes them, and _enc_bytes must decode that back to raw
        bytes (previously crashed with ``bytes(str)`` TypeError)."""
        import pyspark.sql.functions as F
        payloads = [bytes([i, 255 - i, 0x00, 0x7f]) for i in range(6)]
        src = spark.createDataFrame(
            [(f"k{i}", p) for i, p in enumerate(payloads)],
            "rid string, blob binary")
        schema = {"type": "record", "name": "B", "fields": [
            {"name": "rid", "type": "string"},
            {"name": "blob", "type": "bytes"}]}
        packed = src.select(F.struct("rid", "blob").alias("v"))
        wire = encode_avro_py(packed, "v", schema, schema_id=7)
        back = decode_avro_py(wire, "value", schema).select("value.*")
        got = {r.rid: bytes(r.blob) for r in back.collect()}
        assert got == {f"k{i}": p for i, p in enumerate(payloads)}

    def test_matches_jvm_avro_decoder(self, spark):
        """Cross-engine check: the JVM's own avro-1.x jar (shipped with
        Spark) decodes what this codec encodes — true spec conformance,
        not self-consistency. Uses py4j to reach org.apache.avro classes."""
        jvm = spark._jvm
        sch_json = json.dumps(ORDER_AVRO)
        parser = jvm.org.apache.avro.Schema.Parser()
        schema = parser.parse(sch_json)
        order = self._orders(1)[0]
        body = encode_datum(ORDER_AVRO, order)
        reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
        decoder = jvm.org.apache.avro.io.DecoderFactory.get() \
            .binaryDecoder(body, None)
        rec = reader.read(None, decoder)
        assert rec.get("ordertime") == order["ordertime"]
        assert str(rec.get("orderid")) == order["orderid"]
        assert rec.get("orderunits") == order["orderunits"]
        assert str(rec.get("tags").get(0)) == "t0"


#: exact coordinate for this build: Spark 4.1.2 is published for Scala 2.13.
SPARK_AVRO_COORD = "org.apache.spark:spark-avro_2.13:4.1.2"


def _spark_avro_jar_present() -> bool:
    # pyspark.sql.avro.functions always imports — only the JVM-side
    # spark-avro jar is missing, so probe the classpath directories
    import glob
    import os
    import pyspark
    jar_dirs = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.path.expanduser("~/.ivy2/jars"),
        os.path.expanduser(
            "~/.m2/repository/org/apache/spark/spark-avro_2.13"),
    ]
    return any(glob.glob(os.path.join(d, "**", "spark-avro*.jar"),
                         recursive=True) for d in jar_dirs
               if os.path.isdir(d))


@pytest.mark.skipif(
    not _spark_avro_jar_present(),
    reason=f"needs {SPARK_AVRO_COORD} on the classpath (absent from this "
           "sandbox); the pure-Python codec covers the semantics meanwhile")
def test_jvm_from_avro_matches_python_codec(spark):
    """F11 JVM fast path: sources.serde.decode_avro must decode the exact
    bodies the pure-Python codec frames — runs the day the jar appears."""
    import pyspark.sql.functions as F
    from kafka_connect_streams_spark.sources.serde import decode_avro

    flat = {"type": "record", "name": "O", "fields": [
        {"name": "ordertime", "type": "long"},
        {"name": "orderid", "type": "string"}]}
    rows = [(i, encode_datum(flat, {"ordertime": 1000 + i,
                                    "orderid": f"ORDER_{i}"}))
            for i in range(10)]
    wire = spark.createDataFrame(rows, "offset long, value binary")
    typed = wire.select(
        decode_avro(F.col("value"), json.dumps(flat)).alias("v")).select("v.*")
    got = sorted((r.ordertime, r.orderid) for r in typed.collect())
    assert got == [(1000 + i, f"ORDER_{i}") for i in range(10)]
