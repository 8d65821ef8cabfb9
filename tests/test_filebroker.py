"""Live broker-shaped round-trip (VERDICT r1 item 2).

The reference's flagship path is produce → KafkaWordCount → consume against
an embedded single-node cluster (examples/KafkaWordCount.java:56-67,
EmbeddedSingleNodeKafkaCluster.java; harness produce/consume at
IntegrationTestHarness.java). No broker binaries ship in this sandbox, so
these tests run the SAME pipeline against the file-backed broker stand-in
(sources/filebroker.py — append-only offset-addressed partitioned log with
the Kafka wire schema): produce to an input topic, consume via a real
Structured Streaming source, wordcount in update mode, produce the changelog
to an output topic, then read the output topic back and assert golden
counts. Offsets, partitions, headers, and incremental (two-wave) consumption
are all exercised for real.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.aggregations import word_count
from kafka_connect_streams_spark.sources import filebroker as fb
from kafka_connect_streams_spark.sources.kafka import decode_records

# the reference's canonical input lines (KafkaWordCountTest fixture shape)
LINES_WAVE1 = ["all streams lead to kafka", "hello kafka streams"]
LINES_WAVE2 = ["join kafka summit"]

# golden counts after wave1 / after both waves (lower + \W+ split)
GOLDEN_W1 = {"all": 1, "streams": 2, "lead": 1, "to": 1, "kafka": 2,
             "hello": 1}
GOLDEN_ALL = {**GOLDEN_W1, "kafka": 3, "join": 1, "summit": 1}


@pytest.fixture()
def broker(tmp_path):
    b = fb.FileBroker(str(tmp_path / "broker"))
    b.create_topic("lines", partitions=2)
    b.create_topic("counts", partitions=1)
    return b


def _produce(broker, lines, ts0=1_700_000_000_000):
    p = broker.producer()
    for i, line in enumerate(lines):
        p.send("lines", line, timestamp_ms=ts0 + i,
               headers=[("source", b"test")])
    return p.flush()


class TestBrokerLog:
    def test_offsets_dense_and_monotonic(self, broker):
        _produce(broker, LINES_WAVE1)
        ends1 = broker.end_offsets("lines")
        assert sum(ends1.values()) == len(LINES_WAVE1)
        _produce(broker, LINES_WAVE2)
        ends2 = broker.end_offsets("lines")
        assert sum(ends2.values()) == len(LINES_WAVE1) + len(LINES_WAVE2)
        assert all(ends2[p] >= ends1[p] for p in ends1)

    def test_keyed_sends_are_sticky(self, broker):
        p = broker.producer()
        for _ in range(5):
            p.send("lines", "x", key="fixed-key")
        placed = p.flush()
        assert len(placed) == 1  # same key → same partition, like Kafka

    def test_batch_read_wire_schema(self, spark, broker):
        _produce(broker, LINES_WAVE1)
        fb.register(spark)
        df = (spark.read.format("filebroker")
              .option("path", broker.root).option("subscribe", "lines").load())
        assert df.columns == ["key", "value", "topic", "partition", "offset",
                              "timestamp", "timestampType", "headers"]
        rows = df.orderBy("partition", "offset").collect()
        assert len(rows) == 2
        assert {bytes(r.value).decode() for r in rows} == set(LINES_WAVE1)
        assert all(r.topic == "lines" for r in rows)
        # headers survive the wire (S12)
        assert rows[0].headers[0].key == "source"
        assert bytes(rows[0].headers[0].value) == b"test"


class TestKafkaWordCountRoundTrip:
    """examples/KafkaWordCount.java:56-67 end to end over the stand-in."""

    def _start(self, spark, broker, tmp_path):
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root).option("subscribe", "lines")
               .load())
        lines = raw.select(F.col("value").cast("string").alias("line"))
        counts = word_count(lines, "line")
        encoded = counts.select(
            F.col("word").cast("string").alias("key"),
            F.to_json(F.struct("word", "cnt")).alias("value"))
        writer = fb.filebroker_writer(broker.root, "counts")
        return (encoded.writeStream.outputMode("update")
                .foreachBatch(writer)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start())

    def _latest_counts(self, spark, broker):
        """Consume the output topic; latest record per key wins (KTable)."""
        out = (spark.read.format("filebroker")
               .option("path", broker.root).option("subscribe", "counts")
               .load())
        rows = out.orderBy("partition", "offset").collect()
        latest = {}
        for r in rows:
            rec = json.loads(bytes(r.value).decode())
            latest[rec["word"]] = rec["cnt"]
        return latest

    def test_produce_count_consume_two_waves(self, spark, broker, tmp_path):
        _produce(broker, LINES_WAVE1)
        q = self._start(spark, broker, tmp_path)
        try:
            q.processAllAvailable()
            assert self._latest_counts(spark, broker) == GOLDEN_W1
            # wave 2: incremental consumption from the committed offsets —
            # only changed words are re-emitted (update mode, A2/A3)
            before = spark.read.format("filebroker") \
                .option("path", broker.root).option("subscribe", "counts") \
                .load().count()
            _produce(broker, LINES_WAVE2)
            q.processAllAvailable()
            after_rows = spark.read.format("filebroker") \
                .option("path", broker.root).option("subscribe", "counts") \
                .load().count()
            assert after_rows - before == len(set("join kafka summit".split()))
            assert self._latest_counts(spark, broker) == GOLDEN_ALL
        finally:
            q.stop()

    def test_flatmap_round_trip(self, spark, broker, tmp_path):
        """examples/KafkaFlatMap.java:56-63 end to end: lines in, one record
        PER WORD out (append mode, no aggregation) — the 1→N expansion hits
        the output topic with multiplicity preserved."""
        broker.create_topic("words", partitions=1)
        _produce(broker, LINES_WAVE1)
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root).option("subscribe", "lines")
               .load())
        words = (raw.select(F.col("value").cast("string").alias("line"))
                 .select(F.explode(F.split(F.lower("line"), r"\W+"))
                         .alias("word"))
                 .filter(F.length("word") > 0)
                 .select(F.col("word").alias("key"),
                         F.col("word").alias("value")))
        writer = fb.filebroker_writer(broker.root, "words")
        q = (words.writeStream.outputMode("append")
             .foreachBatch(writer)
             .option("checkpointLocation", str(tmp_path / "ckpt_fm"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (spark.read.format("filebroker")
               .option("path", broker.root).option("subscribe", "words")
               .load())
        got = sorted(bytes(r.value).decode() for r in out.collect())
        expected = sorted(
            w for line in LINES_WAVE1 for w in line.lower().split())
        assert got == expected  # multiset equality, repetition preserved

    def test_windowed_join_over_broker(self, spark, broker, tmp_path):
        """Stream-stream windowed join with BOTH legs consumed from broker
        topics and the result produced back — the stand-in twin of
        StreamStreamJoinIntegrationTest's cluster run. Uses the A/a B/b
        matched subset of the golden trace; inner join within ±10 s."""
        broker.create_topic("left", partitions=1)
        broker.create_topic("right", partitions=1)
        broker.create_topic("joined", partitions=1)
        base = 1_700_000_000_000
        p = broker.producer()
        for v, off in (("A", 2), ("B", 4)):
            p.send("left", v, key="0", timestamp_ms=base + off)
        for v, off in (("a", 3), ("b", 5)):
            p.send("right", v, key="0", timestamp_ms=base + off)
        p.flush()
        fb.register(spark)
        from kafka_connect_streams_spark.streaming.joins import windowed_join

        def leg(topic):
            raw = (spark.readStream.format("filebroker")
                   .option("path", broker.root).option("subscribe", topic)
                   .load())
            return raw.select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
                F.col("timestamp").cast("timestamp").alias("ts"))

        joined = windowed_join(leg("left"), leg("right"),
                               window_ms=10_000, watermark="1 second",
                               how="inner")
        out = joined.select(F.col("key"),
                            F.col("joined_value").alias("value"))
        writer = fb.filebroker_writer(broker.root, "joined")
        q = (out.writeStream.outputMode("append").foreachBatch(writer)
             .option("checkpointLocation", str(tmp_path / "ckpt_j")).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = (spark.read.format("filebroker")
               .option("path", broker.root).option("subscribe", "joined")
               .load())
        got = sorted(bytes(r.value).decode() for r in res.collect())
        assert got == ["A-a", "A-b", "B-a", "B-b"]

    def test_avro_values_over_broker(self, spark, broker, tmp_path):
        """Avro end to end over the wire: Confluent-framed Avro bodies
        produced to a topic, consumed by a live stream, decoded with the
        pure-Python codec, queried typed — the stand-in twin of the
        reference's Avro serde selection (IntegrationTestHarness.java:335-349
        via MockAvroConverter.java:24-39)."""
        from kafka_connect_streams_spark.sources.avro_codec import (
            confluent_frame, decode_avro_py, encode_datum)
        schema = {"type": "record", "name": "Order", "fields": [
            {"name": "orderid", "type": "string"},
            {"name": "units", "type": "double"}]}
        broker.create_topic("avro_orders", partitions=1)
        p = broker.producer()
        for oid, units in (("O1", 1.5), ("O2", 2.5)):
            body = encode_datum(schema, {"orderid": oid, "units": units})
            p.send("avro_orders", confluent_frame(1, body), key=oid,
                   timestamp_ms=1_700_000_000_000)
        p.flush()
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root).option("subscribe", "avro_orders")
               .load())
        typed = decode_avro_py(raw.select("value"), "value", schema)
        q = (typed.select("value.orderid", "value.units")
             .writeStream.format("memory").queryName("avro_live")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt_av")).start())
        try:
            q.processAllAvailable()
            rows = {(r.orderid, r.units) for r in
                    spark.sql("select * from avro_live").collect()}
            assert rows == {("O1", 1.5), ("O2", 2.5)}
        finally:
            q.stop()

    def test_decode_records_runs_unchanged_on_live_source(
            self, spark, broker, tmp_path):
        """The jar-gated kafka.py decode path, against a live stream."""
        p = broker.producer()
        p.send("lines", json.dumps({"ordertime": 5, "orderid": "O5",
                                    "itemid": "I1", "orderunits": 2.5}),
               key="O5", timestamp_ms=1_700_000_000_000)
        p.flush()
        fb.register(spark)
        from pyspark.sql.types import (DoubleType, LongType, StringType,
                                       StructField, StructType)
        schema = StructType([
            StructField("ordertime", LongType()),
            StructField("orderid", StringType()),
            StructField("itemid", StringType()),
            StructField("orderunits", DoubleType())])
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root).option("subscribe", "lines")
               .load())
        typed = decode_records(raw, schema)
        q = (typed.writeStream.format("memory").queryName("live_decode")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
        try:
            q.processAllAvailable()
            rows = spark.sql("select * from live_decode").collect()
            assert len(rows) == 1
            assert rows[0].rowkey == "O5"
            assert rows[0].orderunits == 2.5
            assert rows[0].rowtime == 1_700_000_000_000
        finally:
            q.stop()

    def test_restart_under_cap_never_redelivers(self, spark, broker,
                                                tmp_path):
        """ST5×ST6: a RESTARTED capped reader must not re-deliver committed
        offsets. A fresh reader instance has no in-memory cap baseline, so
        an unclamped ``min(end, 0 + cap)`` falls below the checkpointed
        start and the following batch re-reads committed rows — the
        exactly-once violation this test pins down."""
        p = broker.producer()
        for i in range(10):
            p.send("lines", f"a{i}", partition=0)
        p.flush()
        fb.register(spark)
        ckpt = str(tmp_path / "ckpt_restart")

        def run_to_drain():
            raw = (spark.readStream.format("filebroker")
                   .option("path", broker.root).option("subscribe", "lines")
                   .option("maxOffsetsPerTrigger", "3").load())
            got = []
            q = (raw.writeStream.foreachBatch(
                    lambda df, _e: got.extend(
                        bytes(r.value).decode() for r in df.collect()))
                 .option("checkpointLocation", ckpt).start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            return got

        first = run_to_drain()
        assert sorted(first) == [f"a{i}" for i in range(10)]
        for i in range(10, 14):
            p.send("lines", f"a{i}", partition=0)
        p.flush()
        second = run_to_drain()  # fresh reader, same checkpoint
        assert sorted(second) == [f"a{i}" for i in range(10, 14)]

    def test_backpressure_cap_bounds_each_epoch(self, spark, broker, tmp_path):
        """ST6: maxOffsetsPerTrigger caps per-epoch consumption for real."""
        p = broker.producer()
        for i in range(10):
            p.send("lines", f"word{i}", partition=0)
        p.flush()
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root).option("subscribe", "lines")
               .option("maxOffsetsPerTrigger", "3").load())
        seen = []
        q = (raw.writeStream.foreachBatch(
                lambda df, _e: seen.append(df.count()))
             .option("checkpointLocation", str(tmp_path / "ckpt3")).start())
        try:
            q.processAllAvailable()
            assert sum(seen) == 10
            assert max(c for c in seen if c) <= 3  # no epoch exceeds the cap
        finally:
            q.stop()
