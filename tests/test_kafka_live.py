"""Live ``format("kafka")`` round-trip — executable the day the jar appears.

The reference's flagship path is produce → wordcount → consume against a
real broker (examples/KafkaWordCount.java:56-67,
EmbeddedSingleNodeKafkaCluster.java). This sandbox ships neither the
``spark-sql-kafka`` connector jar nor a broker binary, so the test below is
pinned behind two concrete, checkable preconditions:

- the connector jar for this build (pyspark 4.1.2 / Scala 2.13):
  **``org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2``** — either on the
  Spark classpath or resolvable from a local ivy/maven cache via
  ``spark.jars.packages``;
- a reachable broker, configured through ``KAFKA_BOOTSTRAP_SERVERS``.

When both hold, the test runs the REAL S1/S5 legs (kafka_source /
encode_records / kafka_sink) with zero code changes — everything else in
sources/kafka.py is already exercised against the wire schema by
test_serde.py and the filebroker suite.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

#: exact coordinate for this build: Spark 4.1.2 is published for Scala 2.13.
KAFKA_JAR_COORD = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"


def _connector_jar_present() -> bool:
    import pyspark
    jar_dirs = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.path.expanduser("~/.ivy2/jars"),
        os.path.expanduser("~/.ivy2.5.2/jars"),
        os.path.expanduser(
            "~/.m2/repository/org/apache/spark/spark-sql-kafka-0-10_2.13"),
    ]
    return any(glob.glob(os.path.join(d, "**", "*spark-sql-kafka*"),
                         recursive=True) for d in jar_dirs
               if os.path.isdir(d))


BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

pytestmark = pytest.mark.skipif(
    not (_connector_jar_present() and BOOTSTRAP),
    reason=f"needs {KAFKA_JAR_COORD} on the classpath (absent from this "
           "sandbox) and KAFKA_BOOTSTRAP_SERVERS pointing at a live broker",
)


def test_produce_wordcount_consume_roundtrip(spark, tmp_path):
    """KafkaWordCount.java:56-67 shape: write lines to an input topic, read
    them back via format("kafka"), count words, publish the changelog."""
    from kafka_connect_streams_spark.operators.aggregations import word_count
    from kafka_connect_streams_spark.sources.kafka import (
        decode_records, encode_records, kafka_source)
    from pyspark.sql.types import StringType, StructField, StructType

    topic_in = f"lines_{uuid.uuid4().hex[:8]}"
    topic_out = f"counts_{uuid.uuid4().hex[:8]}"

    lines = ["all streams lead to kafka", "hello kafka streams"]
    (spark.createDataFrame([(None, json.dumps({"line": ln})) for ln in lines],
                           "key string, value string")
     .write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic_in).save())

    schema = StructType([StructField("line", StringType())])
    raw = (kafka_source(spark, brokers=BOOTSTRAP, subscribe=topic_in)
           .load())
    typed = decode_records(raw, schema)
    counts = word_count(typed, "line")
    wire = encode_records(
        counts.select(F.col("word").alias("rowkey"), "cnt"), key_col="rowkey")
    q = (wire.writeStream.format("kafka")
         .option("kafka.bootstrap.servers", BOOTSTRAP)
         .option("topic", topic_out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = (spark.read.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("subscribe", topic_out)
            .option("startingOffsets", "earliest").load())
    got = {bytes(r.key).decode(): json.loads(bytes(r.value))["cnt"]
           for r in back.collect()}
    assert got["kafka"] == 2 and got["streams"] == 2 and got["hello"] == 1
