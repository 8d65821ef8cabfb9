"""Custom stateful operators + streaming dedup + update-mode changelog, and
the full DatabaseWordCount end-to-end pipeline (entry point 1 parity).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_connect_streams_spark.sources.sinks import parquet_upsert_writer
from kafka_connect_streams_spark.sources.table_poll import (TablePollSource,
                                                            parquet_dir_reader)
from kafka_connect_streams_spark.streaming.state import (running_count,
                                                         streaming_dedup)
from kafka_connect_streams_spark.operators.aggregations import word_count

CORPUS = [
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,",
]
GOLDEN = {"to": 4, "be": 2, "or": 2, "not": 1, "that": 1, "is": 1,
          "the": 3, "question": 1, "whether": 1}


def test_running_count_stateful_operator(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for k in ["x", "y", "x", "x"]:
            f.write(json.dumps({"key": k}) + "\n")
    stream = spark.readStream.schema("key string").json(str(src))
    q = (running_count(stream).writeStream
         .format("memory").queryName("rc").outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {r.key: r.cnt for r in spark.sql("SELECT * FROM rc").collect()}
        assert got == {"x": 3, "y": 1}
        # second batch updates only the touched key (changelog emission)
        with open(src / "b.json", "w") as f:
            f.write(json.dumps({"key": "y"}) + "\n")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM rc").collect()
    finally:
        q.stop()
    # update-mode memory sink appends changed rows; latest y row shows 2
    latest = {}
    for r in rows:
        latest[r.key] = r.cnt
    assert latest["y"] == 2 and latest["x"] == 3


def test_streaming_dedup_drops_in_window_duplicates(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000
    with open(src / "a.json", "w") as f:
        for i, (k, off) in enumerate([("a", 0), ("a", 1000), ("b", 2000)]):
            f.write(json.dumps({"k": k, "ts_ms": base + off}) + "\n")
    stream = (spark.readStream.schema("k string, ts_ms long").json(str(src))
              .selectExpr("k", "timestamp_micros(ts_ms*1000) AS ts"))
    out = streaming_dedup(stream, ["k"], watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM dd").collect()
    finally:
        q.stop()
    assert sorted(r.k for r in rows) == ["a", "b"]


def test_database_wordcount_end_to_end(spark, tmp_path):
    """Entry point 1 parity (DatabaseWordCount.countWords, examples/
    DatabaseWordCount.java:53-140): poll an external table incrementally →
    flatMap/groupBy/count → upsert latest counts into an output table.

    Golden counts from DatabaseWordCountTest.java:118-126.
    """
    table, outdir = tmp_path / "wc_input", tmp_path / "wc_output"
    ckpt = str(tmp_path / "ckpt")

    # the JDBC input table (id, lines) — DatabaseWordCountTest.java:58-60
    spark.createDataFrame(list(enumerate(CORPUS[:2])), "id bigint, lines string") \
        .write.mode("overwrite").parquet(str(table))

    src = TablePollSource(parquet_dir_reader(str(table)),
                          mode="incrementing", inc_col="id", checkpoint=ckpt)
    sink = parquet_upsert_writer(str(outdir), ["word"])

    state = {"rows": []}

    def deliver(batch, epoch):
        new = batch.collect()
        if not new:
            return
        state["rows"].extend(new)
        everything = spark.createDataFrame(state["rows"], batch.schema)
        counts = word_count(everything, "lines")
        sink(counts, epoch)

    # batch 1: first two lines
    b = src.poll(spark); deliver(b, 0); src.commit(b)
    # "new rows appear in the table" → incremental poll picks up only them
    spark.createDataFrame(list(enumerate(CORPUS)), "id bigint, lines string") \
        .write.mode("overwrite").parquet(str(table))
    b = src.poll(spark)
    assert sorted(r.id for r in b.collect()) == [2, 3]
    deliver(b, 1); src.commit(b)

    got = {r.word: r.cnt for r in spark.read.parquet(str(outdir)).collect()}
    for w, n in GOLDEN.items():
        assert got.get(w) == n, f"{w}: {got.get(w)} != {n}"
