"""Streaming wordcount against the reference's golden corpus.

Golden input and expected counts from KafkaWordCountTest.java:56-61, :152-160
(via FIXTURES.md §1): 4 Shakespeare lines → exact word counts.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_connect_streams_spark.streaming.wordcount import run_to_memory

CORPUS = [
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,",
]

#: KafkaWordCountTest.java:152-160 asserts these counts (subset of full map)
GOLDEN = {"to": 4, "be": 2, "or": 2, "not": 1, "that": 1, "is": 1,
          "the": 3, "question": 1, "whether": 1}


def test_streaming_wordcount_golden(spark, tmp_path):
    src = tmp_path / "lines"
    src.mkdir()
    with open(src / "part-0.json", "w") as f:
        for i, line in enumerate(CORPUS):
            f.write(json.dumps({"id": i, "value": line}) + "\n")

    lines = (spark.readStream
             .schema("id bigint, value string")
             .json(str(src)))
    q = run_to_memory(lines, "value", name="wc_test")
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT word, cnt FROM wc_test").collect()
    finally:
        q.stop()

    counts = {r.word: r.cnt for r in rows}
    for word, n in GOLDEN.items():
        assert counts.get(word) == n, f"{word}: {counts.get(word)} != {n}"
    # '\W+' split also strips the apostrophe → 'tis' tokenizes as 'tis'
    # (Derby-variant behavior, DatabaseWordCountTest.java:50)
    assert counts.get("tis") == 1


def test_database_wordcount_via_native_datasource(spark, tmp_path):
    """DatabaseWordCount end-to-end, PySpark-4 native form: external-table
    deltas via format('table_delta') → stateful wordcount → queryable memory
    state (reference topology DatabaseWordCount.java:105-133)."""
    from kafka_connect_streams_spark.sources.python_datasource import register
    register(spark)
    table = tmp_path / "ext_lines"
    spark.createDataFrame(
        list(enumerate(CORPUS)), "id bigint, value string"
    ).coalesce(1).write.mode("append").parquet(str(table))

    lines = (spark.readStream.format("table_delta")
             .option("path", str(table)).option("inc_col", "id")
             .load().select(F.col("value")))
    q = run_to_memory(lines, "value", name="wc_pds")
    try:
        q.processAllAvailable()
        counts = {r.word: r.cnt for r in
                  spark.sql("SELECT word, cnt FROM wc_pds").collect()}
    finally:
        q.stop()
    for word, n in GOLDEN.items():
        assert counts.get(word) == n, f"{word}: {counts.get(word)} != {n}"


class TestStreamingCurationGate:
    """Batch/stream unification of the curation surface: gopher_rules is a
    pure projection, so the SAME operator body must run unchanged on a
    live streaming leg (filebroker topic → readStream → memory sink) and
    emit exactly the rows the batch path computes on the same documents."""

    def test_gopher_rules_stream_equals_batch(self, spark, tmp_path):
        import json as js

        from kafka_connect_streams_spark.operators.text import gopher_rules
        from kafka_connect_streams_spark.sources import filebroker as fb

        docs = [
            (0, "short doc"),
            (1, " ".join(f"w{i}" for i in range(40))),          # diverse, ok
            (2, " ".join(["spam"] * 40)),                        # repetitive
            (3, " ".join("abcdefghijklmnop" for _ in range(25))),  # long toks
            (4, " ".join(f"t{i % 25}" for i in range(60))),      # cyclic
        ]
        broker = fb.FileBroker(str(tmp_path / "broker"))
        broker.create_topic("docs_topic", partitions=2)
        p = broker.producer()
        for i, text in docs:
            p.send("docs_topic", js.dumps({"doc_id": i, "text": text}),
                   key=str(i), timestamp_ms=1_700_000_000_000 + i)
        p.flush()

        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root)
               .option("subscribe", "docs_topic").load())
        parsed = raw.selectExpr(
            "from_json(CAST(value AS STRING), "
            "'doc_id long, text string') AS v").select("v.*")
        gated = gopher_rules(parsed, "text", "doc_id")
        assert gated.isStreaming
        q = (gated.writeStream.format("memory").queryName("curation_gate")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None

        batch = {r.doc_id: tuple(r)
                 for r in gopher_rules(
                     spark.createDataFrame(docs, "doc_id long, text string"),
                     "text", "doc_id").collect()}
        streamed = {r.doc_id: tuple(r)
                    for r in spark.sql(
                        "SELECT * FROM curation_gate").collect()}
        assert streamed == batch
        assert streamed[1][-1] is True          # the diverse doc survives
        assert streamed[0][-1] is False         # too_short dropped
        assert streamed[4][-1] is False         # cyclic text is repetitive
