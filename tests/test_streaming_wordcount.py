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
