"""Streaming word count — parity with the reference's flagship example.

Reference: ``KafkaWordCount.countWords`` (examples/KafkaWordCount.java:56-67):
``stream → flatMapValues(split(lower)) → groupBy(word) → count → toStream →
to(output)``, with the count KTable continuously emitting updates.

Spark form: one declarative pipeline; ``update`` output mode emits exactly the
changed (word, count) rows per micro-batch — the KTable changelog contract
(A2/A3). The repartition topic the reference materializes on the broker
becomes an in-cluster shuffle; map-side partial counts cut the shuffle to one
row per (partition, word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from kafka_connect_streams_spark.operators.aggregations import word_count


def wordcount_stream(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """Build the streaming wordcount over any streaming DataFrame of lines."""
    return word_count(lines, text_col)


def run_to_memory(lines: DataFrame, text_col: str = "value",
                  name: str = "wordcounts") -> StreamingQuery:
    """Run the pipeline into a queryable in-memory table (the analog of the
    reference's queryable state store, AbstractJoinIntegrationTest.java:268-281).

    ``complete`` mode keeps the whole KTable queryable via
    ``spark.sql(f"SELECT * FROM {name}")``; production sinks use ``update``
    mode + foreachBatch upsert instead (see sources/sinks.py).
    """
    counts = wordcount_stream(lines, text_col)
    return (counts.writeStream
            .format("memory")
            .queryName(name)
            .outputMode("complete")
            .start())
