"""The connector data plane, re-expressed as Structured Streaming sources/sinks.

Reference architecture (SURVEY.md §2.1): ~2.3k lines of wrapped
Consumer/Producer machinery make Kafka Connect connectors impersonate Kafka
clients (ConnectSourceConsumer/ConnectSinkProducer/WrappedConsumer/
WrappedProducer + a forked partition assignor). Here the same capabilities
are ~200 lines of idiomatic Spark:

- ``table_poll``  — S2-S4: incremental/bulk polling of an external table with
  a checkpointed high-water mark (replaces ConnectSourceConsumer + the
  FileOffsetBackingStore offset plumbing)
- ``sinks``       — S5-S7: foreachBatch delivery with append/upsert modes
  (replaces ConnectSinkProducer's buffer+flush → SinkTask.put(batch))
- ``hybrid``      — S9-S10: union of heterogeneous streaming sources; routing
  one stream to many sinks by a topic column (replaces Wrapped* muxing)
- ``kafka``       — S1/S5: Kafka topic source/sink option builders (gated on
  the spark-sql-kafka package being on the classpath)
- ``serde``       — §1.5: JSON/CSV/Avro envelope encode/decode
"""
