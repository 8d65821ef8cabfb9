"""Incremental table-polling source — the JDBC source connector, Spark-style.

Reference: ``ConnectSourceConsumer`` runs a reader thread that polls a
``SourceTask`` (the Confluent JDBC source) into a bounded queue and tracks
``(sourcePartition → sourceOffset)`` in a file store
(ConnectSourceConsumer.java:550-630, 292-295; FileOffsetBackingStore.java:42-111).
Two modes (examples/DatabaseWordCount.java:99, DatabaseFlatMap.java:96-97):

- **bulk**: re-scan the whole table each poll
- **incrementing**: emit only rows with ``incrementing.column > last_offset``

Spark form: a micro-batch loop (``rate`` trigger stream + ``foreachBatch``)
that reads the table delta per tick with the high-water mark kept in the
streaming checkpoint — no reader threads, no offset files, no bounded-queue
backpressure (Spark's trigger interval + maxOffsets replaces it, ST6), and
restart-safe exactly where the reference's never-invoked commit path
(ConnectSourceConsumer.java:471-472, "TODO call") was not.

The table reader is pluggable: ``jdbc_reader`` for real databases,
``parquet_dir_reader`` for file-backed tables (used in tests — no DB server
ships in this environment, and the semantics under test are identical).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: a TableReader returns the CURRENT full table snapshot as a DataFrame.
TableReader = Callable[[SparkSession], DataFrame]


def jdbc_reader(url: str, table: str, numPartitions: int = 8,
                partitionColumn: str | None = None,
                lowerBound: int | None = None,
                upperBound: int | None = None, **options) -> TableReader:
    """Reader for a real database table (the production path).

    ``numPartitions``/``partitionColumn`` split the scan into parallel range
    queries — the reference pins every connector table to one task/partition
    (WrappedPartitionGrouper.java:80-86), which serializes 100 TB behind a
    single connection; this reader does not.
    """
    def read(spark: SparkSession) -> DataFrame:
        r = (spark.read.format("jdbc")
             .option("url", url).option("dbtable", table))
        if partitionColumn is not None:
            r = (r.option("numPartitions", numPartitions)
                 .option("partitionColumn", partitionColumn)
                 .option("lowerBound", lowerBound)
                 .option("upperBound", upperBound))
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()
    return read


def parquet_dir_reader(path: str) -> TableReader:
    """Reader over a parquet directory standing in for an external table."""
    def read(spark: SparkSession) -> DataFrame:
        return spark.read.parquet(path)
    return read


class TablePollSource:
    """Poll an external table into a downstream pipeline per micro-batch.

    ``mode="bulk"`` re-emits the full snapshot each tick (S3);
    ``mode="incrementing"`` emits rows with ``inc_col > high-water mark`` (S4).

    The high-water mark lives next to the streaming checkpoint so a restart
    resumes from the last COMMITTED batch: foreachBatch runs before the mark
    advances, and a re-run of the same epoch overwrites idempotently.
    """

    def __init__(self, reader: TableReader, *, mode: str = "incrementing",
                 inc_col: str = "id", checkpoint: str | None = None,
                 max_rows_per_poll: int | None = None):
        if mode not in ("bulk", "incrementing"):
            raise ValueError(f"unknown mode: {mode}")
        if max_rows_per_poll is not None:
            if mode != "incrementing":
                raise ValueError(
                    "max_rows_per_poll requires incrementing mode: a bulk "
                    "snapshot is all-or-nothing, a capped snapshot is neither")
            if max_rows_per_poll < 1:
                raise ValueError("max_rows_per_poll must be >= 1")
        self.reader = reader
        self.mode = mode
        self.inc_col = inc_col
        self.checkpoint = checkpoint
        self.max_rows_per_poll = max_rows_per_poll
        self._offset_path = (
            os.path.join(checkpoint, "table_poll_offset.json") if checkpoint else None)

    # -- offset bookkeeping (replaces FileOffsetBackingStore) --------------

    def _load_offset(self) -> int:
        if self._offset_path and os.path.exists(self._offset_path):
            with open(self._offset_path) as f:
                return json.load(f)["high_water"]
        return -(1 << 62)

    def _store_offset(self, value: int) -> None:
        if self._offset_path:
            os.makedirs(os.path.dirname(self._offset_path), exist_ok=True)
            tmp = self._offset_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"high_water": value}, f)
            os.replace(tmp, self._offset_path)

    # -- polling -----------------------------------------------------------

    def poll(self, spark: SparkSession) -> DataFrame:
        """One micro-batch worth of rows (delta since the high-water mark).

        With ``max_rows_per_poll`` set, the delta is capped to the N rows with
        the smallest ``inc_col`` above the mark — backpressure in the
        ``maxOffsetsPerTrigger`` sense (ST6): a burst on the source table
        drains over several triggers instead of one oversized batch. The
        reference gets the same property from its bounded transfer queue
        (ConnectSourceConsumer's reader thread blocks when the queue fills).
        Catalyst plans the cap as TakeOrderedAndProject — per-partition top-N
        then a single merge of N rows, never a full global sort.
        """
        snapshot = self.reader(spark)
        if self.mode == "bulk":
            return snapshot
        delta = snapshot.filter(F.col(self.inc_col) > F.lit(self._load_offset()))
        if self.max_rows_per_poll is not None:
            delta = (delta.orderBy(self.inc_col)
                     .limit(self.max_rows_per_poll))
        return delta

    def commit(self, batch: DataFrame) -> None:
        """Advance the high-water mark after a batch is durably delivered."""
        if self.mode != "incrementing":
            return
        row = batch.agg(F.max(self.inc_col).alias("m")).collect()[0]
        if row["m"] is not None:
            self._store_offset(row["m"])

    def start(self, spark: SparkSession,
              deliver: Callable[[DataFrame, int], None],
              trigger_seconds: float = 1.0) -> StreamingQuery:
        """Drive the poll loop with a rate-source heartbeat + foreachBatch.

        ``deliver(batch_df, epoch_id)`` receives each delta exactly once per
        epoch (re-delivered only if the epoch failed before commit — the
        at-least-once-into-idempotent-sink contract foreachBatch gives).
        """
        heartbeat = (spark.readStream.format("rate")
                     .option("rowsPerSecond", 1).load())

        def tick(_beat: DataFrame, epoch: int) -> None:
            batch = self.poll(spark)
            deliver(batch, epoch)
            self.commit(batch)

        writer = (heartbeat.writeStream
                  .foreachBatch(tick)
                  .trigger(processingTime=f"{trigger_seconds} seconds"))
        if self.checkpoint:
            writer = writer.option("checkpointLocation",
                                   os.path.join(self.checkpoint, "stream"))
        return writer.start()
