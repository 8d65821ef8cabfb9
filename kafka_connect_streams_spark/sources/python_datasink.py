"""Native PySpark DataSource streaming SINK: the Connect sink task (S6/S7),
engine-managed.

The reference's sink data-plane buffers ``SinkTask.put(records)`` and flushes
on offset commit (ConnectSinkConsumer wraps the Confluent JDBC sink; the
buffer/flush contract is WrappedSinkTask.put → flush). PySpark 4's
``DataSourceStreamArrowWriter`` is the first-class seam for the same
contract, with the two halves placed where a distributed engine needs them:

- ``write(iterator[RecordBatch])`` runs on EXECUTORS once per partition per
  micro-batch — the ``put``. Batches stream through Arrow (never
  row-at-a-time Python) into one staged parquet file per task.
- ``commit(messages, batchId)`` runs on the DRIVER only after every task of
  the epoch succeeded — the ``flush``. It publishes the staged files
  atomically (rename into the table dir + a per-epoch manifest).

Exactly-once: a replayed epoch (failure after write, before/during commit)
re-stages fresh files, but ``commit`` finds the epoch's manifest already
present and discards the replay's files instead of publishing twice —
idempotent publication, the property the reference's never-invoked
commit path (ConnectSourceConsumer.java:471-472 "TODO call") was missing.
Readers see only published files: staging and manifests live under
underscore-prefixed subdirs, which parquet scans skip by convention.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceStreamArrowWriter,
                                    WriterCommitMessage)


@dataclass
class _StagedFile(WriterCommitMessage):
    """One task's staged output: relative staging name + row count."""
    staged: str | None
    rows: int


class TableSinkStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    # -- executor side: the "put" -------------------------------------------

    def write(self, iterator: Iterator) -> _StagedFile:
        import pyarrow as pa
        import pyarrow.parquet as pq
        batches = list(iterator)
        n = sum(b.num_rows for b in batches)
        if n == 0:
            return _StagedFile(staged=None, rows=0)
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"{uuid.uuid4().hex}.parquet"
        pq.write_table(pa.Table.from_batches(batches),
                       os.path.join(staging, name))
        return _StagedFile(staged=name, rows=n)

    # -- driver side: the "flush" -------------------------------------------

    def _manifest(self, batch_id: int) -> str:
        return os.path.join(self.path, "_commits", f"{batch_id}.json")

    def commit(self, messages, batchId: int) -> None:
        staged = [m.staged for m in messages
                  if m is not None and m.staged is not None]
        manifest = self._manifest(batchId)
        staging = os.path.join(self.path, "_staging")
        if os.path.exists(manifest):
            # epoch replay: the first attempt already published — drop the
            # replay's staged files so the batch lands exactly once
            for name in staged:
                try:
                    os.remove(os.path.join(staging, name))
                except FileNotFoundError:
                    pass
            return
        published = []
        for i, name in enumerate(staged):
            final = f"part-{batchId:05d}-{i:04d}.parquet"
            os.replace(os.path.join(staging, name),
                       os.path.join(self.path, final))
            published.append(final)
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "files": published,
                       "rows": sum(m.rows for m in messages if m)}, f)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        for m in messages:
            if m is not None and m.staged is not None:
                try:
                    os.remove(os.path.join(staging, m.staged))
                except FileNotFoundError:
                    pass


class TableSinkDataSource(DataSource):
    """``df.writeStream.format("table_sink").option("path", dir)`` —
    register with ``spark.dataSource.register(TableSinkDataSource)``.

    Local-filesystem staging/rename stands in for the object-store or DB
    transaction a production sink would use; the put/flush split and the
    idempotent-epoch contract are the part that carries to 100 TB.
    """

    @classmethod
    def name(cls) -> str:
        return "table_sink"

    def streamWriter(self, schema, overwrite: bool) -> TableSinkStreamWriter:
        return TableSinkStreamWriter(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(TableSinkDataSource)


__all__ = ["TableSinkDataSource", "TableSinkStreamWriter", "register"]
