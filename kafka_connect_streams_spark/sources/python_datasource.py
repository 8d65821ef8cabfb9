"""Native PySpark DataSource: incremental external-table stream (S2/S4).

The reference's connector data-plane is a reader thread pumping
``SourceTask.poll()`` into a bounded queue with hand-rolled offset bookkeeping
(ConnectSourceConsumer.java:550-630 create/pump, 292-295 offsets;
FileOffsetBackingStore.java:42-111). PySpark 4 has a first-class seam for
exactly this: the Python DataSource API (``pyspark.sql.datasource``). This
module implements it as a **real streaming source** — usable as
``spark.readStream.format("table_delta")`` — with:

- **engine-managed offsets**: ``initialOffset``/``latestOffset`` return the
  incrementing-column high-water mark; Spark persists them in the streaming
  checkpoint and replays uncommitted epochs (replacing the reference's
  never-invoked commit path, ConnectSourceConsumer.java:471-472 "TODO call").
- **partitioned reads**: each micro-batch's ``(start, end]`` delta is split
  into N range slices, one executor task each — the reference pins every
  connector table to a single task (WrappedPartitionGrouper.java:80-86),
  serializing the whole table behind one reader thread.
- **executor-side scans**: ``read(partition)`` runs on executors with
  pyarrow's dataset filter pushdown; the driver only reads metadata.

The backing "external table" is a growing parquet directory (the same
file-backed stand-in the TablePollSource tests use — no DB server ships in
this container); the reader seam is the pyarrow dataset, so any
arrow-readable store slots in.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

#: arrow type name → Spark SQL DDL type (the subset the testdata exercises;
#: Connect's richer logical types map per SURVEY.md §1.3)
_ARROW_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint",
    "float": "float", "double": "double", "string": "string",
    "large_string": "string", "bool": "boolean", "binary": "binary",
}


def _unified_dataset(path: str):
    """Open the parquet dir with the UNION of all fragments' schemas.

    Connect carries schemas per record and lets a topic's schema widen over
    time (SURVEY.md §1.4); the parquet analogue is a directory whose later
    files add nullable columns. ``pads.dataset`` alone binds the FIRST
    fragment's schema (silently dropping new columns), so we unify across
    fragments — old files then read with nulls in the added columns, the
    exact Connect backward-compatible-evolution contract. Metadata-only:
    unification reads footers, not data pages.
    """
    import pyarrow as pa
    import pyarrow.dataset as pads
    ds = pads.dataset(path, format="parquet")
    unified = pa.unify_schemas([f.physical_schema for f in ds.get_fragments()])
    if unified == ds.schema:
        return ds
    return pads.dataset(path, format="parquet", schema=unified)


def _arrow_ddl(field) -> str:
    t = str(field.type)
    if t.startswith("timestamp"):
        ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
    else:
        ddl = _ARROW_TO_DDL.get(t)
    if ddl is None:
        raise ValueError(f"unsupported arrow type for table_delta: {t}")
    return f"{field.name} {ddl}"


class _RangeSlice(InputPartition):
    """One (lo, hi] slice of the incrementing column for one epoch."""

    def __init__(self, path: str, inc_col: str, lo: int, hi: int):
        self.path, self.inc_col, self.lo, self.hi = path, inc_col, lo, hi


class TableDeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema_fields: Sequence[str], options: dict):
        self.path = options["path"]
        self.inc_col = options.get("inc_col", "id")
        self.num_slices = int(options.get("numpartitions", 4))
        self.fields = list(schema_fields)

    # -- offsets (driver side; Spark checkpoints the returned dicts) --------

    def initialOffset(self) -> dict:
        return {"hwm": -1}

    def latestOffset(self) -> dict:
        import pyarrow.dataset as pads
        try:
            ds = pads.dataset(self.path, format="parquet")
        except FileNotFoundError:
            return {"hwm": -1}
        # High-water mark from parquet row-group statistics: O(row groups)
        # footer reads, zero data pages — the driver never materializes the
        # column no matter how large the table grows.
        hwm = None
        try:
            for frag in ds.get_fragments():
                md = frag.metadata
                for rg in range(md.num_row_groups):
                    group = md.row_group(rg)
                    if group.num_rows == 0:
                        continue
                    stats = None
                    for ci in range(group.num_columns):
                        col = group.column(ci)
                        if col.path_in_schema == self.inc_col:
                            stats = col.statistics
                            break
                    if stats is None or not stats.has_min_max:
                        raise LookupError("no min/max stats")
                    hwm = stats.max if hwm is None else max(hwm, stats.max)
        except LookupError:
            # stats absent (legacy writer) — fall back to a column scan
            import pyarrow.compute as pc
            col = ds.to_table(columns=[self.inc_col])[self.inc_col]
            hwm = pc.max(col).as_py() if len(col) else None
        return {"hwm": -1 if hwm is None else int(hwm)}

    # -- per-epoch planning --------------------------------------------------

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["hwm"]), int(end["hwm"])
        if hi <= lo:
            return [_RangeSlice(self.path, self.inc_col, lo, lo)]
        width = max(1, (hi - lo) // self.num_slices)
        slices = []
        cur = lo
        while cur < hi:
            nxt = min(hi, cur + width) if len(slices) < self.num_slices - 1 else hi
            slices.append(_RangeSlice(self.path, self.inc_col, cur, nxt))
            cur = nxt
        return slices

    # -- executor-side scan --------------------------------------------------

    def read(self, partition: _RangeSlice) -> Iterator[tuple]:
        if partition.hi <= partition.lo:
            return
        import pyarrow.dataset as pads
        ds = _unified_dataset(partition.path)
        expr = ((pads.field(partition.inc_col) > partition.lo)
                & (pads.field(partition.inc_col) <= partition.hi))
        # filter + column projection push into the parquet scan; yielding
        # whole arrow RecordBatches keeps the executor path columnar end to
        # end (the DataSource API arrow-serializes them directly — no
        # per-row Python conversion)
        table = ds.to_table(filter=expr, columns=self.fields)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # nothing to do: the delta below end["hwm"] is immutable in the
        # source table; Spark's checkpoint owns the progress record
        pass


class TableDeltaDataSource(DataSource):
    """``spark.readStream.format("table_delta")`` — register with
    ``spark.dataSource.register(TableDeltaDataSource)``.

    Options: ``path`` (parquet dir), ``inc_col`` (incrementing column,
    default ``id``), ``numPartitions`` (delta slices per epoch, default 4).
    """

    @classmethod
    def name(cls) -> str:
        return "table_delta"

    def schema(self) -> str:
        ds = _unified_dataset(self.options["path"])
        return ", ".join(_arrow_ddl(f) for f in ds.schema)

    def streamReader(self, schema) -> TableDeltaStreamReader:
        return TableDeltaStreamReader([f.name for f in schema.fields],
                                      dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(TableDeltaDataSource)


__all__ = ["TableDeltaDataSource", "TableDeltaStreamReader", "register"]
