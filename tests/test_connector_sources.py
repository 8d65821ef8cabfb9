"""Connector data plane: incremental table polling, sinks, hybrid union.

Covers S2-S4 (incremental/bulk source + offset bookkeeping), S6-S7 (batch
sinks incl. KTable upsert), S9-S10 (hybrid merge / routed sinks) with
parquet-backed stand-in tables (no DB server in this environment; the
polling/offset/upsert semantics under test are storage-agnostic).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_streams_spark.sources.hybrid import hybrid_union, normalize
from kafka_connect_streams_spark.sources.sinks import (parquet_upsert_writer,
                                                       route_by_topic)
from kafka_connect_streams_spark.sources.table_poll import (TablePollSource,
                                                            parquet_dir_reader)


def _write_table(spark, path, rows):
    spark.createDataFrame(rows, "id bigint, lines string") \
        .coalesce(1).write.mode("overwrite").parquet(str(path))


class TestTablePoll:
    def test_incrementing_mode_emits_only_new_rows(self, spark, tmp_path):
        table = tmp_path / "t"
        src = TablePollSource(parquet_dir_reader(str(table)),
                              mode="incrementing", inc_col="id",
                              checkpoint=str(tmp_path / "ckpt"))
        _write_table(spark, table, [(1, "a"), (2, "b")])
        b1 = src.poll(spark)
        assert sorted(r.id for r in b1.collect()) == [1, 2]
        src.commit(b1)

        _write_table(spark, table, [(1, "a"), (2, "b"), (3, "c")])
        b2 = src.poll(spark)
        assert [r.id for r in b2.collect()] == [3]
        src.commit(b2)

    def test_offset_survives_restart(self, spark, tmp_path):
        table = tmp_path / "t"
        ckpt = str(tmp_path / "ckpt")
        _write_table(spark, table, [(1, "a"), (2, "b")])
        src = TablePollSource(parquet_dir_reader(str(table)),
                              mode="incrementing", inc_col="id", checkpoint=ckpt)
        src.commit(src.poll(spark))
        # new instance, same checkpoint — the FileOffsetBackingStore parity,
        # minus the reference's never-invoked commit path (§4.3)
        src2 = TablePollSource(parquet_dir_reader(str(table)),
                               mode="incrementing", inc_col="id", checkpoint=ckpt)
        assert src2.poll(spark).count() == 0

    def test_bulk_mode_rescans(self, spark, tmp_path):
        table = tmp_path / "t"
        _write_table(spark, table, [(1, "a"), (2, "b")])
        src = TablePollSource(parquet_dir_reader(str(table)), mode="bulk")
        assert src.poll(spark).count() == 2
        src.commit(src.poll(spark))
        assert src.poll(spark).count() == 2  # bulk re-emits everything

    def test_backpressure_caps_batch_size_and_drains_fully(self, spark, tmp_path):
        """ST6 backpressure: a 10-row burst with max_rows_per_poll=3 drains
        over ceil(10/3)=4 polls, each batch ≤ 3 rows, in inc_col order, with
        no row lost or duplicated — the maxOffsetsPerTrigger contract the
        reference gets from its bounded transfer queue."""
        table = tmp_path / "t"
        _write_table(spark, table, [(i, f"r{i}") for i in range(1, 11)])
        src = TablePollSource(parquet_dir_reader(str(table)),
                              mode="incrementing", inc_col="id",
                              checkpoint=str(tmp_path / "ckpt"),
                              max_rows_per_poll=3)
        batches = []
        for _ in range(6):  # more polls than needed: later ones must be empty
            b = src.poll(spark)
            ids = sorted(r.id for r in b.collect())
            src.commit(b)
            batches.append(ids)
        assert batches == [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10], [], []]

    def test_backpressure_rejects_bulk_mode(self, spark, tmp_path):
        with pytest.raises(ValueError, match="incrementing"):
            TablePollSource(parquet_dir_reader(str(tmp_path / "t")),
                            mode="bulk", max_rows_per_poll=3)

    def test_streaming_loop_delivers(self, spark, tmp_path):
        table, out = tmp_path / "t", tmp_path / "out"
        _write_table(spark, table, [(1, "to be or"), (2, "not to be")])
        src = TablePollSource(parquet_dir_reader(str(table)),
                              mode="incrementing", inc_col="id",
                              checkpoint=str(tmp_path / "ckpt"))
        delivered = []

        def deliver(batch, _epoch):
            rows = batch.collect()
            if rows:
                delivered.extend(r.id for r in rows)

        q = src.start(spark, deliver, trigger_seconds=0.5)
        try:
            import time
            deadline = time.time() + 30
            while time.time() < deadline and sorted(delivered) != [1, 2]:
                time.sleep(0.5)
        finally:
            q.stop()
        assert sorted(delivered) == [1, 2]
        assert out is not None


class TestDatabaseFlatMap:
    """examples/DatabaseFlatMap.java end to end: external table in, one row
    PER WORD out to a sink table — the database twin of the Kafka flatMap
    round-trip (no aggregation, multiplicity preserved)."""

    def test_table_to_table_flatmap(self, spark, tmp_path):
        from kafka_connect_streams_spark.operators.projections import (
            flat_map_values)
        table, out = tmp_path / "t", tmp_path / "words_out"
        _write_table(spark, table, [(1, "all streams lead to kafka"),
                                    (2, "hello kafka streams")])
        src = TablePollSource(parquet_dir_reader(str(table)),
                              mode="incrementing", inc_col="id",
                              checkpoint=str(tmp_path / "ckpt"))
        batch = src.poll(spark)
        words = flat_map_values(batch, "lines")
        words.write.mode("append").parquet(str(out))
        src.commit(batch)
        got = sorted(r.word for r in spark.read.parquet(str(out)).collect())
        expected = sorted(w for _, line in
                          [(1, "all streams lead to kafka"),
                           (2, "hello kafka streams")]
                          for w in line.lower().split())
        assert got == expected


class TestSinks:
    def test_upsert_keeps_latest_per_key(self, spark, tmp_path):
        path = str(tmp_path / "counts")
        w = parquet_upsert_writer(path, ["word"])
        w(spark.createDataFrame([("to", 2), ("be", 1)], "word string, cnt long"), 0)
        w(spark.createDataFrame([("to", 4), ("or", 2)], "word string, cnt long"), 1)
        got = {r.word: r.cnt for r in spark.read.parquet(path).collect()}
        # KTable semantics: latest per key (DatabaseWordCountTest.java:74-83)
        assert got == {"to": 4, "be": 1, "or": 2}

    def test_route_by_topic_fans_out(self, spark, tmp_path):
        seen: dict[str, list] = {"t1": [], "t2": []}

        def mk(topic):
            def w(df, _e):
                seen[topic].extend(r.v for r in df.collect())
            return w

        router = route_by_topic(
            spark.range(0).toDF("x"), "topic",
            {"t1": mk("t1"), "t2": mk("t2")})
        batch = spark.createDataFrame(
            [("t1", 1), ("t2", 2), ("t1", 3)], "topic string, v long")
        router(batch, 0)
        assert sorted(seen["t1"]) == [1, 3]
        assert seen["t2"] == [2]


class TestHybrid:
    def test_union_of_heterogeneous_legs(self, spark):
        kafka_like = spark.createDataFrame(
            [("k1", "v1", 1_700_000_000_000)], "key string, value string, ts_ms long")
        jdbc_like = spark.createDataFrame(
            [(7, "row7", 1_700_000_001_000)], "id long, lines string, ts_ms long")
        leg1 = normalize(kafka_like, topic="real-topic", key=F.col("key"),
                         value=F.col("value"),
                         ts=F.expr("timestamp_micros(ts_ms*1000)"))
        leg2 = normalize(jdbc_like, topic="jdbc-table", key=F.col("id"),
                         value=F.col("lines"),
                         ts=F.expr("timestamp_micros(ts_ms*1000)"))
        merged = hybrid_union(leg1, leg2)
        rows = {(r.topic, r.key, r.value) for r in merged.collect()}
        assert rows == {("real-topic", "k1", "v1"), ("jdbc-table", "7", "row7")}


class TestPythonDataSource:
    """Native PySpark DataSource form of the connector source (S2/S4):
    spark.readStream.format("table_delta") with engine-managed offsets."""

    def _append(self, spark, path, rows):
        spark.createDataFrame(rows, "id bigint, lines string") \
            .coalesce(1).write.mode("append").parquet(str(path))

    def test_stream_delivers_increments_and_resumes(self, spark, tmp_path):
        from kafka_connect_streams_spark.sources.python_datasource import (
            register)
        register(spark)
        table, ckpt = tmp_path / "ext", str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        self._append(spark, table, [(1, "a"), (2, "b")])

        def drain():
            # parquet sink: supports checkpoint recovery (memory sink
            # doesn't), so the second run resumes from the committed hwm
            q = (spark.readStream.format("table_delta")
                 .option("path", str(table)).option("inc_col", "id")
                 .option("numPartitions", 2).load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            return sorted(r.id for r in spark.read.parquet(out).collect())

        assert drain() == [1, 2]
        # growth between epochs: only the delta is delivered after restart
        self._append(spark, table, [(3, "c"), (4, "d")])
        assert drain() == [1, 2, 3, 4]  # output is cumulative, delta-appended

    def test_schema_inferred_from_table(self, spark, tmp_path):
        from kafka_connect_streams_spark.sources.python_datasource import (
            register)
        register(spark)
        table = tmp_path / "ext2"
        self._append(spark, table, [(1, "x")])
        df = (spark.readStream.format("table_delta")
              .option("path", str(table)).load())
        assert dict(df.dtypes) == {"id": "bigint", "lines": "string"}


class TestSchemaEvolution:
    """Connect schema evolution (SURVEY §1.4): a later file adds a nullable
    column. A restarted stream binds the WIDENED schema; rows from old
    files surface with nulls in the new column (backward compatibility)."""

    def test_widened_schema_after_restart(self, spark, tmp_path):
        from kafka_connect_streams_spark.sources.python_datasource import (
            register)
        register(spark)
        table, out = tmp_path / "ext", str(tmp_path / "out")
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, lines string") \
            .coalesce(1).write.mode("append").parquet(str(table))
        spark.createDataFrame([(3, "c", 9.5)],
                              "id bigint, lines string, score double") \
            .coalesce(1).write.mode("append").parquet(str(table))

        df = (spark.readStream.format("table_delta")
              .option("path", str(table)).load())
        assert dict(df.dtypes) == {"id": "bigint", "lines": "string",
                                   "score": "double"}
        q = (df.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {r.id: r.score for r in spark.read.parquet(out).collect()}
        assert rows == {1: None, 2: None, 3: 9.5}


class TestPythonDataSink:
    """Native PySpark DataSource streaming sink (S6/S7): executor-side
    Arrow put + driver-side atomic flush with idempotent epoch commit."""

    def test_end_to_end_write_and_read_back(self, spark, tmp_path):
        from kafka_connect_streams_spark.sources.python_datasink import (
            register)
        register(spark)
        src, out = tmp_path / "src", tmp_path / "sink_out"
        out.mkdir()
        spark.createDataFrame(
            [(i, f"w{i}") for i in range(100)], "id bigint, w string") \
            .coalesce(1).write.parquet(str(src))
        q = (spark.readStream
             .schema("id bigint, w string").parquet(str(src))
             .writeStream.format("table_sink")
             .option("path", str(out))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        back = spark.read.parquet(str(out))
        assert back.count() == 100
        assert sorted(r.id for r in back.collect()) == list(range(100))
        # the epoch manifest exists and accounts for every row
        import glob
        import json as js
        manifests = glob.glob(str(out / "_commits" / "*.json"))
        assert manifests
        assert sum(js.load(open(m))["rows"] for m in manifests) == 100

    def test_replayed_epoch_publishes_once(self, tmp_path):
        """commit() for an epoch whose manifest already exists must discard
        the replay's staged files — exactly-once publication."""
        import pyarrow as pa

        from kafka_connect_streams_spark.sources.python_datasink import (
            TableSinkStreamWriter)
        out = tmp_path / "sink"
        out.mkdir()
        w = TableSinkStreamWriter({"path": str(out)})
        batch = pa.RecordBatch.from_pydict({"id": [1, 2, 3]})
        m1 = w.write(iter([batch]))
        w.commit([m1], batchId=7)
        # replay of epoch 7: new staged file, same batchId
        m2 = w.write(iter([batch]))
        w.commit([m2], batchId=7)
        files = [p for p in out.iterdir() if p.suffix == ".parquet"]
        assert len(files) == 1, files
        assert not list((out / "_staging").iterdir())  # replay file dropped

    def test_restart_replays_epoch_exactly_once(self, spark, tmp_path):
        """Kill-and-resume: a NEW query on the SAME checkpoint + manifest dir
        must not publish a replayed epoch twice.

        Deleting the checkpoint's ``commits/0`` marker after the first run
        makes Structured Streaming re-execute batch 0 on restart — the
        cross-process replay that within-run tests can't produce. The sink's
        manifest check (python_datasink.py commit) must discard the replay's
        staged files, and the resumed stream must still publish NEW epochs.
        """
        import glob
        import json as js

        from kafka_connect_streams_spark.sources.python_datasink import (
            register)
        register(spark)
        src, out, ckpt = tmp_path / "src", tmp_path / "sink_out", \
            tmp_path / "ckpt"
        out.mkdir()

        def run_query():
            import time

            q = (spark.readStream
                 .schema("id bigint, w string").parquet(str(src))
                 .writeStream.format("table_sink")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .trigger(availableNow=True).start())
            # availableNow self-terminates; block until it has fully
            # deregistered or the next start() sees a concurrent query
            # on the same checkpoint dir
            q.awaitTermination()
            for _ in range(200):
                if not q.isActive:
                    break
                time.sleep(0.1)

        spark.createDataFrame(
            [(i, f"w{i}") for i in range(50)], "id bigint, w string") \
            .coalesce(1).write.mode("append").parquet(str(src))
        run_query()
        assert spark.read.parquet(str(out)).count() == 50

        # simulate a crash between sink publish and checkpoint commit: the
        # offsets log says batch 0 was planned, but its commit marker is gone
        # (the hidden Hadoop .crc must go too or the replayed commit-log
        # rename fails as a concurrent-modification)
        (ckpt / "commits" / "0").unlink()
        (ckpt / "commits" / ".0.crc").unlink(missing_ok=True)
        run_query()
        back = spark.read.parquet(str(out))
        assert back.count() == 50, "replayed epoch 0 was published twice"
        assert not list((out / "_staging").iterdir()), \
            "replay's staged files were not discarded"
        assert len(glob.glob(str(out / "_commits" / "*.json"))) == 1

        # the resumed stream keeps going: new data -> new epoch, published once
        spark.createDataFrame(
            [(i, f"w{i}") for i in range(50, 100)], "id bigint, w string") \
            .coalesce(1).write.mode("append").parquet(str(src))
        run_query()
        back = spark.read.parquet(str(out))
        assert back.count() == 100
        assert sorted(r.id for r in back.collect()) == list(range(100))
        manifests = glob.glob(str(out / "_commits" / "*.json"))
        assert sum(js.load(open(m))["rows"] for m in manifests) == 100

    def test_abort_cleans_staging(self, tmp_path):
        import pyarrow as pa

        from kafka_connect_streams_spark.sources.python_datasink import (
            TableSinkStreamWriter)
        out = tmp_path / "sink"
        out.mkdir()
        w = TableSinkStreamWriter({"path": str(out)})
        m = w.write(iter([pa.RecordBatch.from_pydict({"id": [1]})]))
        w.abort([m, None], batchId=0)
        assert not list((out / "_staging").iterdir())
        assert not [p for p in out.iterdir() if p.suffix == ".parquet"]
