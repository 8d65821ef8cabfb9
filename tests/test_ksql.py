"""KSQL DDL surface: CREATE STREAM ... WITH, CSAS, ROWKEY/ROWTIME.

Golden behaviors from DatabaseSelectAndProjectIntTest / FIXTURES.md §4:
8-row orders fixture, select-star / projection / filter (>40 → 4 rows),
pseudo-columns, CSAS WITH(timestamp=...) rebinding.
"""

from __future__ import annotations

import pytest

from kafka_connect_streams_spark.sql.ksql import KsqlContext


@pytest.fixture()
def ctx(spark):
    # the 8-row golden orders fixture (SimpleOrderDataProvider.java:33-41)
    orders = spark.createDataFrame(
        [(i, i, f"ORDER_{i}", f"ITEM_{i}", i * 10.0) for i in range(1, 9)],
        "id bigint, ordertime bigint, orderid string, itemid string, orderunits double")
    return KsqlContext(spark, resolver=lambda topic: {"orders_topic": orders}[topic])


DDL = """CREATE STREAM orders (ORDERTIME bigint, ORDERID varchar,
         ITEMID varchar, ORDERUNITS double)
         WITH (kafka_topic='orders_topic', value_format='JSON', key='ordertime')"""


class TestCreateTable:
    """KSQL stream/table duality: CREATE TABLE over a changelog topic keeps
    each key's latest row; CREATE STREAM keeps every record."""

    @pytest.fixture()
    def changelog_ctx(self, spark):
        # three versions of key "u1", two of "u2" — ordered by rowtime
        rows = [("u1", 1_000, 10.0), ("u1", 3_000, 30.0), ("u2", 1_500, 15.0),
                ("u1", 2_000, 20.0), ("u2", 2_500, 25.0)]
        log = spark.createDataFrame(
            rows, "userid string, ordertime bigint, balance double")
        return KsqlContext(
            spark, resolver=lambda topic: {"users_topic": log}[topic])

    TDDL = """CREATE TABLE users (USERID varchar, ORDERTIME bigint,
              BALANCE double)
              WITH (kafka_topic='users_topic', value_format='JSON',
                    key='userid', timestamp='ordertime')"""

    def test_table_compacts_to_latest_per_key(self, changelog_ctx, spark):
        changelog_ctx.sql(self.TDDL)
        rows = {r.userid: r.balance
                for r in spark.sql("SELECT userid, balance FROM users")
                .collect()}
        assert rows == {"u1": 30.0, "u2": 25.0}

    def test_stream_over_same_topic_keeps_all_rows(self, changelog_ctx,
                                                   spark):
        changelog_ctx.sql(self.TDDL.replace("CREATE TABLE users",
                                            "CREATE STREAM users_s"))
        assert spark.sql("SELECT * FROM users_s").count() == 5

    def test_stream_table_join_for_free(self, changelog_ctx, spark):
        """SURVEY §2.3: stream-table joins need no dedicated operator —
        registered views compose through spark.sql. Each stream record
        picks up its key's LATEST table value."""
        changelog_ctx.sql(self.TDDL)
        changelog_ctx.sql(self.TDDL
                          .replace("CREATE TABLE users", "CREATE STREAM evts"))
        rows = changelog_ctx.sql(
            "SELECT e.ordertime, e.balance AS seen, t.balance AS latest "
            "FROM evts e JOIN users t ON e.rowkey = t.rowkey "
            "WHERE e.rowkey = 'u1' ORDER BY e.ordertime").collect()
        assert [(r.seen, r.latest) for r in rows] == [
            (10.0, 30.0), (20.0, 30.0), (30.0, 30.0)]

    def test_table_without_key_is_rejected(self, changelog_ctx):
        bad = """CREATE TABLE nokey (USERID varchar, ORDERTIME bigint)
                 WITH (kafka_topic='users_topic', value_format='JSON')"""
        with pytest.raises(ValueError, match="KEY"):
            changelog_ctx.sql(bad)


class TestCreateStream:
    def test_registers_view_with_pseudo_columns(self, ctx, spark):
        ctx.sql(DDL)
        rows = spark.sql("SELECT rowkey, ordertime, orderid FROM orders").collect()
        assert len(rows) == 8
        # ROWKEY = designated key column, stringified (§1.4)
        assert {r.rowkey for r in rows} == {str(i) for i in range(1, 9)}
        assert ctx.metastore["orders"].value_format == "json"

    def test_select_star(self, ctx, spark):
        ctx.sql(DDL)
        assert ctx.sql("SELECT * FROM orders").count() == 8

    def test_projection(self, ctx, spark):
        ctx.sql(DDL)
        rows = ctx.sql("SELECT itemid, orderunits FROM orders").collect()
        assert len(rows) == 8
        assert rows[0].__fields__ == ["itemid", "orderunits"]

    def test_filter_cardinality(self, ctx):
        # testSelectWithFilter: ORDERUNITS > 40 → exactly 4 rows (:247-266)
        ctx.sql(DDL)
        assert ctx.sql("SELECT * FROM orders WHERE orderunits > 40").count() == 4


class TestCsas:
    def test_csas_materializes_and_requeries(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE STREAM bigorders AS SELECT * FROM orders WHERE orderunits > 40")
        assert spark.sql("SELECT * FROM bigorders").count() == 4
        assert "bigorders" in ctx.metastore

    def test_csas_with_timestamp_rebind(self, ctx, spark):
        # WITH (timestamp='rtime'): output stream's event time from a
        # computed column (StreamsSelectAndProjectIntTest.java:174-208, F10)
        ctx.sql(DDL)
        ctx.sql("""CREATE STREAM ts_stream WITH (timestamp='rtime') AS
                   SELECT rowkey AS rkey, rowtime + 10000 AS rtime,
                          rowtime + 100 AS rt100, orderid, itemid
                   FROM orders WHERE orderunits > 20 AND itemid = 'ITEM_8'""")
        rows = spark.sql("SELECT * FROM ts_stream").collect()
        assert len(rows) == 1
        assert rows[0].rkey == "8"
        assert rows[0].rowtime == rows[0].rtime

    def test_projection_aliases(self, ctx, spark):
        # SELECT ROWKEY AS RKEY, ROWTIME AS RTIME (:217-219)
        ctx.sql(DDL)
        ctx.sql("""CREATE STREAM aliased AS
                   SELECT rowkey AS rkey, rowtime AS rtime, itemid
                   FROM orders WHERE orderunits > 20 AND itemid = 'ITEM_8'""")
        rows = spark.sql("SELECT rkey, rtime, itemid FROM aliased").collect()
        assert len(rows) == 1 and rows[0].itemid == "ITEM_8"


class TestPassthroughSql:
    def test_non_ddl_goes_to_spark_sql(self, ctx):
        assert ctx.sql("SELECT 1 AS x").collect()[0].x == 1


class TestWindowedAggregates:
    """KSQL WINDOW TUMBLING/HOPPING/SESSION clauses → native Spark
    window()/session_window() grouping (KSQL 5.1 windowed-aggregate
    surface). rowtime binds to ordertime (epoch-ms) via WITH(timestamp=...):
    rows land at 1..8 ms, so a 5 ms tumble splits them [0,5)={1..4},
    [5,10)={5..8}."""

    WDDL = """CREATE STREAM orders (ORDERTIME bigint, ORDERID varchar,
              ITEMID varchar, ORDERUNITS double)
              WITH (kafka_topic='orders_topic', value_format='JSON',
                    key='ordertime', timestamp='ordertime')"""

    def test_tumbling_counts(self, ctx, spark):
        ctx.sql(self.WDDL)
        rows = ctx.sql(
            "SELECT WINDOWSTART AS wstart, count(*) AS n FROM orders "
            "WINDOW TUMBLING (SIZE 5 MILLISECONDS) GROUP BY 1"
        ).collect()
        # GROUP BY 1 == the injected window expr; two buckets of 4
        assert sorted(r.n for r in rows) == [4, 4]

    def test_tumbling_with_key(self, ctx, spark):
        ctx.sql(self.WDDL)
        rows = ctx.sql(
            "SELECT itemid, count(*) AS n FROM orders "
            "WINDOW TUMBLING (SIZE 5 MILLISECONDS) GROUP BY itemid"
        ).collect()
        assert len(rows) == 8 and all(r.n == 1 for r in rows)

    def test_hopping_overlap(self, ctx, spark):
        ctx.sql(self.WDDL)
        rows = ctx.sql(
            "SELECT WINDOWSTART AS wstart, count(*) AS n FROM orders "
            "WINDOW HOPPING (SIZE 4 MILLISECONDS, ADVANCE BY 2 MILLISECONDS) "
            "GROUP BY 1"
        ).collect()
        # every row falls in exactly 2 hops → total count doubles
        assert sum(r.n for r in rows) == 16

    def test_session_single_burst(self, ctx, spark):
        ctx.sql(self.WDDL)
        rows = ctx.sql(
            "SELECT count(*) AS n FROM orders "
            "WINDOW SESSION (10 MILLISECONDS)"
        ).collect()
        # gaps are 1 ms < 10 ms: one session holding all 8 rows
        assert [r.n for r in rows] == [8]

    def test_window_without_group_by_before_order_limit(self, ctx, spark):
        """The injected GROUP BY must precede a trailing ORDER BY/LIMIT."""
        ctx.sql(self.WDDL)
        rows = ctx.sql(
            "SELECT WINDOWSTART AS wstart, count(*) AS n FROM orders "
            "WINDOW TUMBLING (SIZE 5 MILLISECONDS) "
            "ORDER BY wstart LIMIT 1"
        ).collect()
        assert len(rows) == 1 and rows[0].n == 4

    def test_window_rewrite_tolerates_trailing_semicolon(self, ctx, spark):
        """KSQL statements conventionally end with ';' — the injected GROUP
        BY must land before it, not after (and spark.sql must never see the
        terminator)."""
        ctx.sql(self.WDDL + ";")
        rows = ctx.sql(
            "SELECT WINDOWSTART AS wstart, count(*) AS n FROM orders "
            "WINDOW TUMBLING (SIZE 5 MILLISECONDS);"
        ).collect()
        assert sorted(r.n for r in rows) == [4, 4]

    def test_csas_with_window(self, ctx, spark):
        ctx.sql(self.WDDL)
        ctx.sql(
            "CREATE TABLE counts_by_window AS "
            "SELECT WINDOWSTART AS wstart, WINDOWEND AS wend, count(*) AS n "
            "FROM orders WINDOW TUMBLING (SIZE 5 MILLISECONDS) GROUP BY 1, 2")
        rows = spark.sql("SELECT * FROM counts_by_window").collect()
        assert sorted(r.n for r in rows) == [4, 4]


class TestStreamingWindowedKsql:
    """The WINDOW rewrite must hold on a STREAMING relation too: the same
    DDL + windowed SELECT over a readStream-backed topic plans as a native
    streaming windowed aggregate and emits the tumbling counts."""

    def test_tumbling_over_stream(self, spark, tmp_path):
        import json as js
        sdir = tmp_path / "orders_stream"
        sdir.mkdir()
        with open(sdir / "part-0.json", "w") as f:
            for i in range(1, 9):
                f.write(js.dumps({"ordertime": i, "orderid": f"ORDER_{i}",
                                  "itemid": f"ITEM_{i}",
                                  "orderunits": i * 10.0}) + "\n")
        stream = (spark.readStream
                  .schema("ordertime bigint, orderid string, itemid string, "
                          "orderunits double")
                  .json(str(sdir)))
        ctx = KsqlContext(spark, resolver=lambda t: stream)
        ctx.sql("""CREATE STREAM orders_s (ORDERTIME bigint, ORDERID varchar,
                   ITEMID varchar, ORDERUNITS double)
                   WITH (kafka_topic='orders_topic', value_format='JSON',
                         key='ordertime', timestamp='ordertime')""")
        windowed = ctx.sql(
            "SELECT WINDOWSTART AS wstart, count(*) AS n FROM orders_s "
            "WINDOW TUMBLING (SIZE 5 MILLISECONDS) GROUP BY 1")
        assert windowed.isStreaming
        q = (windowed.writeStream.format("memory")
             .queryName("ksql_windowed_stream").outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT n FROM ksql_windowed_stream ORDER BY n").collect()
        assert [r.n for r in rows] == [4, 4]


class TestStreamingKsqlTable:
    """Stream/table duality on a LIVE stream: CREATE TABLE over a
    readStream-backed changelog plans as a streaming max_by aggregate and,
    in update mode, converges to each key's latest row."""

    def test_table_compaction_over_stream(self, spark, tmp_path):
        import json as js
        sdir = tmp_path / "users_stream"
        sdir.mkdir()
        rows = [("u1", 1_000, 10.0), ("u1", 3_000, 30.0), ("u2", 1_500, 15.0),
                ("u1", 2_000, 20.0), ("u2", 2_500, 25.0)]
        with open(sdir / "part-0.json", "w") as f:
            for uid, ts, bal in rows:
                f.write(js.dumps({"userid": uid, "ordertime": ts,
                                  "balance": bal}) + "\n")
        stream = (spark.readStream
                  .schema("userid string, ordertime bigint, balance double")
                  .json(str(sdir)))
        ctx = KsqlContext(spark, resolver=lambda t: stream)
        table = None
        ctx.sql("""CREATE TABLE users_t (USERID varchar, ORDERTIME bigint,
                   BALANCE double)
                   WITH (kafka_topic='users_topic', value_format='JSON',
                         key='userid', timestamp='ordertime')""")
        table = spark.sql("SELECT userid, balance FROM users_t")
        assert table.isStreaming
        q = (table.writeStream.format("memory").queryName("ksql_table_live")
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "ckpt_t"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r.userid: r.balance for r in
               spark.sql("SELECT * FROM ksql_table_live").collect()}
        assert got == {"u1": 30.0, "u2": 25.0}


class TestCtasAndPartitionBy:
    """KSQL 5.1 CTAS + PARTITION BY surface: CREATE TABLE AS must carry
    table semantics (aggregation or TABLE source), and PARTITION BY re-keys
    the CSAS result's ROWKEY — the declarative spelling of selectKey (P4)."""

    def test_ctas_from_aggregate(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE TABLE order_counts AS "
                "SELECT itemid, count(*) AS n, sum(orderunits) AS units "
                "FROM orders GROUP BY itemid")
        assert ctx.metastore["order_counts"].kind == "table"
        rows = {r.itemid: r.n
                for r in spark.sql("SELECT * FROM order_counts").collect()}
        assert len(rows) == 8 and all(n == 1 for n in rows.values())

    def test_ctas_from_plain_stream_select_rejected(self, ctx):
        ctx.sql(DDL)
        with pytest.raises(ValueError, match="GROUP BY aggregation"):
            ctx.sql("CREATE TABLE bad AS SELECT * FROM orders")

    def test_ctas_from_table_source_is_allowed(self, spark):
        rows = [("u1", 1_000, 10.0), ("u1", 3_000, 30.0), ("u2", 1_500, 15.0)]
        log = spark.createDataFrame(
            rows, "userid string, ordertime bigint, balance double")
        ctx = KsqlContext(spark, resolver=lambda t: log)
        ctx.sql("""CREATE TABLE users (USERID varchar, ORDERTIME bigint,
                   BALANCE double)
                   WITH (kafka_topic='users_topic', value_format='JSON',
                         key='userid', timestamp='ordertime')""")
        # projecting a TABLE keeps table-ness without a GROUP BY
        ctx.sql("CREATE TABLE rich_users AS "
                "SELECT userid, balance FROM users WHERE balance > 12")
        assert ctx.metastore["rich_users"].kind == "table"
        got = {r.userid: r.balance
               for r in spark.sql("SELECT * FROM rich_users").collect()}
        assert got == {"u1": 30.0, "u2": 15.0}

    def test_partition_by_rekeys_rowkey(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE STREAM by_item AS SELECT rowkey, itemid, orderunits "
                "FROM orders PARTITION BY itemid")
        meta = ctx.metastore["by_item"]
        assert meta.kind == "stream" and meta.key_col == "itemid"
        rows = spark.sql("SELECT rowkey, itemid FROM by_item").collect()
        assert len(rows) == 8
        # ROWKEY is rebound to the PARTITION BY column, stringified
        assert all(r.rowkey == r.itemid for r in rows)


class TestBadDataSkip:
    """Reference StreamsSelectAndProjectIntTest.java:151-166: records whose
    value is not parseable JSON must be SKIPPED by the converter chain, not
    fail the query. The engine-side contract is decode_records (kafka.py):
    PERMISSIVE from_json maps malformed bytes to an all-null struct, and the
    all-null filter drops them before the KSQL relation ever sees a row."""

    SCHEMA = ("ordertime bigint, orderid string, itemid string, "
              "orderunits double")

    def test_corrupt_records_skipped_on_live_leg(self, spark, tmp_path):
        import json as js

        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records

        broker = fb.FileBroker(str(tmp_path / "broker"))
        broker.create_topic("orders_topic", partitions=2)
        p = broker.producer()
        for i in range(1, 9):
            p.send("orders_topic",
                   js.dumps({"ordertime": i, "orderid": f"ORDER_{i}",
                             "itemid": f"ITEM_{i}", "orderunits": i * 10.0}),
                   key=str(i), timestamp_ms=1_700_000_000_000 + i)
            # interleave corruption after every good record: plain text, a
            # truncated object, and raw non-UTF8 bytes
            p.send("orders_topic", "this is not json",
                   key=f"bad-{i}", timestamp_ms=1_700_000_000_000 + i)
        p.send("orders_topic", '{"ordertime": 99, "orderid":',
               timestamp_ms=1_700_000_000_100)
        p.send("orders_topic", b"\x00\x01\xfe garbage",
               timestamp_ms=1_700_000_000_101)
        p.flush()

        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root)
               .option("subscribe", "orders_topic").load())
        decoded = decode_records(
            raw, _parse_datatype_string(self.SCHEMA))
        ctx = KsqlContext(spark, resolver=lambda t: decoded)
        ctx.sql("""CREATE STREAM orders_b (ORDERTIME bigint, ORDERID varchar,
                   ITEMID varchar, ORDERUNITS double)
                   WITH (kafka_topic='orders_topic', value_format='JSON',
                         key='ordertime')""")
        out = ctx.sql("SELECT orderid, orderunits FROM orders_b "
                      "WHERE orderunits > 40")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("bad_data_skip")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None, "corrupt records must not fail the query"
        rows = spark.sql("SELECT * FROM bad_data_skip ORDER BY orderunits") \
            .collect()
        # the reference filter golden: ORDERUNITS > 40 -> exactly 4 rows,
        # every corrupt record silently dropped
        assert [(r.orderid, r.orderunits) for r in rows] == [
            (f"ORDER_{i}", i * 10.0) for i in (5, 6, 7, 8)]


class TestArrayMapColumns:
    """FIXTURES.md §5 / OrderDataProvider.java:32-43: the orders_full fixture
    with PRICEARRAY array<double> and KEYVALUEMAP map<varchar,double>."""

    @pytest.fixture()
    def full_ctx(self, spark):
        kv = {"key1": 1.0, "key2": 2.0, "key3": 3.0}
        rows = [(i, f"ORDER_{min(i, 6)}", f"ITEM_{i}", i * 10.0,
                 [100.0 * i, 110.99, 90.0], kv) for i in range(1, 9)]
        orders = spark.createDataFrame(
            rows, "ordertime bigint, orderid string, itemid string, "
                  "orderunits double, pricearray array<double>, "
                  "keyvaluemap map<string,double>")
        ctx = KsqlContext(spark, resolver=lambda t: orders)
        ctx.sql("""CREATE STREAM orders_full (ORDERTIME bigint, ORDERID varchar,
                   ITEMID varchar, ORDERUNITS double,
                   PRICEARRAY array<double>,
                   KEYVALUEMAP map<varchar,double>)
                   WITH (kafka_topic='orders_topic', value_format='AVRO',
                         key='ordertime')""")
        return ctx

    def test_ddl_parses_nested_types(self, full_ctx):
        meta = full_ctx.metastore["orders_full"]
        assert meta.columns["pricearray"] == "array<double>"
        assert meta.columns["keyvaluemap"] == "map<string,double>"

    def test_array_projection(self, full_ctx):
        # SELECT ITEMID, ORDERUNITS, PRICEARRAY (StreamsSelectAndProjectIntTest.java:242-263)
        rows = full_ctx.sql(
            "SELECT itemid, orderunits, pricearray FROM orders_full").collect()
        assert len(rows) == 8
        assert rows[0].pricearray[1] == 110.99

    def test_map_access_and_array_index(self, full_ctx):
        rows = full_ctx.sql("""
            SELECT itemid, pricearray[0] AS p0, keyvaluemap['key2'] AS k2
            FROM orders_full WHERE orderunits > 70""").collect()
        assert len(rows) == 1
        assert rows[0].p0 == 800.0 and rows[0].k2 == 2.0

    def test_csas_format_conversion(self, full_ctx, spark):
        # CSAS WITH (value_format='JSON') from an AVRO-format stream (F11)
        full_ctx.sql("""CREATE STREAM json_out WITH (value_format='JSON') AS
                        SELECT itemid, orderunits, pricearray FROM orders_full
                        WHERE orderunits > 20 AND itemid = 'ITEM_8'""")
        assert full_ctx.metastore["json_out"].value_format == "json"
        assert spark.sql("SELECT * FROM json_out").count() == 1


class TestInsertInto:
    """KSQL ``INSERT INTO``: a second persistent query feeding an existing
    stream — the target becomes the union of its legs. Tables refuse
    inserts (they are compacted changelogs), and leg schemas must match."""

    def test_insert_unions_legs(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("""CREATE STREAM big AS
                   SELECT itemid, orderunits FROM orders
                   WHERE orderunits > 60""")
        assert spark.sql("SELECT * FROM big").count() == 2  # 70, 80
        ctx.sql("""INSERT INTO big
                   SELECT itemid, orderunits FROM orders
                   WHERE orderunits < 30;""")
        rows = {(r.itemid, r.orderunits)
                for r in spark.sql("SELECT * FROM big").collect()}
        assert rows == {("ITEM_7", 70.0), ("ITEM_8", 80.0),
                        ("ITEM_1", 10.0), ("ITEM_2", 20.0)}
        # a third leg composes with the union-of-two
        ctx.sql("INSERT INTO big SELECT itemid, orderunits FROM orders "
                "WHERE orderunits = 40")
        assert spark.sql("SELECT * FROM big").count() == 5

    def test_insert_into_unknown_or_table_rejected(self, ctx, spark):
        ctx.sql(DDL)
        with pytest.raises(ValueError, match="unknown stream"):
            ctx.sql("INSERT INTO nope SELECT * FROM orders")
        ctx.sql("""CREATE TABLE counts AS
                   SELECT itemid, count(*) AS n FROM orders GROUP BY itemid""")
        with pytest.raises(ValueError, match="TABLE"):
            ctx.sql("INSERT INTO counts SELECT itemid, count(*) AS n "
                    "FROM orders GROUP BY itemid")

    def test_insert_schema_mismatch_rejected(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE STREAM two AS SELECT itemid, orderunits FROM orders")
        with pytest.raises(ValueError, match="do not match"):
            ctx.sql("INSERT INTO two SELECT itemid FROM orders")


class TestInsertIntoStreaming:
    """INSERT INTO over a LIVE leg: both legs are streaming relations; the
    union target stays streaming and drains both legs' rows."""

    def test_streaming_union_of_two_legs(self, spark, tmp_path):
        import json as js
        sdir = tmp_path / "orders_stream"
        sdir.mkdir()
        with open(sdir / "part-0.json", "w") as f:
            for i in range(1, 9):
                f.write(js.dumps({"ordertime": i, "orderid": f"ORDER_{i}",
                                  "itemid": f"ITEM_{i}",
                                  "orderunits": i * 10.0}) + "\n")
        stream = (spark.readStream
                  .schema("ordertime bigint, orderid string, itemid string, "
                          "orderunits double")
                  .json(str(sdir)))
        ctx = KsqlContext(spark, resolver=lambda t: stream)
        ctx.sql("""CREATE STREAM orders_s (ORDERTIME bigint, ORDERID varchar,
                   ITEMID varchar, ORDERUNITS double)
                   WITH (kafka_topic='orders_topic', value_format='JSON',
                         key='ordertime', timestamp='ordertime')""")
        ctx.sql("CREATE STREAM extremes AS "
                "SELECT itemid, orderunits FROM orders_s "
                "WHERE orderunits > 70")
        out = ctx.sql("INSERT INTO extremes "
                      "SELECT itemid, orderunits FROM orders_s "
                      "WHERE orderunits < 20")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("ksql_insert_live")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {(r.itemid, r.orderunits) for r in
                spark.sql("SELECT * FROM ksql_insert_live").collect()}
        assert rows == {("ITEM_8", 80.0), ("ITEM_1", 10.0)}


class TestDropShowDescribe:
    """KSQL catalog statements: DROP STREAM/TABLE (kind-checked, IF EXISTS),
    SHOW STREAMS/TABLES listings, DESCRIBE with pseudo-columns."""

    def test_show_and_describe(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE STREAM big AS SELECT itemid, orderunits FROM orders "
                "WHERE orderunits > 60")
        ctx.sql("""CREATE TABLE counts AS
                   SELECT itemid, count(*) AS n FROM orders GROUP BY itemid""")
        streams = {r.name for r in ctx.sql("SHOW STREAMS").collect()}
        assert streams == {"orders", "big"}
        tables = {r.name for r in ctx.sql("SHOW TABLES;").collect()}
        assert tables == {"counts"}
        fields = {r.field: r.type for r in ctx.sql("DESCRIBE orders").collect()}
        assert fields["orderunits"] == "double"
        assert "rowkey" in fields and "rowtime" in fields

    def test_drop_kind_checked_and_if_exists(self, ctx, spark):
        ctx.sql(DDL)
        ctx.sql("CREATE STREAM doomed AS SELECT itemid FROM orders")
        with pytest.raises(ValueError, match="use DROP STREAM"):
            ctx.sql("DROP TABLE doomed")
        ctx.sql("DROP STREAM doomed")
        assert "doomed" not in {r.name for r in
                                ctx.sql("SHOW STREAMS").collect()}
        with pytest.raises(ValueError, match="unknown relation"):
            ctx.sql("DROP STREAM doomed")
        ctx.sql("DROP STREAM IF EXISTS doomed")  # no raise
        with pytest.raises(Exception):
            spark.sql("SELECT * FROM doomed")  # view gone from the catalog


class TestJoinWithin:
    """KSQL 5.1 stream-stream join window: ``s1 JOIN s2 WITHIN n UNIT ON``
    pairs rows iff |rowtime_l − rowtime_r| ≤ window. The rewriter turns the
    clause into a time-bounded ON over the epoch-ms rowtime pseudo-columns;
    goldens mirror the ±10s pairs of AbstractJoinIntegrationTest (reference
    src/test: explicit ``++ts`` production driving window membership)."""

    @pytest.fixture()
    def join_ctx(self, spark):
        left = spark.createDataFrame(
            [("k1", 1_000, "L1"), ("k1", 15_000, "L2"), ("k2", 2_000, "L3")],
            "k string, ordertime bigint, lv string")
        right = spark.createDataFrame(
            [("k1", 5_000, "R1"), ("k1", 30_000, "R2"), ("k2", 11_000, "R3"),
             ("k3", 2_000, "R4")],
            "k string, ordertime bigint, rv string")
        return KsqlContext(spark, resolver=lambda topic: {
            "left_topic": left, "right_topic": right}[topic])

    LDDL = """CREATE STREAM l (K varchar, ORDERTIME bigint, LV varchar)
              WITH (kafka_topic='left_topic', value_format='JSON',
                    key='k', timestamp='ordertime')"""
    RDDL = """CREATE STREAM r (K varchar, ORDERTIME bigint, RV varchar)
              WITH (kafka_topic='right_topic', value_format='JSON',
                    key='k', timestamp='ordertime')"""

    def test_within_bounds_the_pairs(self, join_ctx):
        join_ctx.sql(self.LDDL)
        join_ctx.sql(self.RDDL)
        out = join_ctx.sql(
            "SELECT a.lv, b.rv FROM l a JOIN r b "
            "WITHIN 10 SECONDS ON a.k = b.k")
        got = sorted((r.lv, r.rv) for r in out.collect())
        # |Δt|≤10s: L1(1s)↔R1(5s); L2(15s)↔R1(5s) at exactly 10s — inclusive;
        # L3(2s,k2)↔R3(11s) at 9s; L2↔R2(30s) is 15s out; k3 never matches
        assert got == [("L1", "R1"), ("L2", "R1"), ("L3", "R3")]

    def test_within_left_join_pads_unmatched(self, join_ctx):
        join_ctx.sql(self.LDDL)
        join_ctx.sql(self.RDDL)
        out = join_ctx.sql(
            "SELECT a.lv, b.rv FROM l a LEFT OUTER JOIN r b "
            "WITHIN 2 SECONDS ON a.k = b.k")
        got = sorted(((r.lv, r.rv) for r in out.collect()),
                     key=lambda t: (t[0], t[1] or ""))
        # only L3↔R3 is 9s apart > 2s → everything unmatched except none;
        # at ±2s: L1↔R1 is 4s out, so ALL left rows pad with NULL
        assert got == [("L1", None), ("L2", None), ("L3", None)]

    def test_csas_with_within(self, join_ctx, spark):
        join_ctx.sql(self.LDDL)
        join_ctx.sql(self.RDDL)
        join_ctx.sql(
            "CREATE STREAM joined AS SELECT a.k, a.lv, b.rv FROM l a "
            "JOIN r b WITHIN 10 SECONDS ON a.k = b.k")
        assert spark.sql("SELECT count(*) AS n FROM joined").first().n == 3

    def test_within_asymmetric_before_after(self, join_ctx):
        """``WITHIN (before, after)``: the right row may lag the left by up
        to `before` or lead it by up to `after` — t_r ∈ [t_l−b, t_l+a]."""
        join_ctx.sql(self.LDDL)
        join_ctx.sql(self.RDDL)
        out = join_ctx.sql(
            "SELECT a.lv, b.rv FROM l a JOIN r b "
            "WITHIN (10 SECONDS, 0 SECONDS) ON a.k = b.k")
        got = sorted((r.lv, r.rv) for r in out.collect())
        # only rights at-or-before each left within 10s:
        # L2(15s)↔R1(5s) lagging 10s — inclusive; L1(1s)↔R1(5s) LEADS → out;
        # L3(2s,k2)↔R3(11s) leads by 9s → out
        assert got == [("L2", "R1")]


    def test_within_on_live_streaming_legs(self, spark, tmp_path):
        """The WITHIN rewrite must compose with live streaming relations:
        two filebroker topics, window-bounded pairs out (inclusive 10s
        edge, outside-window row excluded). Both legs are streaming, so
        the rewrite also binds the window on the watermarked rowtime_ts
        columns — join state is watermark-evicted (see the companion
        eviction test below)."""
        import json as js

        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records

        broker = fb.FileBroker(str(tmp_path / "b"))
        for t in ("l_top", "r_top"):
            broker.create_topic(t, partitions=1)
        p = broker.producer()
        base = 1_700_000_000_000
        for t, k, off, v in [("l_top", "k1", 1_000, "L1"),
                             ("l_top", "k1", 15_000, "L2"),
                             ("r_top", "k1", 5_000, "R1"),
                             ("r_top", "k1", 30_000, "R2")]:
            p.send(t, js.dumps({"k": k, "ordertime": base + off, "v": v}),
                   key=k, timestamp_ms=base + off)
        p.flush()
        fb.register(spark)

        def leg(topic):
            raw = (spark.readStream.format("filebroker")
                   .option("path", broker.root)
                   .option("subscribe", topic).load())
            return decode_records(raw, _parse_datatype_string(
                "k string, ordertime bigint, v string"))

        frames = {"l_top": leg("l_top"), "r_top": leg("r_top")}
        ctx = KsqlContext(spark, resolver=lambda t: frames[t])
        ddl = ("CREATE STREAM {n} (K varchar, ORDERTIME bigint, V varchar) "
               "WITH (kafka_topic='{t}', value_format='JSON', key='k', "
               "timestamp='ordertime')")
        ctx.sql(ddl.format(n="l", t="l_top"))
        ctx.sql(ddl.format(n="r", t="r_top"))
        out = ctx.sql("SELECT a.v AS lv, b.v AS rv FROM l a JOIN r b "
                      "WITHIN 10 SECONDS ON a.k = b.k")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("within_live")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None
        rows = sorted((r.lv, r.rv) for r in
                      spark.sql("SELECT * FROM within_live").collect())
        assert rows == [("L1", "R1"), ("L2", "R1")]

    def test_within_live_legs_evict_state_by_watermark(self, spark,
                                                       tmp_path):
        """JOIN ... WITHIN over two LIVE legs must run with BOUNDED state:
        the rewrite binds the window on the watermarked rowtime_ts
        pseudo-columns, so Spark evicts join-state rows once the watermark
        passes their window — the reference's JoinWindows.of + retention
        contract (StreamStreamJoinIntegrationTest.java:82). Without the
        event-time bound the state grows forever and a 24x7 topology OOMs.
        Asserts BOTH the golden pairs and that state rows are dropped
        after far-future events drag the watermark forward."""
        import json as js

        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records

        broker = fb.FileBroker(str(tmp_path / "b"))
        for t in ("le_top", "re_top"):
            broker.create_topic(t, partitions=1)
        p = broker.producer()
        base = 1_700_000_000_000

        def feed(rows):
            for t, k, off, v in rows:
                p.send(t, js.dumps({"k": k, "ordertime": base + off,
                                    "v": v}),
                       key=k, timestamp_ms=base + off)
            p.flush()

        feed([("le_top", "k1", 1_000, "L1"),
              ("re_top", "k1", 5_000, "R1")])
        fb.register(spark)

        def leg(topic):
            raw = (spark.readStream.format("filebroker")
                   .option("path", broker.root)
                   .option("subscribe", topic).load())
            return decode_records(raw, _parse_datatype_string(
                "k string, ordertime bigint, v string"))

        frames = {"le_top": leg("le_top"), "re_top": leg("re_top")}
        ctx = KsqlContext(spark, resolver=lambda t: frames[t])
        ddl = ("CREATE STREAM {n} (K varchar, ORDERTIME bigint, V varchar) "
               "WITH (kafka_topic='{t}', value_format='JSON', key='k', "
               "timestamp='ordertime', watermark='5 seconds')")
        ctx.sql(ddl.format(n="le", t="le_top"))
        ctx.sql(ddl.format(n="re", t="re_top"))
        out = ctx.sql("SELECT a.v AS lv, b.v AS rv FROM le a JOIN re b "
                      "WITHIN 10 SECONDS ON a.k = b.k")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("within_evict")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck")).start())
        try:
            q.processAllAvailable()
            p1 = q.lastProgress
            held = p1["stateOperators"][0]["numRowsTotal"]
            assert held >= 2        # L1 and R1 buffered in the join state
            # events far past L1/R1's window drag the watermark forward;
            # a second empty-ish batch applies the new watermark
            feed([("le_top", "k2", 600_000, "L9"),
                  ("re_top", "k2", 601_000, "R9")])
            q.processAllAvailable()
            feed([("le_top", "k3", 900_000, "LA"),
                  ("re_top", "k3", 901_000, "RA")])
            q.processAllAvailable()
            prog = q.lastProgress
            rows_now = prog["stateOperators"][0]["numRowsTotal"]
            removed = prog["stateOperators"][0]["numRowsRemoved"]
            got = sorted((r.lv, r.rv) for r in
                         spark.sql("SELECT * FROM within_evict").collect())
        finally:
            q.stop()
        assert ("L1", "R1") in got           # golden pair unharmed
        assert removed > 0 or rows_now < held + 4, (
            f"join state never evicted: held={held}, now={rows_now}, "
            f"removed={removed}")
        # L1/R1 (t=1s..5s) are far past watermark (~900s-5s): gone
        assert rows_now <= 4, f"stale state retained: {prog['stateOperators'][0]}"



class TestStreamTableJoin:
    """KSQL 5.1 stream-table join: a LIVE stream enriched against a CTAS
    TABLE. The table side is broadcast (map-side hash join per
    micro-batch, stream never shuffled); table state is re-read per
    trigger — the KTable lookup-at-processing-time contract. KSQL shape
    rules enforced: stream on the left; INNER/LEFT only."""

    def _ctx_with_live_stream(self, spark, tmp_path):
        import json as js

        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        broker = fb.FileBroker(str(tmp_path / "b"))
        broker.create_topic("orders_top", partitions=1)
        p = broker.producer()
        base = 1_700_000_000_000
        for k, off, v in [("u1", 1_000, "o1"), ("u2", 2_000, "o2"),
                          ("u3", 3_000, "o3")]:
            p.send("orders_top",
                   js.dumps({"k": k, "ordertime": base + off, "v": v}),
                   key=k, timestamp_ms=base + off)
        p.flush()
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root)
               .option("subscribe", "orders_top").load())
        live = decode_records(raw, _parse_datatype_string(
            "k string, ordertime bigint, v string"))
        users = spark.createDataFrame(
            [("u1", "alice"), ("u2", "bob"), ("u9", "zoe")],
            "k string, name string")
        frames = {"orders_top": live, "users_top": users}
        ctx = KsqlContext(spark, resolver=lambda t: frames[t])
        ctx.sql("CREATE STREAM orders_s (K varchar, ORDERTIME bigint, "
                "V varchar) WITH (kafka_topic='orders_top', "
                "value_format='JSON', key='k', timestamp='ordertime', "
                "watermark='5 seconds');")
        ctx.sql("CREATE STREAM users_raw (K varchar, NAME varchar) "
                "WITH (kafka_topic='users_top', value_format='JSON');")
        ctx.sql("CREATE TABLE users AS SELECT k, max(name) AS name "
                "FROM users_raw GROUP BY k;")
        return ctx

    def test_live_stream_joins_ctas_table(self, spark, tmp_path):
        ctx = self._ctx_with_live_stream(spark, tmp_path)
        out = ctx.sql("SELECT o.v AS order_v, u.name AS user_name "
                      "FROM orders_s o JOIN users u ON o.k = u.k")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("st_join")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None
        rows = sorted((r.order_v, r.user_name) for r in
                      spark.sql("SELECT * FROM st_join").collect())
        # inner: u3 has no dimension row, u9 has no orders
        assert rows == [("o1", "alice"), ("o2", "bob")]

    def test_left_join_pads_missing_dimension(self, spark, tmp_path):
        ctx = self._ctx_with_live_stream(spark, tmp_path)
        out = ctx.sql("SELECT o.v AS order_v, u.name AS user_name "
                      "FROM orders_s o LEFT JOIN users u ON o.k = u.k")
        q = (out.writeStream.format("memory").queryName("st_left")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None
        rows = sorted(((r.order_v, r.user_name) for r in
                       spark.sql("SELECT * FROM st_left").collect()),
                      key=str)
        assert rows == [("o1", "alice"), ("o2", "bob"), ("o3", None)]

    def test_broadcast_hint_injected_and_shape_rules(self, spark, tmp_path):
        import pytest as _pytest
        ctx = self._ctx_with_live_stream(spark, tmp_path)
        stmt = ctx._dispatch_stream_table_join(
            "SELECT o.v FROM orders_s o JOIN users u ON o.k = u.k")
        assert "/*+ BROADCAST(u) */" in stmt
        # a stream-stream or table-table query is left untouched
        assert "BROADCAST" not in ctx._dispatch_stream_table_join(
            "SELECT k FROM users")
        with _pytest.raises(ValueError, match="left side"):
            ctx.sql("SELECT u.name FROM users u JOIN orders_s o "
                    "ON o.k = u.k")
        with _pytest.raises(ValueError, match="INNER or LEFT"):
            ctx.sql("SELECT o.v FROM orders_s o FULL OUTER JOIN users u "
                    "ON o.k = u.k")

    def test_no_select_statement_passes_through(self, spark, tmp_path):
        """Round-7 ADVICE: a statement naming both a live stream and a
        static table but containing no SELECT must pass through
        unchanged, not AttributeError on the missing hint anchor."""
        ctx = self._ctx_with_live_stream(spark, tmp_path)
        stmt = "DROP STREAM orders_s; -- see also users JOIN orders_s"
        assert ctx._dispatch_stream_table_join(stmt) == stmt


class TestShowQueriesTerminate:
    """KSQL persistent-query management: SHOW QUERIES lists the session's
    running continuous queries; TERMINATE stops one by name or id (its
    checkpoint keeps offsets, so a restart resumes where it stopped)."""

    def test_show_lists_and_terminate_stops(self, spark, tmp_path):
        ctx = KsqlContext(spark, resolver=lambda t: None)
        src = spark.readStream.format("rate").option(
            "rowsPerSecond", "5").load()
        q = (src.writeStream.format("memory").queryName("ksql_pq_1")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        try:
            rows = {r.name: r.state
                    for r in ctx.sql("SHOW QUERIES").collect()}
            assert rows.get("ksql_pq_1") == "RUNNING"
            ctx.sql("TERMINATE ksql_pq_1")
            q.awaitTermination(30)
            assert not q.isActive
            names = {r.name for r in ctx.sql("SHOW QUERIES").collect()}
            assert "ksql_pq_1" not in names
        finally:
            if q.isActive:
                q.stop()

    def test_terminate_unknown_raises(self, spark):
        ctx = KsqlContext(spark, resolver=lambda t: None)
        with pytest.raises(ValueError, match="TERMINATE"):
            ctx.sql("TERMINATE no_such_query")


class TestDuplicateCreate:
    def test_create_on_existing_name_is_an_error(self, ctx):
        """KSQL parity: CREATE STREAM/CSAS on a registered name raises
        (DROP first) — never a silent replace of the running relation."""
        ctx.sql(DDL)
        with pytest.raises(ValueError, match="already exists"):
            ctx.sql(DDL)
        ctx.sql("CREATE STREAM big AS SELECT * FROM orders "
                "WHERE orderunits > 40")
        with pytest.raises(ValueError, match="already exists"):
            ctx.sql("CREATE STREAM big AS SELECT * FROM orders")
        # DROP then re-CREATE succeeds
        ctx.sql("DROP STREAM big")
        ctx.sql("CREATE STREAM big AS SELECT * FROM orders "
                "WHERE orderunits > 20")


class TestPrint:
    def test_print_tails_the_topic(self, ctx):
        """PRINT 'topic' returns the topic's records through the resolver
        (KSQL CLI inspection); LIMIT caps batch relations."""
        assert ctx.sql("PRINT 'orders_topic'").count() == 8
        assert ctx.sql("PRINT 'orders_topic' FROM BEGINNING LIMIT 3"
                       ).count() == 3
        with pytest.raises(KeyError):
            ctx.sql("PRINT 'nope'")


class TestConnectorDdl:
    """ksqlDB connector-management DDL bound to the Connect layer
    (table_poll source loop, batch-put sink contract)."""

    def test_source_connector_lifecycle(self, spark, tmp_path):
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        src = tmp_path / "users"
        spark.createDataFrame(
            [(1, "ann"), (2, "bob")], "id long, name string") \
            .write.parquet(str(src))
        ctx = KsqlContext(spark, resolver=lambda t: None)
        ctx.sql(f"""
            CREATE SOURCE CONNECTOR jdbc_users WITH (
                'connector.class'='io.confluent.connect.jdbc.JdbcSourceConnector',
                'path'='{src}',
                'mode'='incrementing',
                'incrementing.column.name'='id',
                'table.whitelist'='users',
                'topic.prefix'='db-');
        """)
        # the connector's topic is a queryable STREAM
        rows = ctx.sql("SELECT name FROM db_users ORDER BY name").collect()
        assert [r.name for r in rows] == ["ann", "bob"]
        listing = {(r.name, r.type, r.state)
                   for r in ctx.sql("SHOW CONNECTORS;").collect()}
        assert listing == {("jdbc_users", "SOURCE", "REGISTERED")}
        desc = {r.prop: r.value
                for r in ctx.sql("DESCRIBE CONNECTOR jdbc_users").collect()}
        assert desc["mode"] == "incrementing" and desc["topic"] == "db_users"
        # duplicate CREATE errors; IF NOT EXISTS is silent
        import pytest as _pytest
        with _pytest.raises(ValueError, match="already exists"):
            ctx.sql("CREATE SOURCE CONNECTOR jdbc_users WITH ("
                    "'connector.class'='JdbcSourceConnector',"
                    f"'path'='{src}', 'table.whitelist'='users');")
        ctx.sql("CREATE SOURCE CONNECTOR IF NOT EXISTS jdbc_users WITH ("
                "'connector.class'='JdbcSourceConnector',"
                f"'path'='{src}', 'table.whitelist'='users');")
        # DROP removes the connector, leaves the topic queryable
        ctx.sql("DROP CONNECTOR jdbc_users;")
        assert ctx.sql("SHOW CONNECTORS;").count() == 0
        assert ctx.sql("SELECT count(*) AS n FROM db_users") \
            .collect()[0].n == 2
        with _pytest.raises(ValueError, match="unknown connector"):
            ctx.sql("DROP CONNECTOR jdbc_users;")
        ctx.sql("DROP CONNECTOR IF EXISTS jdbc_users;")

    def test_source_connector_poll_loop_delivers_delta(self, spark,
                                                       tmp_path):
        import time

        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        src = tmp_path / "tbl"
        spark.createDataFrame([(1, "a")], "id long, v string") \
            .write.parquet(str(src))
        ctx = KsqlContext(spark, resolver=lambda t: None)
        ctx.sql(f"""
            CREATE SOURCE CONNECTOR poller WITH (
                'connector.class'='TablePollSource',
                'path'='{src}', 'mode'='incrementing',
                'incrementing.column.name'='id',
                'table.whitelist'='tbl',
                'checkpoint'='{tmp_path / "ckpt"}');
        """)
        got: list = []
        q = ctx.start_connector(
            "poller", deliver=lambda b, e: got.extend(
                (r.id, r.v) for r in b.collect()),
            trigger_seconds=0.2)
        try:
            deadline = time.time() + 30
            while (1, "a") not in got and time.time() < deadline:
                time.sleep(0.2)
            spark.createDataFrame([(2, "b")], "id long, v string") \
                .write.mode("append").parquet(str(src))
            while (2, "b") not in got and time.time() < deadline:
                time.sleep(0.2)
        finally:
            q.stop()
        assert (1, "a") in got and (2, "b") in got
        # incrementing mode: row 1 delivered exactly once (offset advanced)
        assert got.count((1, "a")) == 1
        listing = {(r.name, r.state)
                   for r in ctx.sql("SHOW CONNECTORS;").collect()}
        assert listing == {("poller", "REGISTERED")}  # stopped

    def test_sink_connector_batch_put(self, spark, tmp_path):
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        data = spark.createDataFrame(
            [(1, "x"), (2, "y")], "k long, v string")
        ctx = KsqlContext(spark, resolver=lambda t: data)
        ctx.sql("CREATE STREAM s (k BIGINT, v VARCHAR) "
                "WITH (kafka_topic='s', value_format='JSON');")
        out = tmp_path / "out"
        ctx.sql(f"""
            CREATE SINK CONNECTOR writer WITH (
                'connector.class'='io.confluent.connect.jdbc.JdbcSinkConnector',
                'topics'='s', 'path'='{out}');
        """)
        n = ctx.flush_connector("writer")
        assert n == 2
        back = spark.read.parquet(str(out))
        assert {(r.k, r.v) for r in back.select("k", "v").collect()} \
            == {(1, "x"), (2, "y")}
        # unknown topic is rejected at CREATE time
        import pytest as _pytest
        with _pytest.raises(ValueError, match="unknown topic"):
            ctx.sql("CREATE SINK CONNECTOR bad WITH ("
                    "'connector.class'='JdbcSinkConnector',"
                    f"'topics'='nope', 'path'='{out}');")


class TestShowTopicsExplain:
    def test_show_topics_lists_registered_backing_topics(self, spark):
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        data = spark.createDataFrame([(1, "a")], "k long, v string")
        ctx = KsqlContext(spark, resolver=lambda t: data)
        ctx.sql("CREATE STREAM s1 (k BIGINT, v VARCHAR) "
                "WITH (kafka_topic='topic_a', value_format='JSON');")
        ctx.sql("CREATE STREAM s2 (k BIGINT, v VARCHAR) "
                "WITH (kafka_topic='topic_b', value_format='JSON');")
        got = {(r.kafka_topic, r.kind)
               for r in ctx.sql("SHOW TOPICS;").collect()}
        assert got == {("topic_a", "stream"), ("topic_b", "stream")}

    def test_explain_renders_plan_for_name_and_query(self, spark):
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        data = spark.createDataFrame([(1, "a"), (2, "b")],
                                     "k long, v string")
        ctx = KsqlContext(spark, resolver=lambda t: data)
        ctx.sql("CREATE STREAM s (k BIGINT, v VARCHAR) "
                "WITH (kafka_topic='s', value_format='JSON');")
        by_name = "\n".join(
            r.plan_line for r in ctx.sql("EXPLAIN s;").collect())
        assert "Physical Plan" in by_name
        adhoc = "\n".join(r.plan_line for r in ctx.sql(
            "EXPLAIN SELECT count(*) AS n FROM s GROUP BY v;").collect())
        assert "Physical Plan" in adhoc and "HashAggregate" in adhoc


def test_source_connector_sink_path_is_production_default(spark, tmp_path):
    """A SOURCE connector whose props name a 'sink.path' delivers straight
    to that parquet dir by default — epoch-partitioned dynamic overwrite,
    no driver-side collect in the delivery path (the interactive
    frame-fold stays the REPL-only fallback). Rows arrive exactly once
    across polls; the epoch column records the delivering poll."""
    import time

    from kafka_connect_streams_spark.sql.ksql import KsqlContext

    src = tmp_path / "tbl"
    sink = tmp_path / "sink"
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .write.parquet(str(src))
    ctx = KsqlContext(spark, resolver=lambda t: None)
    ctx.sql(f"""
        CREATE SOURCE CONNECTOR prod WITH (
            'connector.class'='TablePollSource',
            'path'='{src}', 'mode'='incrementing',
            'incrementing.column.name'='id',
            'table.whitelist'='tbl',
            'sink.path'='{sink}',
            'checkpoint'='{tmp_path / "ckpt"}');
    """)
    q = ctx.start_connector("prod", trigger_seconds=0.2)
    try:
        deadline = time.time() + 30

        def sunk():
            try:
                return {(r.id, r.v) for r in
                        spark.read.parquet(str(sink))
                        .select("id", "v").collect()}
            except Exception:
                return set()

        while (1, "a") not in sunk() and time.time() < deadline:
            time.sleep(0.2)
        spark.createDataFrame([(2, "b")], "id long, v string") \
            .write.mode("append").parquet(str(src))
        while (2, "b") not in sunk() and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    rows = spark.read.parquet(str(sink)).collect()
    assert {(r.id, r.v) for r in rows} == {(1, "a"), (2, "b")}
    # exactly once: the incrementing offset advanced after each delivery
    assert len(rows) == 2
    # delivered in two different polls, each tagged with its epoch
    assert len({r.epoch for r in rows}) == 2


def test_source_connector_honors_max_poll_rows(spark, tmp_path):
    """'max.poll.rows' in the connector props caps each incrementing
    poll (the Connect transfer-queue backpressure, ST6): a 5-row
    backlog drains over multiple triggers, never one oversized batch,
    and every row still arrives exactly once."""
    from kafka_connect_streams_spark.sql.ksql import KsqlContext

    src = tmp_path / "tbl"
    spark.createDataFrame([(i, f"v{i}") for i in range(5)],
                          "id long, v string").write.parquet(str(src))
    ctx = KsqlContext(spark, resolver=lambda t: None)
    ctx.sql(f"""
        CREATE SOURCE CONNECTOR capped WITH (
            'connector.class'='TablePollSource',
            'path'='{src}', 'mode'='incrementing',
            'incrementing.column.name'='id',
            'table.whitelist'='tbl',
            'max.poll.rows'='2',
            'checkpoint'='{tmp_path / "ckpt"}');
    """)
    batches: list = []
    q = ctx.start_connector(
        "capped",
        deliver=lambda b, e: batches.append(
            sorted(r.id for r in b.collect())),
        trigger_seconds=0.2)
    try:
        import time
        deadline = time.time() + 30
        while sum(len(b) for b in batches) < 5 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    delivered = [i for b in batches for i in b]
    assert sorted(delivered) == [0, 1, 2, 3, 4]       # exactly once
    assert all(len(b) <= 2 for b in batches)          # cap respected
