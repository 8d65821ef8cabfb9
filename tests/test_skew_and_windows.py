"""Salted skew operators + streaming windowed aggregation with late data."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.skew import (salted_count,
                                                        salted_join,
                                                        salted_sum)


class TestSalting:
    def test_salted_count_equals_plain_count(self, spark):
        df = spark.createDataFrame(
            [(i, "hot" if i % 10 else "cold") for i in range(1000)],
            "id long, key string")
        plain = {r.key: r["count"] for r in df.groupBy("key").count().collect()}
        salted = {r.key: r.cnt for r in
                  salted_count(df, "key", "id", buckets=16).collect()}
        assert salted == plain

    def test_salted_sum_equals_plain_sum(self, spark):
        df = spark.createDataFrame(
            [(i, "k", i) for i in range(100)], "id long, key string, v long")
        got = salted_sum(df, "key", F.col("v"), "id", "total").collect()[0]
        assert got.total == sum(range(100))

    def test_salted_join_equals_plain_join(self, spark):
        fact = spark.createDataFrame(
            [(i, i % 3) for i in range(300)], "id long, key int")
        dim = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "key int, name string")
        plain = sorted((r.id, r.name) for r in fact.join(dim, "key").collect())
        salted = sorted((r.id, r.name) for r in
                        salted_join(fact, dim, "key", "id", buckets=4).collect())
        assert salted == plain


class TestStreamingWindows:
    def test_tumbling_window_with_watermark_drops_late_data(self, spark, tmp_path):
        """ST7 streaming + ST2 lateness: a record older than the watermark
        must not resurrect its (closed) window in append mode."""
        src = tmp_path / "in"
        src.mkdir()
        base = 1_700_000_000_000

        def write(name, rows):
            with open(src / name, "w") as f:
                for k, off in rows:
                    f.write(json.dumps({"k": k, "ts_ms": base + off}) + "\n")

        write("a.json", [("x", 0), ("x", 30_000), ("y", 45_000)])

        stream = (spark.readStream.schema("k string, ts_ms long").json(str(src))
                  .selectExpr("k", "timestamp_micros(ts_ms*1000) AS ts"))
        agg = (stream.withWatermark("ts", "10 seconds")
               .groupBy(F.window("ts", "1 minute"), "k")
               .agg(F.count("*").alias("n"))
               .select(F.col("window.start").alias("ws"), "k", "n"))
        q = (agg.writeStream.format("memory").queryName("tw")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            # advance watermark far past the first window, then send a LATE
            # record for it
            write("b.json", [("z", 600_000)])
            q.processAllAvailable()
            write("late.json", [("x", 1_000)])  # late by ~9.8 min
            q.processAllAvailable()
            rows = spark.sql("SELECT k, n FROM tw").collect()
        finally:
            q.stop()
        got = {(r.k): r.n for r in rows}
        # closed first window emitted once with on-time counts only
        assert got.get("x") == 2 and got.get("y") == 1


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_join_partition(self, spark):
        """The OTHER half of the skew story: salting (above) is the manual
        rewrite; AQE skew-join is the runtime one. Force a 98%-hot join key
        with scaled-down skew thresholds and assert the FINAL adaptive plan
        actually split the hot partition (``skew=true``) while producing
        exactly the plain-join result. At production thresholds the same
        re-plan handles hot keys with no query change — the reason q-side
        code never hand-partitions."""
        conf = {
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            left = spark.range(0, 200_000).select(
                F.when(F.col("id") % 100 < 98, F.lit(0))
                 .otherwise(F.col("id") % 50).alias("k"),
                F.concat(F.lit("payload-payload-payload-"),
                         F.col("id").cast("string")).alias("pl"))
            right = spark.range(0, 50).select(
                F.col("id").alias("k"), F.lit("dim").alias("d"))
            j = left.join(right, "k")
            rows = j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan[:3000]
            assert len(rows) == 200_000
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
