"""Windowed stream-stream joins with watermarks (J1-J4, ST1-ST2).

Reference semantics (StreamStreamJoinIntegrationTest.java:82):
``leftStream.join(rightStream, joiner, JoinWindows.of(10000))`` — records with
equal keys whose event times differ by ≤ window join; null-valued records
never join; left/outer variants emit null-padded rows for unmatched records.

Spark mapping: the same equi-join + time-bound condition, with
``withWatermark`` on both inputs so the state store evicts expired rows —
this is what makes the join runnable forever at 100 TB/day (the reference
holds 24h of state by default and has no watermarking concept).

Semantic refinement (documented, SURVEY.md §7.3): Kafka Streams emits
left/outer null-padded results EAGERLY (possibly followed by the matched
result); Spark emits them once, at watermark expiry, when it is KNOWN no
match exists. Tests therefore assert final converged sets, which are equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_join(left: DataFrame, right: DataFrame, *, key: str = "key",
                  ts: str = "ts", window_ms: int = 10_000,
                  watermark: str = "30 seconds", how: str = "inner",
                  watermark_left: bool = True) -> DataFrame:
    """Stream-stream join within ±window_ms on equal keys.

    Inputs: streaming DataFrames with (key, value, ts) columns. Output columns:
    key, l_value, r_value, l_ts, r_ts. Null-VALUED records are dropped before
    the join to match Streams (a null value means "no record" in the joiner,
    AbstractJoinIntegrationTest.java:100-116) — null KEYS never match an
    equi-join in either engine.
    """
    lw = left.filter(F.col("value").isNotNull())
    if watermark_left:
        # a chained join's left input already carries a watermark from the
        # upstream join — Spark forbids redefining it
        lw = lw.withWatermark(ts, watermark)
    lw = lw.select(F.col(key).alias("l_key"), F.col("value").alias("l_value"),
                   F.col(ts).alias("l_ts"))
    rw = (right.filter(F.col("value").isNotNull())
          .withWatermark(ts, watermark)
          .select(F.col(key).alias("r_key"), F.col("value").alias("r_value"),
                  F.col(ts).alias("r_ts")))
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window_ms} MILLISECONDS"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window_ms} MILLISECONDS"))
    )
    joined = lw.join(rw, cond, how)
    return joined.select(
        F.coalesce(F.col("l_key"), F.col("r_key")).alias("key"),
        "l_value", "r_value", "l_ts", "r_ts",
        F.concat_ws("-",
                    F.coalesce(F.col("l_value").cast("string"), F.lit("null")),
                    F.coalesce(F.col("r_value").cast("string"), F.lit("null")))
        .alias("joined_value"),
    )


def chained_join(left: DataFrame, right: DataFrame, **kw) -> DataFrame:
    """(L ⋈ R) ⋈ R — the reference's multi-way chained join
    (StreamStreamJoinIntegrationTest.java:257-258), producing value triples."""
    first = windowed_join(left, right, **kw)
    inner = first.select(
        F.col("key"),
        F.col("joined_value").alias("value"),
        F.col("l_ts").alias("ts"),
    )
    second = windowed_join(inner, right, watermark_left=False, **kw)
    return second


def stream_table_join(stream: DataFrame, table: DataFrame, *, key: str = "key",
                      how: str = "inner",
                      broadcast_table: bool = True) -> DataFrame:
    """Stream-table (dimension-enrichment) join — KSQL's STREAM ⋈ TABLE.

    KSQL 5.1 supports stream-table joins (the reference links the engine,
    pom.xml:55-59, but its tests never exercise one — SURVEY.md §2.3); we
    expose the capability natively. Spark's stream-static join re-reads the
    static side per micro-batch, so the table may be updated between
    triggers — the same "latest table state at processing time" semantics as
    a Streams KTable lookup join.

    At scale the dimension side should broadcast (default): the stream is
    never shuffled, each micro-batch is a map-side hash join. Set
    ``broadcast_table=False`` when the dimension is too large to broadcast —
    then a shuffled sort-merge join with AQE takes over.
    """
    t = F.broadcast(table) if broadcast_table else table
    return stream.join(t, on=key, how=how)
