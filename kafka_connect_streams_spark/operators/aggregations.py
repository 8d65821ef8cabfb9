"""Keyed and windowed aggregation — the KTable layer.

Reference surface (SURVEY.md §2.4): ``groupBy((k,word) -> word).count()``
(examples/KafkaWordCount.java:63-64, examples/DatabaseWordCount.java:122-124)
producing a continuously-updated KTable. In batch this is a plain hash
aggregate; in streaming, the same expression in ``update`` output mode emits
the changed (word, count) rows per micro-batch, which matches the KTable
changelog contract (A2/A3).

Scale notes (100 TB):
- Spark always does partial (map-side) aggregation before the shuffle, so a
  high-cardinality groupBy moves only one row per (partition, key) — the
  reference shipped every record through a broker repartition topic instead.
- Double sums are computed over ``DECIMAL``-cast inputs. That makes the
  aggregate exact and ORDER-INDEPENDENT, which matters on a cluster: a plain
  double sum is nondeterministic across retries/partitionings at scale (and
  unverifiable against an oracle). Final results are cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.projections import flat_map_values

#: decimal type wide enough for TPC-H-ish money/quantity with exact sums
DEC = "decimal(18,2)"


def word_count(df: DataFrame, text_col: str) -> DataFrame:
    """The flagship pipeline: lower → split \\W+ → drop empty → count per word.

    Structural twin of KafkaWordCount.countWords (examples/KafkaWordCount.java:56-67):
    source → flatMapValues → groupBy → count, minus the repartition topic
    (Spark's exchange does map-side partial counts first).
    """
    words = flat_map_values(df, text_col, out_col="word")
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def dec(col: str | Column) -> Column:
    """Cast a double measure to exact decimal for order-independent sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def sum_money(col: str | Column, alias: str) -> Column:
    """Exact decimal sum of a money column, emitted as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def avg_money(col: str | Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = dec(col)
    return (F.sum(c).cast("double") / F.count(c)).alias(alias)


def tumbling(df: DataFrame, ts_col: str, width: str, *keys: str,
             aggs: list[Column]) -> DataFrame:
    """Tumbling event-time window aggregation (ST7 — native in Spark).

    Emits ``window_start`` as a plain timestamp column so batch and streaming
    results share one schema.
    """
    w = F.window(F.col(ts_col), width)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("window_start", F.col("window.start"))
              .drop("window"))


def sliding(df: DataFrame, ts_col: str, width: str, slide: str, *keys: str,
            aggs: list[Column]) -> DataFrame:
    """Sliding event-time window aggregation (each record lands in width/slide windows)."""
    w = F.window(F.col(ts_col), width, slide)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("window_start", F.col("window.start"))
              .drop("window"))


def session(df: DataFrame, ts_col: str, gap: str, *keys: str,
            aggs: list[Column]) -> DataFrame:
    """Session windows with a fixed inactivity gap (native ``session_window``).

    Emits ``session_start`` (= min event time in the session) so results are
    comparable to a gaps-and-islands SQL formulation.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("session_start", F.col("session_window.start"))
              .drop("session_window"))
