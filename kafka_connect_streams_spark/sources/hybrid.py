"""Hybrid source: one logical stream over Kafka topics + connector tables.

Reference: ``WrappedConsumer.poll`` merges records from a real Kafka consumer
and N connector-backed consumers into one poll result
(WrappedConsumer.java:103-133) — with a 50 ms sleep per poll and a bug that
overwrites one source's records with the other's on partition collision
(§4.3). Spark unions heterogeneous STREAMING sources natively and plans each
leg's scan independently, so the merge is just ``unionByName``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical record envelope all legs are normalized to (mirrors the Kafka
#: source schema / SourceRecord fields, ConnectSourceConsumer.java:255-298)
ENVELOPE = ("topic", "key", "value", "ts")


def normalize(df: DataFrame, *, topic: str, key, value, ts) -> DataFrame:
    """Project any source to the canonical (topic, key, value, ts) envelope."""
    return df.select(
        F.lit(topic).alias("topic"),
        key.cast("string").alias("key"),
        value.cast("string").alias("value"),
        ts.alias("ts"),
    )


def hybrid_union(*legs: DataFrame) -> DataFrame:
    """Merge normalized legs into one stream (S9). Spark tracks each leg's
    offsets independently in the one checkpoint — no wrapped-client muxing."""
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
