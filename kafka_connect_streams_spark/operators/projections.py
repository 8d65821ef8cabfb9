"""Per-record transforms: the Streams DSL's flatMap/map/selectKey family.

Reference surface (SURVEY.md §2.2): ``flatMapValues`` splitting lines into
words (examples/KafkaWordCount.java:60-62, examples/DatabaseWordCount.java:109-120),
``map`` re-shaping key/value (DatabaseStreamStreamJoinIntegrationTest.java:64-75),
``selectKey`` re-keying (StreamStreamJoinIntegrationTest.java:111), struct field
access (DatabaseWordCount.java:111-112).

All of these are narrow (no-shuffle) column expressions here — the reference's
per-record JVM lambdas become Catalyst expressions inside whole-stage codegen.
Re-keying does NOT itself shuffle; Spark inserts the exchange lazily when a
downstream keyed operator (join/agg) actually requires the new distribution,
which is exactly the repartition-topic behavior (J5) without the broker round
trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: token split pattern used by the reference word counts
#: (examples/KafkaWordCount.java:62: ``value.toLowerCase().split("\\W+")``)
WORD_SPLIT = r"\W+"


def flat_map_values(df: DataFrame, text_col: str, out_col: str = "word",
                    keep: list[str] | None = None) -> DataFrame:
    """1→N explode of a text column into lowercase word tokens, key columns kept.

    Streams ``flatMapValues((k, line) -> split(lower(line)))`` as a native
    explode — stays in codegen, no Python boundary.
    """
    keep_cols = [F.col(c) for c in (keep or [])]
    tokens = F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    out = df.select(*keep_cols, F.explode(tokens).alias(out_col))
    # drop empty tokens (DatabaseWordCount.java:115 length guard)
    return out.filter(F.length(F.col(out_col)) > 0)


def select_key(df: DataFrame, key: Column | str, key_name: str = "key") -> DataFrame:
    """Re-key the stream (Streams ``selectKey``): add/replace the key column."""
    key_col = F.col(key) if isinstance(key, str) else key
    return df.withColumn(key_name, key_col)


def map_reshape(df: DataFrame, **named_exprs: Column) -> DataFrame:
    """1→1 re-shape (Streams ``map``): project to a new set of named columns."""
    return df.select(*[c.alias(n) for n, c in named_exprs.items()])


def with_envelope(df: DataFrame, key: Column, value_cols: list[str]) -> DataFrame:
    """Build a Kafka-style (key, value-struct) envelope from flat columns.

    Mirrors the reference's output-struct construction
    (examples/DatabaseWordCount.java:126-133) with ``struct()`` instead of a
    per-record SchemaBuilder.
    """
    return df.select(key.alias("key"),
                     F.struct(*[F.col(c) for c in value_cols]).alias("value"))
