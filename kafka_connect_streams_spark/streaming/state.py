"""Custom stateful streaming operators (ST4) + streaming dedup.

The reference's stateful layer is RocksDB KTable stores updated record-at-a-
time by the Streams runtime (AbstractJoinIntegrationTest.java:268-281 queries
one). Spark's equivalents used here:

- ``running_count``: ``applyInPandasWithState`` — arbitrary per-key state with
  watermark-driven timeout; the escape hatch for operators the built-in
  surface can't express. State lives in the state store (RocksDB provider,
  engine.py), partitioned by key — the same sharding as the reference's
  per-task stores, but rebalanced/checkpointed by Spark.
- ``streaming_dedup``: ``dropDuplicatesWithinWatermark`` — exact dedup over an
  unbounded stream with bounded state (keys older than the watermark are
  evicted); the streaming form of dedup.exact_dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

COUNT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("cnt", LongType()),
])
_STATE_SCHEMA = StructType([StructField("cnt", LongType())])


def running_count(keyed: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key running count as an explicit stateful operator.

    Functionally ``groupBy(key).count()`` — implemented with
    ``applyInPandasWithState`` to exercise (and document) the custom-operator
    path: batched Arrow input per key, explicit GroupState, update-mode
    emission of changed keys only (the KTable changelog contract).
    """
    def update(key: tuple, batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in batches:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [key[0]], "cnt": [n]})

    return (keyed.groupBy(F.col(key_col).cast("string").alias(key_col))
            .applyInPandasWithState(
                update,
                outputStructType=COUNT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_dedup(df: DataFrame, key_cols: list[str], *, ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one fingerprint per key only until
    the watermark passes — at 100 TB/day this is what makes streaming dedup
    feasible (the batch operator's full-history state can't fit).
    """
    return (df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))
