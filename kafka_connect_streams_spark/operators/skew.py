"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join handling (enabled in engine.py) splits oversized SHUFFLE
partitions automatically — that covers most cases at 100 TB. Salting is the
explicit tool for the residual cases AQE can't fix:

- a groupBy where ONE key holds >~5% of all rows (AQE can't split a hash
  partition below key granularity): two-phase salted aggregation
- a shuffled join against a dimension with a hot key: replicate the dim row
  per salt so the fact side spreads across ``salt`` partitions

Salt comes from a deterministic hash of a unique column (never rand() — a
retried task must re-produce the same salt or exactly-once breaks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a unique column's hash."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)))


def salted_count(df: DataFrame, key_col: str, unique_col: str,
                 buckets: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: (key, salt) partial → key final.

    Phase 1 spreads a hot key over ``buckets`` reducers; phase 2 combines
    ``buckets`` rows per key — negligible. Output equals plain
    ``groupBy(key).count()``.
    """
    salted = with_salt(df, unique_col, buckets)
    partial = (salted.groupBy(key_col, "_salt")
               .agg(F.count("*").alias("_partial")))
    return (partial.groupBy(key_col)
            .agg(F.sum("_partial").alias("cnt")))


def salted_sum(df: DataFrame, key_col: str, value: Column, unique_col: str,
               alias: str, buckets: int = 16) -> DataFrame:
    """Two-phase sum with the same shape (value should be decimal for
    order-independent results — see operators/aggregations.py)."""
    salted = with_salt(df, unique_col, buckets)
    partial = (salted.groupBy(key_col, "_salt")
               .agg(F.sum(value).alias("_partial")))
    return (partial.groupBy(key_col)
            .agg(F.sum("_partial").alias(alias)))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                unique_col: str, buckets: int = 8) -> DataFrame:
    """Skewed fact ⋈ small-ish dim: salt the fact, replicate the dim.

    The dim side is exploded ``buckets``× (cheap for dimension tables) so the
    join key becomes (key, salt) and a hot fact key spreads over ``buckets``
    reducers. For dims small enough to broadcast, prefer ``dim_join`` —
    salting is for the mid-size dim that shuffles but has hot fact keys.
    """
    salted_fact = with_salt(fact, unique_col, buckets)
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = salted_fact.join(replicated, [key, "_salt"])
    return out.drop("_salt")
