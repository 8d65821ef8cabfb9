"""Joins: windowed stream-stream joins + dimension joins.

Reference surface (SURVEY.md §2.3): key-equi joins windowed by event time,
±10s (``leftStream.join(rightStream, joiner, JoinWindows.of(10000))``,
StreamStreamJoinIntegrationTest.java:82), in inner/left/outer variants and
chained multi-way (:257-258). The join key is the record key; upstream re-keys
force repartition topics (J5) — in Spark the exchange is planned by
``EnsureRequirements`` only when actually needed.

Scale notes (100 TB):
- ``interval_join`` is a shuffled equi-join on the key with a range predicate;
  Catalyst plans it as SortMergeJoin with the time bound as a post-join filter
  pushed into the sort-merge band. Both sides shuffle ONCE on the key.
- ``dim_join`` broadcasts the small side explicitly — at 100 TB the fact table
  must never shuffle for a megabyte-scale dimension.
- Streaming form: same ``on`` expression with ``withWatermark`` on both inputs
  bounds state (see streaming/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str, ts: str,
                  window_ms: int, how: str = "inner",
                  lsuffix: str = "l_", rsuffix: str = "r_") -> DataFrame:
    """Event-time windowed equi-join: match rows with equal keys whose
    timestamps differ by at most ``window_ms`` (JoinWindows.of semantics).

    Null keys/values never join (Streams drops null-key records;
    AbstractJoinIntegrationTest.java:100-116 exercises this with null values).
    Returns all left columns prefixed ``lsuffix`` and right prefixed ``rsuffix``.
    """
    l = left.select([F.col(c).alias(f"{lsuffix}{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"{rsuffix}{c}") for c in right.columns])
    lk, rk = F.col(f"{lsuffix}{key}"), F.col(f"{rsuffix}{key}")
    lt, rt = F.col(f"{lsuffix}{ts}"), F.col(f"{rsuffix}{ts}")
    cond = (
        (lk == rk)
        & (rt >= lt - F.expr(f"INTERVAL {window_ms} MILLISECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {window_ms} MILLISECONDS"))
    )
    return l.join(r, cond, how)


def value_joiner(joined: DataFrame, lcol: str, rcol: str,
                 out: str = "joined_value", sep: str = "-") -> DataFrame:
    """The reference's ValueJoiner ``v1 + "-" + v2``
    (AbstractJoinIntegrationTest.java:118-123) as a column expression.

    ``concat_ws`` skips nulls, but Streams emits the literal string with a null
    side for outer joins (``A-null``) — reproduce that with coalesce.
    """
    lv = F.coalesce(F.col(lcol).cast("string"), F.lit("null"))
    rv = F.coalesce(F.col(rcol).cast("string"), F.lit("null"))
    return joined.withColumn(out, F.concat_ws(sep, lv, rv))


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact-to-dimension join with an explicit broadcast of the dim side.

    AQE would usually discover this, but at 100 TB we never want the planner to
    even consider shuffling the fact side for a small dimension.
    """
    return fact.join(F.broadcast(dim), on, how)
