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
from pyspark.sql.window import Window


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


def asof_join(left: DataFrame, right: DataFrame, *, key: str, ts: str,
              right_cols: list[str], right_ts_alias: str = "asof_ts",
              tolerance_ms: int | None = None) -> DataFrame:
    """As-of (backward) join: each left row picks up the most recent right row
    with the same key and ``right.ts <= left.ts`` (left-outer semantics).

    Spark has no native as-of join (SURVEY.md §2.3 gap list); the naive
    formulation — range join + per-row argmax — explodes to O(|L|·|R|) pairs
    per key before pruning. This implementation is the plan shape that
    survives 100 TB:

    1. Tag both inputs and union them (no join at all).
    2. One shuffle on ``key``, sort by ``(ts, side)`` with right rows first
       so a right row at exactly ``left.ts`` is visible to that left row.
    3. ``last(value, ignorenulls=True)`` over an unbounded-preceding running
       window carries each right value forward to the left rows that follow.
    4. Keep only left rows.

    One shuffle, sort-based, no pair blow-up — the same trade kdb/Pandas
    ``merge_asof`` makes, expressed in Catalyst operators. If multiple right
    rows share (key, ts), pre-reduce the right side to one row per (key, ts)
    first (e.g. ``max_by``) to keep results deterministic.

    ``tolerance_ms``: optional max staleness; carried values older than
    ``left.ts - tolerance_ms`` are nulled out (Pandas merge_asof semantics).
    """
    lcols = [c for c in left.columns]
    u = (left.withColumn("_side", F.lit(1))
         .unionByName(
             right.select(
                 F.col(key),
                 F.col(ts),
                 F.lit(0).alias("_side"),
                 *[F.col(c) for c in right_cols]),
             allowMissingColumns=True))
    w = (Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn(
        right_ts_alias,
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True).over(w))
    for c in right_cols:
        carried = carried.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)),
                      ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        # materialize the flag BEFORE nulling columns — the predicate reads
        # the carried ts, which the loop below overwrites
        out = out.withColumn(
            "_stale",
            F.col(right_ts_alias)
            < F.col(ts) - F.expr(f"INTERVAL {tolerance_ms} MILLISECONDS"))
        for c in [right_ts_alias, *right_cols]:
            out = out.withColumn(
                c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c)))
    return out.select(*lcols, right_ts_alias, *right_cols)
