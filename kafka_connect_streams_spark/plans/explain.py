"""Plan assertions — the 100 TB discipline, enforced in tests.

A query that returns the right rows with the wrong plan is a bug at scale:
a scan that reads all columns for a 2-column projection, a dim join that
shuffles the fact table, a filter evaluated after the scan instead of inside
it. These helpers read ``explain("formatted")`` output so tests can pin the
plan shape, the way the reference's tests pin golden outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (``formatted`` or ``simple`` mode).

    ``formatted`` carries scan detail (PushedFilters/ReadSchema) but splits
    operator arguments onto separate lines; ``simple`` keeps one line per
    operator (``Exchange hashpartitioning(...)``, ``*(n)`` codegen markers),
    which is what operator-counting helpers need.
    """
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan carries the filter in PushedFilters."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in every scan's ReadSchema (column-pruning check)."""
    cols: list[str] = []
    for line in physical_plan(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges — the shuffle budget of the plan.

    BroadcastExchange is excluded on purpose: broadcasting a dim is the cheap
    alternative to a shuffle, not an instance of one. Counted on the
    ``simple``-mode string, where each Exchange keeps its partitioning on
    the same line (formatted mode splits it onto an Arguments: line).
    """
    import re
    plan = physical_plan(df, "simple")
    return len(re.findall(
        r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
        plan))


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present? (HashAggregate appears in partial+final.)"""
    plan = physical_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial" in plan
