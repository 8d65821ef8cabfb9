"""Parallelism guard for CPU-heavy narrow pipelines.

Spark's scan parallelism is bounded by input splits (files × row groups). A
single-row-group parquet file scans as ONE task, so an expression-heavy
narrow pipeline downstream of it (shingling, n-gram hashing, embedding
explodes) runs on one core no matter how many executors exist — the shuffle
that would spread it out only comes AFTER the expensive work.

``fan_out`` repartitions such inputs up to the cluster's parallelism BEFORE
the heavy expressions, trading one cheap shuffle of the raw rows for full-
width execution of the expensive stage. It is a no-op whenever the scan
already has enough splits (the normal case at scale — a 100 TB table arrives
as ~800k splits), so pipelines keep their shuffle-minimal plans on real data
while small/singleton inputs (demo files, `.coalesce(1)` outputs, broker
topics with one partition) stop serializing on a single core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None, *,
            enabled: bool = True) -> DataFrame:
    """Repartition ``df`` to at least cluster default parallelism — only if
    its scan has fewer input files than that.

    The probe is ``df.inputFiles()`` — a logical-plan metadata lookup (the
    file index the scan already holds), NOT a ``df.rdd`` conversion, which
    would force physical planning and break AQE plan reuse on every call.
    File count underestimates split count (a file may hold several row
    groups), which errs on the side of one cheap extra shuffle of raw rows
    before the expensive stage — the safe direction. Non-file inputs (local
    relations, post-shuffle frames) report zero files and are fanned out:
    exactly the small/singleton inputs the guard exists for.

    ``enabled=False`` is the caller's opt-out for frames KNOWN to already be
    wide (e.g. directly downstream of a join/aggregate shuffle): those also
    report zero input files, and the unconditional repartition would be a
    pure waste there. The flag exists because no cheap logical-plan probe
    distinguishes "post-shuffle wide" from "singleton local relation" — the
    call site knows, the operator can't.
    """
    if not enabled:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)
