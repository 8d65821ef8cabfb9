"""Approximate-membership pre-filtering: a deterministic Bloom filter
semi-join with its false-positive accounting.

This is the runtime-filter trick (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled``, Bloom CACM'70)
made explicit and measurable: build a bit set over the small side's
join keys, broadcast it, and drop non-matching big-side rows AT THE
SCAN — the shuffle then carries only candidates. The operator exists
(rather than just the engine flag) so the false-positive economics are
a first-class, oracle-checkable result: hash positions come from the
same md5-affine family as the count-min sketch, so the exact bitmap —
and therefore the exact candidate set and fp rate — reproduces
bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.frequency import cms_hash


def bloom_positions(col: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """The key's bit positions — the CMS affine-hash family mod m."""
    return [cms_hash(col, r, m_bits) for r in range(n_hashes)]


def bloom_semijoin_report(build: DataFrame, build_key: str,
                          probe: DataFrame, probe_key: str,
                          n_hashes: int = 3,
                          m_bits: int = 16384) -> DataFrame:
    """Bloom-filter the probe side by the build side's key set and
    report the economics: probe rows, Bloom candidates, true matches,
    false positives, and the observed fp rate (e6 fixed point).

    Plan shape: the build side's distinct keys fan out to ≤ n_hashes·m
    bit positions and aggregate to ONE row holding the sorted position
    array (tiny — it IS the Bloom bitmap); that row broadcasts to the
    probe scan, where membership is n_hashes in-row ``array_contains``
    probes. The exact semi-join runs only to score the filter — a
    production plan keeps the Bloom gate and drops the scoring joins.
    """
    keys = build.select(F.col(build_key).cast("string").alias("k")) \
                .where(F.col("k").isNotNull()).distinct()
    bits = (keys.select(F.explode(F.array(
                *bloom_positions(F.col("k"), n_hashes, m_bits)))
                .alias("pos"))
            .distinct()
            .agg(F.array_sort(F.collect_list("pos")).alias("bitmap")))
    probed = (probe.select(F.col(probe_key).cast("string").alias("k"))
              .crossJoin(F.broadcast(bits)))
    member = None
    for pos in bloom_positions(F.col("k"), n_hashes, m_bits):
        hit = F.array_contains("bitmap", pos)
        member = hit if member is None else (member & hit)
    flagged = probed.withColumn("bloom_pass", member)
    truth = flagged.join(F.broadcast(keys.withColumnRenamed("k", "tk")),
                         F.col("k") == F.col("tk"), "left")
    return (truth.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("bigint")).alias("n_bloom_pass"),
        F.sum(F.col("tk").isNotNull().cast("bigint")).alias("n_true"),
        F.sum((F.col("bloom_pass") & F.col("tk").isNull())
              .cast("bigint")).alias("n_false_pos"))
        .select("n_probe", "n_bloom_pass", "n_true", "n_false_pos",
                F.expr("CASE WHEN n_probe - n_true > 0 THEN"
                       " n_false_pos * 1000000 div (n_probe - n_true)"
                       " ELSE cast(0 as bigint) END").alias("fp_e6"),
                # Bloom soundness: no true match may be filtered out
                F.expr("n_bloom_pass >= n_true").alias("no_false_negatives")))
