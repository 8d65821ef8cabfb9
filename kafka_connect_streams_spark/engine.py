"""SparkSession factory with scale-oriented defaults.

The reference runs record-at-a-time through Kafka Streams threads (one task per
topic-partition, connector topics pinned to partition 0 — see
reference ConnectStreamsPartitionAssignor.java:456-552 / WrappedPartitionGrouper.java:80-86).
We instead let Spark schedule: AQE resizes shuffles at runtime, skew-join
handling splits hot partitions, and broadcast joins collapse small-dim shuffles.

These defaults are tuned so the SAME logical plans survive a 1000-executor /
100 TB deployment: nothing here assumes local mode except the master URL, which
callers override in production via ``SPARK_MASTER`` or their own builder.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tunables that matter at 100 TB, with the local-test value second.
_SCALE_CONF = {
    # AQE: runtime re-planning — coalesce tiny post-shuffle partitions, split
    # skewed ones, convert sort-merge to broadcast when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Shuffle width: at 100 TB this should be (cluster cores * 2..4); AQE
    # coalesces down so over-provisioning is the safe direction.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Broadcast threshold: dims (region/nation/supplier/part at any SF that
    # fits) must broadcast instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Arrow for every pandas_udf / applyInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps across Spark and the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: keep splits near the default 128 MB so a 100 TB table
    # yields ~800k tasks, not 80M.
    "spark.sql.files.maxPartitionBytes": "128m",
    # Streaming state: RocksDB provider scales past heap for large keyed state
    # (the reference uses RocksDB KTable stores; same engine, managed by Spark).
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.statefulOperator.checkCorrectness.enabled": "true",
}


def get_spark(app_name: str = "kafka-connect-streams-spark",
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or return the active) SparkSession with engine defaults.

    Local test master comes from ``SPARK_GRAFT_CPUS`` (default ``local[*]``);
    production deployments point ``SPARK_MASTER`` at the cluster and every plan
    in this package carries over unchanged.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]")
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _SCALE_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
