"""Table catalog over the driver-generated parquet testdata.

Mirrors the KSQL MetaStore role (reference KsqlContext usage at
DatabaseSelectAndProjectIntTest.java:110-135): named, schema-ful sources the SQL
layer resolves. Here the catalog is the Spark session catalog and sources are
parquet scans — at 100 TB these are partitioned/columnar scans that Catalyst
prunes (PushedFilters + ReadSchema), so loading "the table" costs nothing until
an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: testdata timestamps are parquet TIMESTAMP(NANOS), which Spark's vectorized
#: reader rejects. We read them as raw nanos (legacy long mode) and rebuild
#: TimestampType via integer division — `div` keeps the math in int64 (a
#: double round-trip would lose precision above 2^53) and truncates toward
#: minus infinity for positive epochs, exactly like DuckDB's ns→us cast.
TIMESTAMP_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame (lazy parquet scans)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in TIMESTAMP_COLS.get(t, ()):
            # Only NANOS columns surface as long under nanosAsLong; MICROS
            # columns already arrive as (ntz) timestamps.
            if dict(df.dtypes)[c] == "bigint":
                df = df.withColumn(
                    c, F.expr(f"timestamp_micros({c} div 1000)").cast("timestamp_ntz"))
        out[t] = df
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables as temp views so ``spark.sql`` resolves them by name."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
