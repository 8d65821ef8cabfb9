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


class Catalog(dict):
    """Lazy table dict: each parquet footer is read only when the table is
    first accessed, so a query touching 2 tables doesn't pay schema resolution
    for all 10 (at cluster scale, footer reads are remote metadata RPCs)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        df = self._spark.read.parquet(f"{self._sf_dir}/{name}.parquet")
        for c in TIMESTAMP_COLS.get(name, ()):
            # Only NANOS columns surface as long under nanosAsLong; MICROS
            # columns already arrive as (ntz) timestamps.
            if dict(df.dtypes)[c] == "bigint":
                df = df.withColumn(
                    c, F.expr(f"timestamp_micros({c} div 1000)").cast("timestamp_ntz"))
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> Catalog:
    """Lazy catalog of the testdata tables (parquet scans, loaded on access)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return Catalog(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> Catalog:
    """Register all tables as temp views so ``spark.sql`` resolves them by name."""
    dfs = load_tables(spark, sf_dir)
    for name in TABLES:
        dfs[name].createOrReplaceTempView(name)
    return dfs
