"""Scalar/aggregate function surface (SURVEY.md §2.7).

The reference links KSQL 5.1's builtin function library (pom.xml:55-59);
its tests exercise a small slice (lower/split/concat/length/comparisons/
ROWTIME arithmetic, F1-F11). Spark SQL's builtin library is a strict
superset — this package maps the KSQL names onto it so KSQL-dialect
queries run unchanged, every one of them as a JVM expression inside
whole-stage codegen (no UDFs).
"""

from kafka_connect_streams_spark.functions.ksql_functions import (
    KSQL_FUNCTIONS, rewrite_ksql_sql)

__all__ = ["KSQL_FUNCTIONS", "rewrite_ksql_sql"]
