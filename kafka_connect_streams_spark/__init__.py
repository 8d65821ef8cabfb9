"""kafka_connect_streams_spark — a PySpark-native analytics/streaming engine.

A from-scratch re-expression of the query and data-processing capabilities of
``rayokota/kafka-connect-streams`` (a Kafka Connect <-> Kafka Streams/KSQL bridge
prototype) on top of Apache Spark:

- the connector data plane (JDBC/file sources & sinks, serde/converter pipeline,
  offset bookkeeping) becomes Structured Streaming sources/sinks + checkpoints
  (``sources/``),
- the Kafka Streams DSL operator surface (flatMap/map/selectKey/groupBy/count,
  windowed stream-stream joins) becomes DataFrame operators (``operators/``,
  ``streaming/``),
- the KSQL SQL subset (CREATE STREAM ... WITH, CSAS, ROWKEY/ROWTIME
  pseudo-columns) becomes Spark SQL over temp views (``sql/``).

Everything is declared through the DataFrame/SQL API so Catalyst plans the
physical execution (pushdown, pruning, shuffle placement, AQE); there is no
hand-built execution engine here by design. See SURVEY.md for the blueprint and
file:line citations into the reference.
"""

from kafka_connect_streams_spark.engine import get_spark, stop_spark
from kafka_connect_streams_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "stop_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
