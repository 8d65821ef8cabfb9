"""Query registry: every operator from SURVEY.md §2 as a (Spark, oracle-SQL) pair.

Each ``q_*`` function takes ``(spark, sf_dir)`` and returns a DataFrame built
with the operator library; ``ORACLE`` holds the ANSI-SQL twin DuckDB runs over
the same parquet for the driver's hash-match gate. Column names are aliased
identically on both sides (the driver sorts columns by name before hashing).

Determinism conventions (so hashes match engine-to-engine and run-to-run):
- double aggregates go through exact DECIMAL sums (operators/aggregations.py),
- every ranked/limited query has a total tie-break order on a unique key,
- md5 is the cross-engine hash primitive (identical hex in Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_connect_streams_spark.catalog import load_tables
from kafka_connect_streams_spark.operators import aggregations as agg
from kafka_connect_streams_spark.operators import joins as J
from kafka_connect_streams_spark.operators.aggregations import avg_money, sum_money
from kafka_connect_streams_spark.operators.projections import flat_map_values


# ---------------------------------------------------------------------------
# §2.2 projections / filters / per-record transforms (P1-P6, F1-F9)
# ---------------------------------------------------------------------------

def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: flatMapValues → groupBy → count (KafkaWordCount.java:56-67)."""
    t = load_tables(spark, sf_dir)
    return agg.word_count(t["documents"], "text")


def q_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KSQL SELECT with aliasing + arithmetic (StreamsSelectAndProjectIntTest.java:175-180)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        (F.col("o_totalprice") * 1.1).alias("adj_price"),
        F.col("o_orderpriority").alias("prio"),
    )


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KSQL WHERE with conjunction (DatabaseSelectAndProjectIntTest.java:247-266)."""
    t = load_tables(spark, sf_dir)
    return (t["orders"]
            .filter((F.col("o_totalprice") > 150000) & (F.col("o_orderstatus") == "O"))
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"))


def q_flatmap_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap with re-key (P2/P4): doc → words keyed by (word), keep provenance."""
    t = load_tables(spark, sf_dir)
    words = flat_map_values(t["documents"], "text", out_col="word", keep=["doc_id"])
    return words.groupBy("word").agg(
        F.count("*").alias("occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (§2.7): string/date/math/case over orders."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        F.col("o_orderkey").alias("okey"),
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderstatus"), 1, 1).alias("status_c"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
        F.year(F.col("o_orderdate")).alias("o_year"),
        F.month(F.col("o_orderdate")).alias("o_month"),
        F.round(F.col("o_totalprice"), 0).alias("price_rounded"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.when(F.col("o_totalprice") > 200000, F.lit("big"))
         .when(F.col("o_totalprice") > 100000, F.lit("mid"))
         .otherwise(F.lit("small")).alias("bucket"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access on the events.props payload (serde surface §1.5)."""
    t = load_tables(spark, sf_dir)
    return t["events"].select(
        F.col("event_id"),
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("prop_k"),
        F.col("event_type"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins (J1-J6)
# ---------------------------------------------------------------------------

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain inner join with explicit broadcasts (customer→nation→region)."""
    t = load_tables(spark, sf_dir)
    c = J.dim_join(t["customer"], t["nation"],
                   t["customer"].c_nationkey == t["nation"].n_nationkey)
    cr = J.dim_join(c, t["region"], c.n_regionkey == t["region"].r_regionkey)
    return cr.select("c_custkey", "c_name", "n_name", "r_name")


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps customers without orders (J2 semantics, batch form)."""
    t = load_tables(spark, sf_dir)
    joined = t["customer"].join(
        t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
    return joined.groupBy("c_custkey").agg(
        F.count(F.col("o_orderkey")).alias("n_orders"),
        sum_money(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spend"),
    )


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (J3 semantics, batch form)."""
    t = load_tables(spark, sf_dir)
    buyers = (t["orders"].groupBy("o_custkey")
              .agg(F.count("*").alias("n_orders"))
              .withColumnRenamed("o_custkey", "custkey"))
    rich = (t["customer"].filter(F.col("c_acctbal") > 0)
            .select(F.col("c_custkey").alias("custkey"),
                    F.col("c_acctbal")))
    out = buyers.join(rich, "custkey", "full_outer")
    return out.select(
        "custkey",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal"),
    )


def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: revenue per nation (J4 chained joins).

    lineitem⋈orders⋈customer shuffle on their keys; nation/region broadcast.
    """
    t = load_tables(spark, sf_dir)
    li, o, c, s, n, r = (t["lineitem"], t["orders"], t["customer"],
                         t["supplier"], t["nation"], t["region"])
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    rev = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    return (j.groupBy("n_name", "r_name")
             .agg(F.sum(rev).cast("double").alias("revenue"),
                  F.count("*").alias("n_items")))


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream-stream join, batch analog (J1, ±10s JoinWindows).

    click→purchase pairs per user within ±1 h — same plan shape as the
    streaming version in streaming/joins.py (which uses the reference's ±10 s).
    """
    t = load_tables(spark, sf_dir)
    clicks = t["events"].filter(F.col("event_type") == "click")
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    j = J.interval_join(clicks, purchases, key="user_id", ts="ts",
                        window_ms=3_600_000)
    return j.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations (A1-A4 + the Spark-native extensions)
# ---------------------------------------------------------------------------

def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped full aggregate battery over lineitem."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = F.col("l_quantity").cast(agg.DEC)
    ep = F.col("l_extendedprice").cast(agg.DEC)
    disc = F.col("l_discount").cast(agg.DEC)
    tax = F.col("l_tax").cast(agg.DEC)
    one = F.lit(1).cast(agg.DEC)
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(ep).cast("double").alias("sum_base_price"),
        F.sum(ep * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(ep * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    ))


def q_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/sum/avg/count + distinct-count per group (events by type)."""
    t = load_tables(spark, sf_dir)
    v = F.col("value").cast(agg.DEC)
    return t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(v).cast("double").alias("sum_value"),
        (F.sum(v).cast("double") / F.count("value")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup (Spark-native extension of the agg surface)."""
    t = load_tables(spark, sf_dir)
    return (t["orders"]
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 sum_money("o_totalprice", "total"))
            .select(
                F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("prio"),
                "n", "total"))


# ---------------------------------------------------------------------------
# §2.5 window functions / §2.6 sorts, limits, set ops
# ---------------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — ranking window, deterministic ties."""
    t = load_tables(spark, sf_dir)
    w = (Window.partitionBy("o_custkey")
               .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return (t["orders"]
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rk"))


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag over an ordered per-user event frame."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast(agg.DEC)
    return t["events"].select(
        "user_id", "event_id",
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("double").alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price with total tie-break (sort + limit)."""
    t = load_tables(spark, sf_dir)
    return (t["orders"]
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets from two predicates."""
    t = load_tables(spark, sf_dir)
    open_buyers = (t["orders"].filter(F.col("o_orderstatus") == "O")
                   .select(F.col("o_custkey").alias("custkey")).distinct())
    done_buyers = (t["orders"].filter(F.col("o_orderstatus") == "F")
                   .select(F.col("o_custkey").alias("custkey")).distinct())
    u = open_buyers.union(done_buyers).distinct().withColumn("op", F.lit("union"))
    i = open_buyers.intersect(done_buyers).withColumn("op", F.lit("intersect"))
    e = open_buyers.exceptAll(done_buyers).withColumn("op", F.lit("except"))
    return u.union(i).union(e)


# ---------------------------------------------------------------------------
# §2.8 event-time windows (ST7), batch form
# ---------------------------------------------------------------------------

def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type."""
    t = load_tables(spark, sf_dir)
    v = F.col("value").cast(agg.DEC)
    return agg.tumbling(
        t["events"], "ts", "1 hour", "event_type",
        aggs=[F.count("*").alias("n"),
              F.sum(v).cast("double").alias("sum_value")])


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding by 30 min per event_type (each event in 2 windows)."""
    t = load_tables(spark, sf_dir)
    return agg.sliding(
        t["events"], "ts", "1 hour", "30 minutes", "event_type",
        aggs=[F.count("*").alias("n")])


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with 10-minute inactivity gap."""
    t = load_tables(spark, sf_dir)
    return agg.session(
        t["events"], "ts", "10 minutes", "user_id",
        aggs=[F.count("*").alias("n_events")])


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "wordcount": q_wordcount,
    "select_project": q_select_project,
    "filter": q_filter,
    "flatmap_rekey": q_flatmap_rekey,
    "scalar_functions": q_scalar_functions,
    "json_extract": q_json_extract,
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_outer": q_join_outer,
    "multiway_join": q_multiway_join,
    "interval_join": q_interval_join,
    "agg_pricing": q_agg_pricing,
    "groupby_stats": q_groupby_stats,
    "rollup": q_rollup,
    "window_rank": q_window_rank,
    "window_running": q_window_running,
    "topk": q_topk,
    "set_ops": q_set_ops,
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "session_window": q_session_window,
}

ORACLE: dict[str, str] = {
    "wordcount": """
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS word
              FROM documents) t
        WHERE length(word) > 0
        GROUP BY word
    """,
    "select_project": """
        SELECT o_orderkey AS okey, o_custkey AS ckey,
               o_totalprice * 1.1 AS adj_price,
               o_orderpriority AS prio
        FROM orders
    """,
    "filter": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    """,
    "flatmap_rekey": """
        SELECT word, count(*) AS occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\W+')) AS word
              FROM documents) t
        WHERE length(word) > 0
        GROUP BY word
    """,
    "scalar_functions": """
        SELECT o_orderkey AS okey,
               upper(o_orderpriority) AS prio_upper,
               substring(o_orderstatus, 1, 1) AS status_c,
               concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               round(o_totalprice, 0) AS price_rounded,
               abs(o_totalprice - 100000.0) AS price_dist,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len
        FROM orders
    """,
    "json_extract": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
               event_type
        FROM events
    """,
    "join_inner": """
        SELECT c_custkey, c_name, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "join_left": """
        SELECT c_custkey,
               count(o_orderkey) AS n_orders,
               CAST(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_outer": """
        WITH buyers AS (
            SELECT o_custkey AS custkey, count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ), rich AS (
            SELECT c_custkey AS custkey, c_acctbal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT coalesce(buyers.custkey, rich.custkey) AS custkey,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(c_acctbal, 0.0) AS acctbal
        FROM buyers FULL OUTER JOIN rich ON buyers.custkey = rich.custkey
    """,
    "multiway_join": """
        SELECT n_name, r_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
    """,
    "interval_join": """
        SELECT c.user_id AS user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts - INTERVAL 1 HOUR
         AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    "agg_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "groupby_stats": """
        SELECT event_type,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    "rollup": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders) t
        WHERE rk <= 3
    """,
    "window_running": """
        SELECT user_id, event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_value,
               lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
        FROM events
    """,
    "topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "set_ops": """
        WITH o AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                   WHERE o_orderstatus = 'O'),
             f AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                   WHERE o_orderstatus = 'F')
        SELECT custkey, 'union' AS op FROM (SELECT custkey FROM o UNION SELECT custkey FROM f)
        UNION ALL
        SELECT custkey, 'intersect' AS op FROM (SELECT custkey FROM o INTERSECT SELECT custkey FROM f)
        UNION ALL
        SELECT custkey, 'except' AS op FROM (SELECT custkey FROM o EXCEPT SELECT custkey FROM f)
    """,
    "tumbling_window": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               date_trunc('hour', ts) AS window_start
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    """,
    "sliding_window": """
        WITH slid AS (
            SELECT event_type,
                   make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT)) AS w0,
                   make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800) * 1000000 AS BIGINT)) AS w1
            FROM events)
        SELECT event_type, count(*) AS n, window_start FROM (
            SELECT event_type, w0 AS window_start FROM slid
            UNION ALL
            SELECT event_type, w1 AS window_start FROM slid) t
        GROUP BY event_type, window_start
    """,
    "session_window": """
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
            FROM marked)
        SELECT user_id, count(*) AS n_events, min(ts) AS session_start
        FROM sessions
        GROUP BY user_id, session_id
    """,
}
