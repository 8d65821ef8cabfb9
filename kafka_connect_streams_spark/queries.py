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
from kafka_connect_streams_spark.operators.aggregations import sum_money
from kafka_connect_streams_spark.operators.bpe import bpe_round_sql
from kafka_connect_streams_spark.operators.layout import zorder_sql
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
    """UNION / INTERSECT / EXCEPT over customer-key sets from two predicates.

    Computed as ONE aggregation with membership flags instead of six
    scans/shuffles of naive union/intersect/except branches — the single-pass
    formulation every set op over the same inputs reduces to at scale.
    (The native operators themselves are exercised in tests/test_operators_batch.)
    """
    t = load_tables(spark, sf_dir)
    flags = (t["orders"]
             .filter(F.col("o_orderstatus").isin("O", "F"))
             .groupBy(F.col("o_custkey").alias("custkey"))
             .agg(F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("has_o"),
                  F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("has_f")))
    u = flags.select("custkey").withColumn("op", F.lit("union"))
    i = (flags.filter((F.col("has_o") == 1) & (F.col("has_f") == 1))
         .select("custkey").withColumn("op", F.lit("intersect")))
    e = (flags.filter((F.col("has_o") == 1) & (F.col("has_f") == 0))
         .select("custkey").withColumn("op", F.lit("except")))
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
# extended relational coverage (Spark-native surface beyond the reference)
# ---------------------------------------------------------------------------

def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    t = load_tables(spark, sf_dir)
    return (t["orders"]
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"))
            .select(F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
                    F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("prio"),
                    "n"))


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins: customers with vs without open orders."""
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "O")
    semi = (t["customer"].join(open_orders,
                               t["customer"].c_custkey == open_orders.o_custkey,
                               "left_semi")
            .select("c_custkey").withColumn("op", F.lit("semi")))
    anti = (t["customer"].join(open_orders,
                               t["customer"].c_custkey == open_orders.o_custkey,
                               "left_anti")
            .select("c_custkey").withColumn("op", F.lit("anti")))
    return semi.union(anti)


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wider string surface: trim/pad/replace/regexp/reverse/position/repeat."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select(
        F.col("c_custkey"),
        F.trim(F.col("c_name")).alias("trimmed"),
        F.lpad(F.col("c_mktsegment"), 12, "_").alias("lpadded"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("rpadded"),
        F.regexp_replace(F.col("c_name"), "[0-9]+", "#").alias("no_digits"),
        F.reverse(F.col("c_mktsegment")).alias("rev"),
        F.instr(F.col("c_name"), "er").alias("pos_er"),
        F.repeat(F.col("c_mktsegment"), 2).alias("doubled"),
        F.substring(F.col("c_name"), 1, 8).alias("prefix8"),
    )


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface over orders + events timestamps."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        F.col("o_orderkey"),
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1999-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_1999"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + post-aggregation filter (KTable filter semantics)."""
    t = load_tables(spark, sf_dir)
    return (t["orders"].groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"),
                 sum_money("o_totalprice", "spend"))
            .filter(F.col("n_orders") >= 3))


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation: order counts per status column."""
    t = load_tables(spark, sf_dir)
    s = F.col("o_orderstatus")
    return t["orders"].groupBy("o_orderpriority").agg(
        F.sum(F.when(s == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(s == "F", 1).otherwise(0)).alias("n_done"),
        F.sum(F.when(s == "P", 1).otherwise(0)).alias("n_pending"),
    )


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via Spark SQL (decorrelated by Catalyst to a semi join)."""
    from kafka_connect_streams_spark.catalog import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """)


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (exact dedup of a key combination)."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: dedup / similarity / text / multimodal
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint groupBy (keep smallest doc_id)."""
    from kafka_connect_streams_spark.operators.dedup import exact_dedup
    t = load_tables(spark, sf_dir)
    return exact_dedup(t["documents"], "text", "doc_id")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4×4) near-dup candidate pairs with est. Jaccard."""
    from kafka_connect_streams_spark.operators.dedup import minhash_lsh_dedup
    t = load_tables(spark, sf_dir)
    return minhash_lsh_dedup(t["documents"], "text", "doc_id",
                             n=3, k=16, bands=4, rows=4, threshold=0.25)


def q_dedup_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation MinHash + LSH near-dup pairs
    (operators/dedup.py oph_signatures_wide / oph_lsh_dedup — Li-Owen-
    Zhang one-permutation hashing with Shrivastava-Li rotation
    densification): ONE hash per shingle partitions the hash space
    into k=16 residue bins, slot = per-bin min, empty bins borrow
    cyclically-right with a disjointness offset; then the SAME 4×4
    banding, bucket self-join and slot-agreement estimator as
    dedup_minhash_lsh, at ~1/k of the per-shingle signature CPU — the
    scale path when the shingle side dominates (it does at 100 TB).
    Identical parameters to dedup_minhash_lsh (n=3, k=16, 4×4, 0.25)
    so q_oph_recall's comparison is apples-to-apples."""
    from kafka_connect_streams_spark.operators.dedup import oph_lsh_dedup
    t = load_tables(spark, sf_dir)
    return oph_lsh_dedup(t["documents"], "text", "doc_id",
                         n=3, k=16, bands=4, rows=4, threshold=0.25)


def q_oph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured OPH-vs-classic agreement (the lsh_tuning / dedup_recall
    precedent — the cheaper signature's price is a NUMBER, not a
    claim): the thresholded pair sets of dedup_minhash_lsh and
    dedup_oph under identical parameters, full-outer-joined on the
    pair key, reported as one bounded row (n_minhash, n_oph, n_common).
    Both pair sets are banding-bounded; the join is pair-key equi —
    nothing corpus-proportional beyond the two pipelines
    themselves."""
    from kafka_connect_streams_spark.operators.dedup import (
        minhash_lsh_dedup, oph_lsh_dedup)
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    classic = (minhash_lsh_dedup(docs, "text", "doc_id",
                                 n=3, k=16, bands=4, rows=4,
                                 threshold=0.25)
               .select("id_a", "id_b", F.lit(1).alias("_c")))
    oph = (oph_lsh_dedup(docs, "text", "doc_id",
                         n=3, k=16, bands=4, rows=4, threshold=0.25)
           .select("id_a", "id_b", F.lit(1).alias("_o")))
    both = classic.join(oph, ["id_a", "id_b"], "full")
    return both.agg(
        F.sum(F.coalesce("_c", F.lit(0))).cast("bigint")
         .alias("n_minhash"),
        F.sum(F.coalesce("_o", F.lit(0))).cast("bigint").alias("n_oph"),
        F.sum(F.when(F.col("_c").isNotNull() & F.col("_o").isNotNull(),
                     F.lit(1)).otherwise(F.lit(0))).cast("bigint")
         .alias("n_common"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document."""
    from kafka_connect_streams_spark.operators.dedup import simhash
    t = load_tables(spark, sf_dir)
    return simhash(t["documents"], "text", "doc_id", bits=16)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard on pairs sharing a rare shingle."""
    from kafka_connect_streams_spark.operators.dedup import ngram_jaccard_pairs
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"], "text", "doc_id",
                               n=5, max_doc_freq=100, threshold=0.05)


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 neighbors for sampled query vectors."""
    from kafka_connect_streams_spark.operators.similarity import topk_cosine
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    queries = emb.filter(F.col("id") % 100 == 0)
    return topk_cosine(queries, emb, k=5)


def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-5 (random-hyperplane buckets, scale path)."""
    from kafka_connect_streams_spark.operators.similarity import topk_cosine_lsh
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    queries = emb.filter(F.col("id") % 100 == 0)
    return topk_cosine_lsh(queries, emb, k=5, planes=6)


def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index quality eval: recall of MinHash-LSH candidate pairs
    against the EXACT set of near-dup pairs (full n-gram Jaccard ≥ 0.5,
    no stop-shingle cap — pairs sharing zero shingles have Jaccard 0, so
    the shared-shingle join IS the complete ground truth). Also reports
    candidate-set size: together recall + |candidates| quantify the LSH
    quality/cost trade-off the banding parameters buy. Deterministic
    (md5-seeded hashes both sides), so the number itself is hash-verified."""
    from kafka_connect_streams_spark.operators.dedup import (
        lsh_candidate_pairs_wide, minhash_signatures_wide,
        ngram_jaccard_pairs, shingles)
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    exact = (ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                 max_doc_freq=1 << 40, threshold=0.5)
             .select("id_a", "id_b"))
    sigs = minhash_signatures_wide(shingles(docs, "text", "doc_id", n=3),
                                   "doc_id", k=16)
    cand = lsh_candidate_pairs_wide(sigs, "doc_id", bands=4, rows=4)
    stats = (exact.join(cand.withColumn("_hit", F.lit(1)),
                        ["id_a", "id_b"], "left")
             .agg(F.count("*").alias("n_exact"),
                  F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits")))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    # exact integer fixed-point (floor(hits·1e9/exact)) — double ROUND ties
    # at the 9th digit diverge across engines
    return (stats.join(n_cand)
            .select(F.expr("(n_hits * CAST(1000000000 AS BIGINT))"
                           " DIV n_exact").alias("recall_e9"),
                    "n_exact", "n_candidates"))


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality eval: recall@5 of BOTH approximate indexes (hyperplane
    LSH and IVF-Flat) against the exact brute-force neighbors, as one plan.
    Each index's quality becomes a MEASURED, hash-verified number (all three
    algorithms are deterministic, so recall is too) — the eval loop a
    production ANN deployment runs before trusting an index, kept entirely
    distributed (per-query hit counts, scalar sums at the end)."""
    from kafka_connect_streams_spark.operators.similarity import (
        _qvecs, hyperplane_signatures, topk_cosine, topk_cosine_ivf,
        topk_cosine_lsh)
    t = load_tables(spark, sf_dir)
    # r14: pin the corpus (≥8 consumers across the three legs — each
    # leg's signature/codebook/qvec subtrees re-scanned the parquet) and
    # the exact top-5 (3 consumers: both hit joins + k_actual).
    # r14 batch 2 ("not yet" #1): the three legs now SHARE one pinned
    # quantized table and one pinned signature table — before, each leg
    # re-ran the quantize+norm fold per side (≈8 derivations) and the
    # LSH leg hashed queries and candidates separately even though
    # queries ⊂ candidates (the filter commutes with the per-row map,
    # so sig.filter IS the query-side signature table). EAGER per the
    # measured parallel-consumer rule.
    emb = (t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
           .localCheckpoint(eager=False))
    queries = emb.filter(F.col("id") % 100 == 0)
    qv = _qvecs(emb, "id", "embedding", "id", "_v", "n") \
        .localCheckpoint(eager=True)
    qq = qv.filter(F.col("id") % 100 == 0)
    sig = hyperplane_signatures(emb, "id", "embedding", 6,
                                _join_key=True).localCheckpoint(eager=True)
    exact = (topk_cosine(queries, emb, k=5, _q=qq, _c=qv)
             .select("q_id", "c_id")
             .localCheckpoint(eager=False))

    def hits_of(approx, name):
        return (exact.join(approx.select("q_id", "c_id"), ["q_id", "c_id"])
                .groupBy("q_id").agg(F.count("*").alias(name)))

    h_lsh = hits_of(topk_cosine_lsh(
        queries, emb, k=5, planes=6, _q=qq, _c=qv,
        _qs=sig.filter(F.col("id") % 100 == 0), _cs=sig), "h_lsh")
    h_ivf = hits_of(topk_cosine_ivf(queries, emb, k=5, n_centroids=16,
                                    nprobe=4, _q=qq, _c=qv), "h_ivf")
    per_q = (exact.groupBy("q_id").agg(F.count("*").alias("k_actual"))
             .join(h_lsh, "q_id", "left").join(h_ivf, "q_id", "left")
             .select(F.coalesce("h_lsh", F.lit(0)).alias("h_lsh"),
                     F.coalesce("h_ivf", F.lit(0)).alias("h_ivf"),
                     "k_actual"))
    # exact integer fixed-point recall (see q_dedup_recall)
    recall = lambda c: F.expr(  # noqa: E731
        f"(sum({c}) * CAST(1000000000 AS BIGINT)) DIV sum(k_actual)")
    return per_q.agg(recall("h_lsh").alias("recall_lsh_e9"),
                     recall("h_ivf").alias("recall_ivf_e9"),
                     F.count("*").alias("n_queries"))


def q_ann_auto_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@5 with AUTO-SIZED indexes: ``planes=None`` →
    ``auto_planes(N)`` and ``n_centroids=None`` → ``auto_centroids(N)``
    (operators/similarity.py:40,52). Sizing is a pure function of the corpus
    row count, so the result is deterministic and hash-verifiable — this is
    the query that proves the 100×-scale auto-sizing path, not just the
    hand-tuned constants."""
    from kafka_connect_streams_spark.operators.similarity import (
        _qvecs, auto_centroids, auto_planes, hyperplane_signatures,
        topk_cosine, topk_cosine_ivf, topk_cosine_lsh)
    t = load_tables(spark, sf_dir)
    # r14: same pinning and leg-sharing as q_ann_recall; the auto
    # sizes are resolved HERE from the pinned corpus count — the exact
    # expressions topk_cosine_lsh(planes=None) / topk_cosine_ivf(
    # n_centroids=None) evaluate (auto_planes/auto_centroids of the
    # candidate count) — so the shared signature table is built with
    # the same planes the operator would choose
    emb = (t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
           .localCheckpoint(eager=False))
    n = emb.count()
    planes, n_cent = auto_planes(n), auto_centroids(n)
    queries = emb.filter(F.col("id") % 100 == 0)
    qv = _qvecs(emb, "id", "embedding", "id", "_v", "n") \
        .localCheckpoint(eager=True)
    qq = qv.filter(F.col("id") % 100 == 0)
    sig = hyperplane_signatures(emb, "id", "embedding", planes,
                                _join_key=True).localCheckpoint(eager=True)
    exact = (topk_cosine(queries, emb, k=5, _q=qq, _c=qv)
             .select("q_id", "c_id")
             .localCheckpoint(eager=False))

    def hits_of(approx, name):
        return (exact.join(approx.select("q_id", "c_id"), ["q_id", "c_id"])
                .groupBy("q_id").agg(F.count("*").alias(name)))

    h_lsh = hits_of(topk_cosine_lsh(
        queries, emb, k=5, planes=planes, _q=qq, _c=qv,
        _qs=sig.filter(F.col("id") % 100 == 0), _cs=sig), "h_lsh")
    h_ivf = hits_of(topk_cosine_ivf(queries, emb, k=5, n_centroids=n_cent,
                                    nprobe=4, _q=qq, _c=qv), "h_ivf")
    per_q = (exact.groupBy("q_id").agg(F.count("*").alias("k_actual"))
             .join(h_lsh, "q_id", "left").join(h_ivf, "q_id", "left")
             .select(F.coalesce("h_lsh", F.lit(0)).alias("h_lsh"),
                     F.coalesce("h_ivf", F.lit(0)).alias("h_ivf"),
                     "k_actual"))
    recall = lambda c: F.expr(  # noqa: E731
        f"(sum({c}) * CAST(1000000000 AS BIGINT)) DIV sum(k_actual)")
    return per_q.agg(recall("h_lsh").alias("recall_lsh_e9"),
                     recall("h_ivf").alias("recall_ivf_e9"),
                     F.count("*").alias("n_queries"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the user's most recent click at or
    before it (union + carry-forward window — one shuffle, no range blow-up).

    The operator Spark lacks natively (SURVEY.md §2.3 gap list); DuckDB's
    native ASOF JOIN is the oracle.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    # one deterministic right row per (user, ts): keep the highest event_id
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max_by("value", "event_id").alias("click_value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"), "user_id",
                         "ts", F.col("value").alias("purchase_value")))
    return J.asof_join(purchases, clicks, key="user_id", ts="ts",
                       right_cols=["click_value"], right_ts_alias="click_ts")


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 20% of their part's
    average quantity.

    The correlated scalar subquery decorrelates to groupBy + equi-join (the
    reduction runs before the join, so the join input is one row per part).
    The threshold test is exact integer/decimal arithmetic
    (qty·5·cnt < sum_qty) — no engine-dependent float rounding at the
    boundary.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    qty = F.col("l_quantity").cast(agg.DEC)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count("*").alias("cnt"))
    j = li.join(per_part, "l_partkey").filter(
        F.col("l_quantity").cast(agg.DEC) * 5 * F.col("cnt") < F.col("sum_qty"))
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast(agg.DEC)).cast("double") / 7.0)
        .alias("avg_yearly"),
        F.count("*").alias("n_items"))


def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation by account balance (grouped top-k)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey"))
    top = (t["supplier"]
           .withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= 3))
    return (top.join(F.broadcast(t["nation"]),
                     top.s_nationkey == F.col("n_nationkey"))
            .select("n_name", "s_suppkey", "s_name", "s_acctbal", "rnk"))


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: open-order revenue share per priority
    (CASE WHEN inside SUM — the market-share shape).

    The share is exact integer fixed-point — floor(open·1e9 / total) computed
    entirely in the decimal/integer domain — because ROUND(double, 9) ties at
    the 9th digit round differently across engines (Spark HALF_UP on the
    decimal string vs binary-double nearest)."""
    t = load_tables(spark, sf_dir)
    price = F.col("o_totalprice").cast(agg.DEC)
    is_open = F.col("o_orderstatus") == "O"
    g = t["orders"].groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(is_open, 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(is_open, price).otherwise(F.lit(0).cast(agg.DEC)))
        .alias("open_dec"),
        F.sum(price).alias("total_dec"))
    return g.select(
        "o_orderpriority", "n_orders", "n_open",
        F.col("open_dec").cast("double").alias("open_revenue"),
        F.expr("(CAST(open_dec * 100 AS DECIMAL(38,0)) * 1000000000)"
               " DIV CAST(total_dec * 100 AS DECIMAL(38,0))")
        .alias("open_share_e9"))


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percentiles (median + p75 of order value per status).

    Engine-agnostic discrete convention — the value at 1-based rank
    ``ceil(q·n)`` under a total order — computed with rank/count windows, not
    ``collect_list`` (stays distributed at 100 TB; q ∈ {0.5, 0.75} are exact
    binary fractions so ceil() is deterministic across engines).
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    cw = Window.partitionBy("o_orderstatus")
    ranked = (t["orders"]
              .select("o_orderstatus", "o_totalprice", "o_orderkey")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(cw)))
    at = lambda q: F.max(F.when(  # noqa: E731
        F.col("rn") == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
        F.col("o_totalprice")))
    return ranked.groupBy("o_orderstatus").agg(
        at(0.5).alias("median_price"), at(0.75).alias("p75_price"))


def q_ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat cosine top-5 (16-centroid codebook, 4 probes, scale path)."""
    from kafka_connect_streams_spark.operators.similarity import topk_cosine_ivf
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    queries = emb.filter(F.col("id") % 100 == 0)
    return topk_cosine_ivf(queries, emb, k=5, n_centroids=16, nprobe=4)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-bucketed, cosine ≥ 0.35)."""
    from kafka_connect_streams_spark.operators.similarity import neardup_pairs
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    return neardup_pairs(emb, planes=8, threshold=0.35)



def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-modality dedup clusters: LSH-bucketed cosine near-dup pairs
    (operators/similarity.py) fed into large-star/small-star connected
    components (operators/dedup.py) — the cross-modality composition a
    multimodal dedup pipeline runs (near-dup detection by embedding, cluster
    resolution by graph), with one canonical vector (min id) per cluster."""
    from kafka_connect_streams_spark.operators.dedup import (
        connected_components)
    from kafka_connect_streams_spark.operators.similarity import neardup_pairs
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    pairs = neardup_pairs(emb, planes=8, threshold=0.35) \
        .select("id_a", "id_b")
    labels = connected_components(pairs).withColumnRenamed("node", "id")
    return (emb.select(F.col("id").cast("bigint").alias("id"))
            .join(labels, "id", "left")
            .select("id",
                    F.coalesce("label", F.col("id")).alias("cluster_id"))
            .withColumn("is_canonical", F.col("id") == F.col("cluster_id")))


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch distinct-count (approx_count_distinct) per event type,
    verified against the exact count in the same plan.

    HLL registers differ across engines, so the raw sketch value cannot be
    hash-compared to a DuckDB oracle. Instead the query emits the *exact*
    distinct count (cross-engine deterministic) plus a tolerance flag
    ``|approx − exact| ≤ 2·rsd·exact`` computed Spark-side; the oracle emits
    the exact aggregates and literal TRUE. A sketch regression beyond the
    published error bound therefore flips the flag and fails the hash
    check — a full correctness row, not rows-only.
    """
    t = load_tables(spark, sf_dir)
    rsd = 0.02
    agg_df = t["events"].groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
        F.count("*").alias("n"))
    tol = F.lit(2.0 * rsd) * F.col("exact_users")
    return agg_df.select(
        "event_type", "exact_users", "n",
        (F.abs(F.col("approx") - F.col("exact_users")) <= tol)
        .alias("approx_ok"))


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace / regex-word / BPE-ish token counts."""
    from kafka_connect_streams_spark.operators.text import token_stats
    t = load_tables(spark, sf_dir)
    return token_stats(t["documents"], "text", "doc_id")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length/punct/stopword ratios."""
    from kafka_connect_streams_spark.operators.text import quality_score
    t = load_tables(spark, sf_dir)
    return quality_score(t["documents"], "text", "doc_id")


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification with argmax prediction."""
    from kafka_connect_streams_spark.operators.text import language_id
    t = load_tables(spark, sf_dir)
    return language_id(t["documents"], "text", "doc_id")


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical token-set fingerprint (order/repetition-insensitive)."""
    from kafka_connect_streams_spark.operators.text import fingerprint
    t = load_tables(spark, sf_dir)
    return fingerprint(t["documents"], "text", "doc_id")



def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals (distinct-token ratio,
    top-token share, duplicate-bigram fraction) as exact e9 fixed-point —
    the boilerplate/spam filters of a training-data quality pipeline."""
    from kafka_connect_streams_spark.operators.text import repetition_signals
    t = load_tables(spark, sf_dir)
    return repetition_signals(t["documents"], "text", "doc_id")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column → Arrow-batched mapInPandas feature extraction."""
    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, decode_features)
    t = load_tables(spark, sf_dir)
    return decode_features(attach_payload(t["documents"], "text", "doc_id"))


def q_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: N evenly-spaced frames per payload,
    1→N expansion streamed through Arrow batches (never a materialized
    per-doc frame list). Frame bytes are md5-fingerprinted at the exact
    seam where an ffmpeg seek-decode would plug in."""
    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, sample_frames)
    t = load_tables(spark, sf_dir)
    return sample_frames(attach_payload(t["documents"], "text", "doc_id"),
                         n_frames=4)


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: quality filter → exact dedup → near-dup dedup →
    deterministic split → per-split corpus stats, one declarative plan."""
    from kafka_connect_streams_spark.operators.pipelines import (
        training_pipeline)
    t = load_tables(spark, sf_dir)
    return training_pipeline(t["documents"], "text", "doc_id",
                             min_quality=0.5, train=80, valid=10)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components: one canonical doc per cluster
    (min-label propagation over the 5-gram Jaccard pair graph)."""
    from kafka_connect_streams_spark.operators.dedup import neardup_clusters
    t = load_tables(spark, sf_dir)
    return neardup_clusters(t["documents"], "text", "doc_id",
                            n=5, max_doc_freq=100, threshold=0.05)



def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the power-law sanity check run
    BEFORE deduping a corpus at scale (one giant boilerplate cluster means
    the pair thresholds are wrong; deduping would delete real data). One
    row per cluster size: how many clusters, how many docs they hold, and
    the share of the corpus that dedup would drop at that size
    (docs - clusters survivors), all exact integers."""
    from kafka_connect_streams_spark.operators.dedup import neardup_clusters
    t = load_tables(spark, sf_dir)
    clusters = neardup_clusters(t["documents"], "text", "doc_id",
                                n=5, max_doc_freq=100, threshold=0.05)
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (per_cluster.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).alias("n_docs"),
        (F.count("*") * (F.col("cluster_size") - 1)).alias("n_dropped")))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by TF-IDF (integer-ordered
    ranking). The float score is dropped from the verified output — JVM
    Math.log and libm ln differ by 1 ULP — and replaced by ``n_docs``, from
    which tfidf = tf·ln((n_docs+1)/(df+1)) is exactly reconstructible."""
    from kafka_connect_streams_spark.operators.text import tfidf_topk
    t = load_tables(spark, sf_dir)
    out = tfidf_topk(t["documents"], "text", "doc_id", k=5).drop("tfidf")
    n = t["documents"].agg(F.count("*").alias("n_docs"))
    return out.join(F.broadcast(n))  # 1-row broadcast, no driver round-trip


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by md5(id) bucket —
    stable under repartitioning/retries/appends, unlike seeded rand()."""
    from kafka_connect_streams_spark.operators.text import hash_split
    t = load_tables(spark, sf_dir)
    return hash_split(t["documents"], "doc_id", train=80, valid=10)


# ---------------------------------------------------------------------------
# extended relational surface, batch 3: grouping sets, window frames, band
# joins, event-funnel / cohort analytics (native Spark; KSQL 5.1 superset)
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — one Expand + one shuffle covers all three groupings
    (vs three separate scans+aggs); stays a single-pass plan at 100 TB."""
    t = load_tables(spark, sf_dir)
    return (t["orders"]
            .groupingSets([["o_orderstatus"], ["o_orderpriority"], []],
                          "o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"), sum_money("o_totalprice", "total"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
                    "n", "total"))


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of order value per customer (ROWS frame).

    The frame sum goes through exact DECIMAL and is cast to double *before*
    the divide, so both engines compute double/int64 — identical bits."""
    t = load_tables(spark, sf_dir)
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-6, 0))
    return t["orders"].select(
        "o_custkey", "o_orderkey",
        (F.sum(agg.dec("o_totalprice")).over(w).cast("double")
         / F.count("*").over(w)).alias("mov_avg7"))


def q_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per event, how many events this user emitted
    in the trailing hour (value-based frame → peer rows handled identically
    in every engine, no row-order nondeterminism on ts ties)."""
    t = load_tables(spark, sf_dir)
    return t["events"].select(
        "user_id", "event_id",
        F.expr("count(*) OVER (PARTITION BY user_id ORDER BY ts "
               "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")
        .alias("n_last_hour"))


def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles within status + first/last order per customer
    (full-partition frame). Partitioned ntile, not global — a global ntile
    would force a single-partition window at scale."""
    t = load_tables(spark, sf_dir)
    wq = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    wc = (Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return t["orders"].select(
        "o_orderkey",
        F.ntile(4).over(wq).cast("int").alias("price_quartile"),
        F.first("o_orderkey").over(wc).alias("first_order"),
        F.last("o_orderkey").over(wc).alias("last_order"))


def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG shape): per-user event history.

    ``array_sort(collect_list(...))`` gives a canonical order regardless of
    shuffle arrival order — the distributed-safe way to make collect_list
    deterministic (event_id is unique, so the sort key is total)."""
    t = load_tables(spark, sf_dir)
    item = F.concat_ws(":", F.col("event_type"), F.col("event_id"))
    return (t["events"].groupBy("user_id")
            .agg(F.concat_ws(",", F.array_sort(F.collect_list(item)))
                 .alias("history"),
                 F.count("*").alias("n")))


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 undelivered orders by revenue for one segment.

    Filters reach the parquet scans (PushedFilters on c_mktsegment /
    o_orderdate / l_shipdate); the group key is the order key so the agg
    shuffles once; total tie-break (revenue DESC, l_orderkey) makes LIMIT
    deterministic. Join sizing is left to AQE — customer is not broadcast
    because it is not a small dim at real scale."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(agg.dec("l_extendedprice")
                    * (1 - agg.dec("l_discount"))).cast("double")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(revenue.alias("revenue"))
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10))


#: quantity bands for the band (range) join — constant-size dim, broadcast.
QUANTITY_BANDS = [(0.0, 10.0, "XS"), (10.0, 20.0, "S"),
                  (20.0, 35.0, "M"), (35.0, 51.0, "L")]


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band (range) join: lineitems bucketed by quantity band.

    The band table is constant-size, so ``broadcast()`` turns the non-equi
    join into a BroadcastNestedLoopJoin with a 4-row build side — the only
    plan that survives 100 TB (a shuffle range-join here would be absurd)."""
    t = load_tables(spark, sf_dir)
    # VALUES literal, not createDataFrame: the band table is born JVM-side
    # (LocalRelation), skipping Python→JVM serialization on every call
    rows = ", ".join(f"({lo}D, {hi}D, '{b}')" for lo, hi, b in QUANTITY_BANDS)
    bands = spark.sql(f"SELECT * FROM VALUES {rows} AS b(lo, hi, band)")
    return (t["lineitem"]
            .join(F.broadcast(bands),
                  (F.col("l_quantity") >= F.col("lo"))
                  & (F.col("l_quantity") < F.col("hi")))
            .groupBy("band")
            .agg(F.count("*").alias("n"),
                 sum_money("l_extendedprice", "total_price")))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential event funnel: view → later click → later purchase.

    Each stage is a groupBy-min over the previous stage's users — three
    keyed shuffles on user_id that AQE co-partitions; no window over the
    full event stream, so state is O(users) not O(events)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]

    def stage(event_type: str, prev: DataFrame | None, prev_t: str | None,
              t_col: str) -> DataFrame:
        s = ev.filter(F.col("event_type") == event_type).alias("e")
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("e.ts") > F.col(prev_t))
        return s.groupBy("user_id").agg(F.min("e.ts").alias(t_col))

    v = stage("view", None, None, "t1")
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")
    count = lambda df, name: (  # noqa: E731
        df.agg(F.count("*").alias("users")).select(F.lit(name).alias("stage"),
                                                   "users"))
    return (count(v, "1_view")
            .unionByName(count(c, "2_click"))
            .unionByName(count(p, "3_purchase")))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    day-offset of later activity. distinct() runs before the join so the
    join input is O(user·active-days), not O(events)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    return (activity.join(first, "user_id")
            .select("cohort_day",
                    F.datediff("day", "cohort_day").cast("int")
                    .alias("day_offset"))
            .groupBy("cohort_day", "day_offset")
            .agg(F.count("*").alias("users")))


def q_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: replace-all, group extract, match predicate — all
    JVM-side codegen expressions (KSQL 5.1 has none of these; Spark SQL is
    the strict superset SURVEY §2.7 promises)."""
    t = load_tables(spark, sf_dir)
    # NULL-text policy: regex over coalesce(text, '') so a NULL doc yields
    # ('', '', false, 0), never NULLs (which also represent differently
    # across engines: Spark NULL boolean vs DuckDB→pandas NaN)
    body = F.coalesce(F.col("text"), F.lit(""))
    return t["documents"].select(
        "doc_id",
        F.regexp_replace(body, "[0-9]+", "#").alias("digits_masked"),
        F.regexp_extract(body, r"\b([A-Za-z]{4})[A-Za-z]*", 1)
        .alias("first_word4"),
        body.rlike("[0-9]").alias("has_digit"),
        F.size(F.regexp_extract_all(body, F.lit("[.!?]"), 0))
        .cast("bigint").alias("n_sentences"))


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: outer-join-produced nulls through nullif /
    coalesce / null-safe equality, with null-aware aggregation."""
    t = load_tables(spark, sf_dir)
    li = (t["lineitem"].groupBy("l_orderkey")
          .agg(F.count("*").alias("n_items")))
    j = t["orders"].join(li, t["orders"].o_orderkey == li.l_orderkey, "left")
    return (j.select(
        "o_orderkey",
        F.coalesce(F.col("n_items"), F.lit(0)).alias("items"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("closed_status"),
        F.col("n_items").isNull().alias("no_items"),
        F.col("n_items").eqNullSafe(F.lit(1)).alias("exactly_one"))
        .groupBy("closed_status")
        .agg(F.count("*").alias("n"),
             F.sum("items").alias("total_items"),
             F.sum(F.when(F.col("no_items"), 1).otherwise(0))
             .alias("n_no_items"),
             F.sum(F.when(F.col("exactly_one"), 1).otherwise(0))
             .alias("n_single_item")))


def q_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows (percent_rank, cume_dist): both are ratios of
    exact integer ranks under a total order, so the doubles are bit-identical
    across engines."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey", "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of near-dup candidates: exact Levenshtein
    only on pairs that already share a rare shingle — the verify step runs
    on O(candidates), never O(n²) texts."""
    from kafka_connect_streams_spark.operators.dedup import ngram_jaccard_pairs
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id",
                                n=5, max_doc_freq=100, threshold=0.05)
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    return (pairs.join(ta, "id_a").join(tb, "id_b")
            .select("id_a", "id_b", "jaccard",
                    F.levenshtein("text_a", "text_b").cast("bigint")
                    .alias("edit_distance"),
                    F.greatest(F.length("text_a"), F.length("text_b"))
                    .cast("bigint").alias("max_len")))


def q_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journeys: gap-sessionize, then the ordered event-type
    path per session, counted across sessions.

    The path is built from ``array_sort(collect_list(struct(ts, event_id,
    type)))`` — sorted on (ts, event_id), a total order, so the same path
    string emerges from any shuffle arrival order. Two shuffles (session
    windows + path count) and a top-k with full tie-break."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds on both engines (a seconds cast truncates
    # in Spark but keeps fractions in DuckDB's epoch() — boundary drift)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = t["events"].withColumn(
        "new_session",
        F.when(gap <= 600_000_000, F.lit(0)).otherwise(F.lit(1)))
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    paths = (sess.groupBy("user_id", "session_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("ts", "event_id", "event_type"))),
                     lambda x: x["event_type"]),
                 ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count("*").alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path")
            .limit(20))


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT/melt) of lineitem measures via stack() —
    a generated-column Expand, no shuffle, no Python."""
    t = load_tables(spark, sf_dir)
    return (t["lineitem"]
            .select("l_orderkey", "l_linenumber",
                    F.expr("stack(3, 'quantity', l_quantity, "
                           "'extendedprice', l_extendedprice, "
                           "'discount', l_discount) AS (measure, val)")))


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null rate / distinct / min / max) in ONE scan:
    all per-column aggregates in a single agg, reshaped long with stack —
    the profile of a 100 TB table costs one pass, not one pass per column."""
    t = load_tables(spark, sf_dir)
    wide = t["orders"].agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("min_custkey"),
        F.max("o_custkey").cast("string").alias("max_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").cast("string").alias("min_price"),
        F.max("o_totalprice").cast("string").alias("max_price"))
    return wide.select(
        F.col("n"),
        F.expr("stack(3, "
               "'o_custkey', nn_custkey, nd_custkey, min_custkey, max_custkey, "
               "'o_orderstatus', nn_status, nd_status, min_status, max_status, "
               "'o_totalprice', nn_price, nd_price, min_price, max_price) "
               "AS (col_name, n_nonnull, n_distinct, min_val, max_val)"))


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile, KLL-style) per status,
    verified in-plan against the exact rank-based percentile.

    Sketch internals differ engine-to-engine, so the raw sketch values can't
    be hash-compared to DuckDB. The query instead emits the exact discrete
    median/p75 (same ceil-rank convention percentile_disc pins) plus a
    tolerance flag asserting each sketch quantile lands within 1% relative
    error of its exact counterpart; the oracle emits the exact values and
    literal TRUE. The sketch path is what survives 100 TB when an exact
    total-order pass is too expensive — this row proves it stays inside its
    error bound.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    cw = Window.partitionBy("o_orderstatus")
    ranked = (t["orders"]
              .select("o_orderstatus", "o_totalprice", "o_orderkey")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(cw)))
    at = lambda q: F.max(F.when(  # noqa: E731
        F.col("rn") == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
        F.col("o_totalprice")))
    exact = ranked.groupBy("o_orderstatus").agg(
        at(0.5).alias("median_price"), at(0.75).alias("p75_price"),
        F.max("cnt").alias("n"))
    approx = (t["orders"].groupBy("o_orderstatus")
              .agg(F.percentile_approx("o_totalprice", [0.5, 0.75], 10000)
                   .alias("pq")))
    close = lambda a, e: (  # noqa: E731
        F.abs(a - F.col(e)) <= F.lit(0.01) * F.abs(F.col(e)))
    return (exact.join(approx, "o_orderstatus")
            .select("o_orderstatus", "median_price", "p75_price", "n",
                    (close(F.col("pq")[0], "median_price")
                     & close(F.col("pq")[1], "p75_price")).alias("approx_ok")))


# ---------------------------------------------------------------------------
# extended analytics battery (round 2): decision-support shapes over the full
# star schema + training-data pipeline primitives
# ---------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of STANDARD-part revenue sold into
    one region, per year. Two *roles* of the nation dim (supplier nation vs
    customer nation) — both broadcast; the only shuffles are the three fact
    joins' and the final year agg's."""
    t = load_tables(spark, sf_dir)
    vol = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    cust_nation = (t["customer"]
                   .join(F.broadcast(t["nation"]),
                         F.col("c_nationkey") == F.col("n_nationkey"))
                   .join(F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
                         F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("c_custkey"))
    supp_nation = (t["supplier"]
                   .join(F.broadcast(t["nation"]),
                         F.col("s_nationkey") == F.col("n_nationkey"))
                   .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    li = (t["lineitem"]
          .join(F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD")
                            .select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
          .join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
          .join(F.broadcast(supp_nation),
                F.col("l_suppkey") == F.col("s_suppkey")))
    target = F.when(F.col("supp_nation") == "NATION_3", vol) \
              .otherwise(F.lit(0).cast(agg.DEC))
    g = (li.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
         .agg(F.sum(target).alias("target_dec"),
              F.sum(vol).alias("vol_dec")))
    # exact fixed-point share (vol has scale 4 → ·10000 is integral)
    return g.select(
        "o_year",
        F.expr("(CAST(target_dec * 10000 AS DECIMAL(38,0)) * 1000000000)"
               " DIV CAST(vol_dec * 10000 AS DECIMAL(38,0))")
        .alias("mkt_share_e9"),
        F.col("vol_dec").cast("double").alias("total_volume"))


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of one month's revenue — the
    conditional-share aggregate over a fact-dim broadcast join."""
    t = load_tables(spark, sf_dir)
    vol = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    li = (t["lineitem"]
          .filter((F.col("l_shipdate") >= F.lit("1996-09-01"))
                  & (F.col("l_shipdate") < F.lit("1996-10-01")))
          .join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey")))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast(agg.DEC))
    g = li.agg(F.sum(promo).alias("promo_dec"), F.sum(vol).alias("vol_dec"),
               F.count("*").alias("n_lines"))
    # pct at e9 fixed point: floor(100·promo·1e9 / vol), exact integer math
    return g.select(
        F.expr("(CAST(promo_dec * 10000 AS DECIMAL(38,0)) * 100000000000)"
               " DIV CAST(vol_dec * 10000 AS DECIMAL(38,0))")
        .alias("promo_share_pct_e9"),
        "n_lines")


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in one
    quarter. Fact-fact join shuffles on the order key; customer and nation
    dims broadcast; the LIMIT is a deterministic ordered take."""
    t = load_tables(spark, sf_dir)
    rev = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01")))
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (li.join(orders.select("o_orderkey", "o_custkey"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t["customer"]),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


def q_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: this schema has no shipmode — linestatus
    plays the mode role): per linestatus, how many 1996-shipped lines belong
    to critical- vs normal-priority orders."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01")))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(t["orders"].select("o_orderkey", "o_orderpriority"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count")))


def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over a fact-dim join. Catalyst extracts
    the common l_quantity bounds and pushes the per-branch predicates below
    the join — the pushdown stress-test for disjunctions."""
    t = load_tables(spark, sf_dir)
    rev = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    j = t["lineitem"].join(F.broadcast(t["part"]),
                           F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand) & (F.col("p_size").between(1, smax))
        & qty.between(qlo, qhi))
    cond = (branch("Brand#1", 5, 1, 11)
            | branch("Brand#2", 10, 10, 20)
            | branch("Brand#3", 15, 20, 30))
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"))


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the global average
    balance with no recent orders (none since 1999) — scalar subquery
    (broadcast 1-row agg) + left-anti join, counted per nation."""
    t = load_tables(spark, sf_dir)
    bal = F.col("c_acctbal").cast(agg.DEC)
    avg_bal = (t["customer"].filter(bal > 0)
               .agg((F.sum(bal).cast("double") / F.count("*")).alias("avg_bal")))
    rich = (t["customer"]
            .join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal")))
    recent = (t["orders"]
              .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
              .select("o_custkey"))
    idle = rich.join(recent,
                     F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (idle.join(F.broadcast(t["nation"]),
                      F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count("*").alias("n_cust"),
                 F.sum(bal).cast("double").alias("total_bal")))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling: dominant 'en' kept at 10%,
    the tail at 50% — the corpus-rebalancing primitive, reproduced
    row-identically by the oracle (md5-bucket membership, no RNG)."""
    from kafka_connect_streams_spark.operators.text import stratified_sample
    t = load_tables(spark, sf_dir)
    return stratified_sample(
        t["documents"].select("doc_id", "lang", "source"),
        "doc_id", "lang", rates={"en": 10}, default_rate=50)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term scrubbing with per-doc hit counts (PII-removal shape;
    a term pattern stands in for email/phone regexes — the synthetic text
    has no digits). The REAL contact-string classes (email / IPv4 /
    phone) live in operators/pii.py since r14: q_pii_report /
    q_pii_mask run them over the deterministic md5 contact enrichment;
    this entry keeps the arbitrary-term-list shape (a blocklist scrub
    is a different production knob than the fixed PII classes)."""
    from kafka_connect_streams_spark.operators.text import redact_terms
    t = load_tables(spark, sf_dir)
    return redact_terms(t["documents"], "text", "doc_id",
                        r"\b(key|value|secret)\b")


def q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release over the customer table
    (operators/aggregations.py k_anonymize): quasi-identifiers
    (mktsegment, nationkey, acctbal bucket), k=5, two-level local
    recoding — full-QI groups ≥ 5 release as-is (level 0), smaller
    groups generalize nation+balance to '*' and re-count among the
    generalized rows (level 1), the remainder is fully suppressed
    (level 2). The privacy-release twin of pii_redaction: that op
    scrubs PII inside free text, this one bounds re-identification
    risk of the structured columns. Two partial-aggregatable counts +
    AQE-splittable joins; count tables bounded by QI cardinality."""
    from kafka_connect_streams_spark.operators.aggregations import (
        k_anonymize)
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        .alias("bal_bucket"))
    return k_anonymize(c, "c_custkey",
                       ["c_mktsegment", "c_nationkey", "bal_bucket"],
                       coarse_n=1, k=5)


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the k_anonymize release
    (operators/aggregations.py l_diversity_report): per released
    (level, QI) group, the distinct count of the sensitive attribute
    (account balance) and the l>=3 flag — the homogeneity-attack check
    k-anonymity alone misses. One join back on the row id plus one
    two-phase distinct-count aggregate."""
    from kafka_connect_streams_spark.operators.aggregations import (
        l_diversity_report)
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        "c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        .alias("bal_bucket"))
    return l_diversity_report(
        c, "c_custkey", ["c_mktsegment", "c_nationkey", "bal_bucket"],
        "c_acctbal", coarse_n=1, k=5, l_threshold=3)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of the k_anonymize release
    (operators/aggregations.py t_closeness_report): per released
    (level, QI) group, the exact e9 L1 distance between the group's
    sensitive-value distribution and the corpus distribution — the
    skewness attack l_diversity's distinct count misses (a group with
    3 distinct values that is 98% one value passes l-diversity and
    fails this). Sensitive attribute: the balance's cents digit
    (exact integer cents, the o_totalprice precedent — pmod so
    negative balances land in [0,10)) — a 10-value bounded domain, so
    the spine is released-groups × 10 cells and near-uniform, making
    the released level-0 groups' distances small and the suppressed
    level-2 remainder's distance a visible outlier when skewed.
    Completes the privacy family: k_anonymize bounds re-identification,
    l_diversity catches homogeneity, this catches skew."""
    from kafka_connect_streams_spark.operators.aggregations import (
        t_closeness_report)
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        .alias("bal_bucket"),
        F.expr("pmod(CAST(round(c_acctbal * 100) AS BIGINT), 10)")
        .alias("cents_digit"))
    return t_closeness_report(
        c, "c_custkey", ["c_mktsegment", "c_nationkey", "bal_bucket"],
        "cents_digit", coarse_n=1, k=5, t_l1_e9=400_000_000)


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release
    (operators/aggregations.py dp_counts — the geometric mechanism of
    Ghosh–Roughgarden–Sundararajan, ε=1): exact counts over the
    bounded (c_mktsegment, c_nationkey) domain (~125 groups), plus
    truncated two-sided geometric noise from a keyed PRNG
    (md5(seed:key) → 48-bit uniform → inverse-CDF table), clamped at
    zero. The float exp runs once in Python; both engines consume the
    same integer threshold literals, so the oracle twin is exact. The
    registered query pins a PUBLIC seed (the bootstrap_ci precedent) —
    a production release supplies a secret fresh seed through the same
    argument. Completes the privacy family's release path: k_anonymize
    / l_diversity / t_closeness audit a microdata release; this
    releases aggregates with a formal ε guarantee. One
    map-side-partial groupBy; noise is a bounded in-row CASE chain —
    no joins, no Python, corpus-size-independent beyond the scan."""
    from kafka_connect_streams_spark.operators.aggregations import (
        dp_counts)
    t = load_tables(spark, sf_dir)
    return dp_counts(t["customer"], ["c_mktsegment", "c_nationkey"],
                     eps_e3=1000, bound=16)


def q_dp_utility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Utility eval of the q_dp_counts release — the
    measured-not-claimed error number (the robustness-eval precedent,
    applied to privacy): released vs exact counts over the same
    domain, reported as (n_groups, sum |err|, max |err|, exact-match
    count). At ε=1 the two-sided geometric's expected |noise| is
    2α/(1−α²) ≈ 0.85, so sum_abs_err ≈ 0.85·n_groups calibrates the
    mechanism at a glance. keep_true is an EVAL-only switch — the
    released artifact is q_dp_counts. Bounded output: one row."""
    from kafka_connect_streams_spark.operators.aggregations import (
        dp_counts)
    t = load_tables(spark, sf_dir)
    rel = dp_counts(t["customer"], ["c_mktsegment", "c_nationkey"],
                    eps_e3=1000, bound=16, keep_true=True)
    err = F.abs(F.col("released") - F.col("true_count"))
    return rel.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(err).cast("bigint").alias("sum_abs_err"),
        F.max(err).cast("bigint").alias("max_abs_err"),
        F.sum(F.when(F.col("released") == F.col("true_count"),
                     F.lit(1)).otherwise(F.lit(0)).cast("bigint"))
         .alias("n_exact"))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained language identification (operators/text.py langid_ngram):
    hashed char-trigram rates per language learned from the corpus's
    own lang labels, argmax inference per document — the CCNet first
    stage that PREDICTS language (text_language_id's stopword heuristic
    consumes a fixed word list; ccnet_buckets/tokenizer_fertility
    consume lang as given). Model is a broadcast n_buckets×|langs|
    table; one corpus scan; integer e9 rates so the oracle twin is
    exact."""
    from kafka_connect_streams_spark.operators.text import langid_ngram
    t = load_tables(spark, sf_dir)
    return langid_ngram(t["documents"], "text", "doc_id", "lang")


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy/confusion report of the trained langid classifier
    against the corpus's given lang column: one row per (label,
    prediction) cell with the document count and the correct flag —
    the measured-not-claimed quality number for q_langid (the
    dedup_recall/jl_then_neardup precedent). On this synthetic corpus
    the text is shared-vocabulary word soup across langs, so the
    measured accuracy sits near the majority-class baseline — an
    honest property of the DATA the report makes visible, not a
    defect of the machinery."""
    from kafka_connect_streams_spark.operators.text import langid_ngram
    t = load_tables(spark, sf_dir)
    pred = langid_ngram(t["documents"], "text", "doc_id", "lang")
    return (pred.groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n_docs"))
            .withColumn("is_correct",
                        F.col("lang") == F.col("pred_lang")))


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams — vocabulary building for tokenizer
    training; pairs are formed inside the token array, not via a self-join
    of the exploded corpus."""
    from kafka_connect_streams_spark.operators.text import ngram_topk
    t = load_tables(spark, sf_dir)
    return ngram_topk(t["documents"], "text", k=20)


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents to fixed-token-budget
    packs (budget 2048) by sequential chunking WITHIN md5-derived buckets.

    A global first-fit pack would need one total order over the corpus — a
    single-reducer bottleneck at 100 TB. Bucketing first (md5(doc_id) % 32)
    makes packing embarrassingly parallel: each bucket packs independently
    under a per-bucket window, and pack ids are (bucket, seq) pairs. The
    assignment is a pure function of (doc_id, token_count), so it is
    deterministic across engines, retries, and repartitioning.
    """
    t = load_tables(spark, sf_dir)
    budget = 2048
    toks = t["documents"].select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                        lambda x: F.length(x) > 0)).cast("bigint").alias("n_tok"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10).cast("int") % 32).alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    packed = toks.withColumn("cum", F.sum("n_tok").over(w)).select(
        "doc_id", "n_tok", "bucket",
        F.floor((F.col("cum") - F.col("n_tok")) / budget).cast("int")
        .alias("seq"))
    return (packed.groupBy("bucket", "seq")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("pack_tokens"))
            .withColumn("bucket", F.col("bucket").cast("int")))


def q_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-FILL sequence packing: unlike sequence_packing (documents
    never split, packs over/under-fill), every pack here is exactly
    2048 tokens — documents SPLIT across pack boundaries and the output
    is the (pack, document, token-span) manifest a fixed-context
    trainer actually loads: for each document and each pack it
    intersects, the in-document start offset and span length. Pure
    arithmetic over the same bucketed running sum (a doc spanning
    packs floor(prior/B)..floor((prior+n-1)/B) explodes into that
    bounded range — total spans ≤ docs + total_tokens/B, never a
    corpus blow-up), so the plan stays one scan + ONE bucket shuffle,
    embarrassingly parallel across the 32 md5 buckets."""
    t = load_tables(spark, sf_dir)
    budget = 2048
    toks = t["documents"].select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                        lambda x: F.length(x) > 0)).cast("bigint")
        .alias("n_tok"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10).cast("int") % 32).alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum = (toks.where(F.col("n_tok") > 0)
           .withColumn("cum", F.sum("n_tok").over(w))
           .withColumn("prior", F.col("cum") - F.col("n_tok")))
    spans = (cum.select(
        "doc_id", "bucket", "n_tok", "prior",
        F.explode(F.sequence(
            F.expr(f"prior div {budget}"),
            F.expr(f"(cum - 1) div {budget}"))).alias("seq")))
    return (spans.select(
        F.col("bucket"),
        F.col("seq").cast("int").alias("seq"),
        "doc_id",
        F.expr(f"greatest(0L, seq * {budget} - prior)").alias("start_tok"),
        (F.expr(f"least(n_tok, (seq + 1) * {budget} - prior)")
         - F.expr(f"greatest(0L, seq * {budget} - prior)"))
        .alias("n_tok_in_pack")))


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the skew-prone event stream:
    (event_type, salt) partial counts/sums → final combine. The result is
    bit-identical to the plain groupBy (which is what the oracle runs) —
    this row proves the hot-key rewrite changes the shuffle layout, never
    the answer. Use when ONE key holds >~5% of rows and AQE cannot split
    a hash partition below key granularity."""
    from kafka_connect_streams_spark.operators.skew import (salted_count,
                                                            salted_sum)
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    cnt = salted_count(ev, "event_type", "event_id", buckets=16)
    amt = salted_sum(ev, "event_type", F.col("value").cast(agg.DEC),
                     "event_id", "total_value", buckets=16)
    return (cnt.join(amt, "event_type")
            .select("event_type", "cnt",
                    F.col("total_value").cast("double").alias("total_value")))


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value (fixed 25k-wide bins): the
    distribution profile data_profile's min/max summary can't show. Fixed
    bin edges (not min/max-derived) keep it a single-scan, single-shuffle
    projection+count — and make bins comparable ACROSS datasets and rounds,
    which is what drift monitoring needs."""
    t = load_tables(spark, sf_dir)
    width = 25_000
    return (t["orders"]
            .select((F.floor(F.col("o_totalprice") / width) * width)
                    .cast("bigint").alias("bin_lo"))
            .groupBy("bin_lo").agg(F.count("*").alias("n")))


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch (doc_id % 5 == 0) deduped against the
    HISTORICAL corpus (the rest) by canonical token-set fingerprint — the
    shape of every append-only ingestion pipeline: fingerprint the delta
    and keep only content unseen in history. ONE corpus scan + ONE
    fingerprint shuffle: both sides fold into a single groupBy(fingerprint)
    with side flags (a self-anti-join would scan the corpus twice). At
    100 TB the shuffle carries (fingerprint, id) pairs, not text."""
    from kafka_connect_streams_spark.operators.text import fingerprint
    t = load_tables(spark, sf_dir)
    fp = fingerprint(t["documents"], "text", "doc_id") \
        .select("doc_id", "fingerprint")
    is_batch = F.col("doc_id") % 5 == 0
    per_fp = fp.groupBy("fingerprint").agg(
        F.max(F.when(~is_batch, 1).otherwise(0)).alias("in_hist"),
        F.collect_list(F.when(is_batch, F.col("doc_id"))).alias("batch_ids"))
    return (per_fp.filter(F.col("in_hist") == 0)
            .select(F.explode("batch_ids").alias("doc_id"), "fingerprint"))


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag eval-set documents (doc_id % 50 == 0)
    whose canonical fingerprint also appears in the training set — the
    overlap check run before any benchmark number is trusted. ONE corpus
    scan + ONE fingerprint shuffle (groupBy with side flags, same
    single-pass shape as incremental_dedup — a train⋈eval join would scan
    the corpus twice)."""
    from kafka_connect_streams_spark.operators.text import fingerprint
    t = load_tables(spark, sf_dir)
    fp = fingerprint(t["documents"], "text", "doc_id") \
        .select("doc_id", "fingerprint")
    is_eval = F.col("doc_id") % 50 == 0
    per_fp = fp.groupBy("fingerprint").agg(
        F.max(F.when(~is_eval, 1).otherwise(0)).alias("in_train"),
        F.collect_list(F.when(is_eval, F.col("doc_id"))).alias("eval_ids"))
    return (per_fp.filter(F.size("eval_ids") > 0)
            .select(F.explode("eval_ids").alias("doc_id"),
                    (F.col("in_train") == 1).alias("contaminated")))


def q_decontamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram benchmark decontamination — the published-eval method (flag an
    eval doc when ANY of its word shingles appears anywhere in training, not
    just on whole-document identity; 5-gram here, 13-gram in production).

    Single pass: shingle once, groupBy(shingle) with side flags (a
    train⋈eval shingle join would scan the corpus twice), then count each
    eval doc's contaminated shingles. At 100 TB the shuffle carries
    (shingle-hash, id) pairs; the per-shingle eval-id lists are bounded by
    the eval split's size, not the corpus."""
    from kafka_connect_streams_spark.operators.dedup import shingles
    t = load_tables(spark, sf_dir)
    sh = shingles(t["documents"], "text", "doc_id", n=5)
    is_eval = F.col("doc_id") % 50 == 0
    per_sh = sh.groupBy("shingle").agg(
        F.max(F.when(~is_eval, 1).otherwise(0)).alias("in_train"),
        F.collect_list(F.when(is_eval, F.col("doc_id"))).alias("eval_ids"))
    hits = (per_sh.filter(F.col("in_train") == 1)
            .select(F.explode("eval_ids").alias("doc_id"))
            .groupBy("doc_id").agg(F.count("*").alias("n_contaminated")))
    eval_sh = (sh.filter(is_eval).groupBy("doc_id")
               .agg(F.count("*").alias("n_shingles")))
    return (eval_sh.join(hits, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_contaminated", F.lit(0))
                    .alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the heaviest orders (total line
    quantity > 250). The grouped-HAVING subquery runs ONCE and semi-joins
    the fact table — Catalyst plans the aggregate once, never per-row."""
    t = load_tables(spark, sf_dir)
    qty = F.col("l_quantity").cast(agg.DEC)
    heavy = (t["lineitem"].groupBy("l_orderkey")
             .agg(F.sum(qty).cast("double").alias("total_qty"))
             .filter(F.col("total_qty") > 250))
    return (t["orders"]
            .join(heavy, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(t["customer"]),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "c_custkey", "o_orderkey", "o_totalprice",
                    "total_qty")
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(20))


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free adaptation): parts whose revenue
    exceeds 1.2× the MEAN part revenue. The global (total, n_parts) pair is
    a 1-row broadcast scalar; the HAVING compares each group against it —
    the relative threshold binds at any scale factor (a fixed
    share-of-total would not). The global (total, n_parts) scalar is a
    RE-AGGREGATION of the per-part table — O(parts) work, never a second
    fact scan — and the shared groupBy exchange is reused (ReusedExchange),
    so lineitem is scanned once."""
    t = load_tables(spark, sf_dir)
    rev = (F.col("l_extendedprice").cast(agg.DEC)
           * (F.lit(1).cast(agg.DEC) - F.col("l_discount").cast(agg.DEC)))
    li = t["lineitem"].select("l_partkey", rev.alias("rev"))
    per_part = li.groupBy("l_partkey").agg(F.sum("rev").alias("part_rev"))
    # count(l_partkey), not count(*): the re-agg then consumes the same
    # columns as the join branch, so both per_part subtrees stay IDENTICAL
    # after column pruning and AQE reuses one shuffle stage (ReusedExchange)
    # instead of scanning lineitem twice
    total = per_part.agg(F.sum("part_rev").alias("total_rev"),
                         F.count("l_partkey").alias("n_parts"))
    return (per_part.join(F.broadcast(total))
            .filter(F.col("part_rev").cast("double")
                    > 1.2 * F.col("total_rev").cast("double")
                    / F.col("n_parts"))
            .select("l_partkey",
                    F.col("part_rev").cast("double").alias("part_revenue")))


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate funnel over the corpus: how many documents survive each
    successive training-data gate (length → quality score → language).
    ONE corpus scan computes every gate (quality_score passes lang/n_chars
    through its projection — no corpus self-join); the funnel is a single
    row of survival counts."""
    from kafka_connect_streams_spark.operators.text import quality_score
    t = load_tables(spark, sf_dir)
    gated = quality_score(t["documents"], "text", "doc_id",
                          keep=["lang", "n_chars"])
    g1 = F.col("n_chars") >= 200
    g2 = g1 & (F.col("quality") >= 0.5)
    g3 = g2 & (F.col("lang") == "en")
    return gated.agg(
        F.count("*").alias("n_total"),
        F.sum(g1.cast("long")).alias("n_len_ok"),
        F.sum(g2.cast("long")).alias("n_quality_ok"),
        F.sum(g3.cast("long")).alias("n_en_ok"))


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing weights per source (language here):
    weight ∝ count^0.5, the standard down-weighting of dominant sources when
    composing a training mix (alpha-sampling with alpha=1/2).

    Exact across engines: the raw weight is floor(sqrt(count)) — sqrt of an
    integer-valued double is correctly rounded IEEE on both engines, floor
    makes it an int64 — and the normalized share is e9 integer fixed-point
    (never a float sum, whose order would differ). One groupBy over the
    corpus + a 1-row broadcast join for the total: agg state is
    O(n_sources), scan-speed at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    per = (t["documents"].groupBy("lang")
           .agg(F.count("*").alias("n_docs"))
           .withColumn("w_raw",
                       F.floor(F.sqrt(F.col("n_docs"))).cast("bigint")))
    tot = per.agg(F.sum("w_raw").alias("w_tot"))
    return (per.join(F.broadcast(tot))
            .select("lang", "n_docs",
                    F.expr("(w_raw * 1000000000) div w_tot")
                    .alias("weight_e9")))


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order assignment:
    (shuffle_bucket, pos) per document, a pure function of doc_id.

    The corpus-wide random permutation a trainer wants, without RNG and
    without a total sort: bucket = md5 prefix % 64 (range-partitions the
    permutation), pos = rank of the full md5 hash WITHIN the bucket. Each
    bucket sorts independently (~1/64 of the corpus), so at 100 TB this is
    64 parallel sorts instead of one global one, and the ordering is stable
    under repartitioning, retries, and engine choice.
    """
    t = load_tables(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    keyed = t["documents"].select(
        "doc_id", h.alias("h"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 64)
        .alias("shuffle_bucket"))
    w = Window.partitionBy("shuffle_bucket").orderBy("h", "doc_id")
    return (keyed.withColumn("pos", F.row_number().over(w))
            .select("doc_id", "shuffle_bucket", "pos"))


def q_embedding_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label prototype compactness report: each label's class
    centroid (operators/similarity.py label_prototypes — int64
    floor-average, the kmeans recenter convention) and how tightly its
    members hug it: member count, mean and min cosine-to-own-prototype
    (e6 fixed point — per-row cosines are doubles over identical ints,
    floored to integers BEFORE the sum so the aggregate is
    order-insensitive). The curation read: a low mean flags a diffuse
    or mislabeled class; min pinpoints the worst member. Scale shape:
    one bounded (label × dim) training shuffle, then ONE map-only scan
    scoring against the broadcast prototype matrix (no centroid join)
    and an O(|labels|) aggregate."""
    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _lit_matrix, _quantized, label_prototypes)
    t = load_tables(spark, sf_dir)
    emb = (t["embeddings"]
           .where(F.col("label").isNotNull())
           .select(F.col("label").cast("int").alias("label"), "embedding"))
    labels, protos = label_prototypes(emb)
    if not labels:
        return spark.createDataFrame(
            [], "label int, n_members bigint, mean_cos_e6 bigint,"
                " min_cos_e6 bigint")
    mat = _lit_matrix([protos[lb] for lb in labels])
    pn_sql = "array(" + ",".join(
        f"{sum(v * v for v in protos[lb])}L" for lb in labels) + ")"
    pos_sql = ("element_at(map(" + ",".join(
        f"{lb}, {i}" for i, lb in enumerate(labels)) + "), label)")
    # zero-norm guard (r10 ADVICE): an all-zero prototype (pn=0) or
    # member (nv=0) makes the cosine NaN, and the engines disagree on
    # NaN ordering/floor — define cos := 0 for degenerate norms, the
    # jl_then_neardup flag() convention, mirrored in the oracle.
    scored = (emb.select("label", _quantized(F.col("embedding")).alias("_v"))
              .withColumn("_pos", F.expr(pos_sql))
              .withColumn("_c", F.element_at(mat, F.col("_pos") + 1))
              .withColumn("_pn", F.element_at(F.expr(pn_sql),
                                              F.col("_pos") + 1))
              .withColumn("_nv", _dot(F.col("_v"), F.col("_v")))
              .withColumn("_cos", F.when(
                  (F.col("_pn") > 0) & (F.col("_nv") > 0),
                  _cosine(_dot(F.col("_v"), F.col("_c")),
                          F.col("_nv"), F.col("_pn")))
                  .otherwise(F.lit(0.0)))
              .withColumn("_cos_e6", F.expr(
                  "cast(floor(_cos * 1000000) as bigint)")))
    return (scored.groupBy("label")
            .agg(F.count("*").alias("n_members"),
                 F.sum("_cos_e6").alias("_se6"),
                 F.min("_cos_e6").alias("min_cos_e6"))
            .select("label", "n_members",
                    F.expr("_se6 div n_members").alias("mean_cos_e6"),
                    "min_cos_e6"))


def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel / odd-one-out detection as a prototype confusion
    matrix: every embedding scores against ALL label prototypes in-row
    (argmax cosine, ties → lowest label — the _coarse_assign idiom with
    cosine instead of L2) and the output counts members per
    (own label, nearest prototype's label). Off-diagonal mass is the
    label-noise signal a curation pipeline routes to re-annotation.
    Scale shape: prototype training is one bounded shuffle; scoring is
    ONE map-only scan against the broadcast matrix; the matrix
    aggregate is O(|labels|²) keys."""
    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _lit_matrix, _quantized, label_prototypes)
    t = load_tables(spark, sf_dir)
    emb = (t["embeddings"]
           .where(F.col("label").isNotNull())
           .select(F.col("label").cast("int").alias("label"), "embedding"))
    labels, protos = label_prototypes(emb)
    if not labels:
        return spark.createDataFrame(
            [], "label int, nearest_label int, n_members bigint")
    mat = _lit_matrix([protos[lb] for lb in labels])
    pn_sql = "array(" + ",".join(
        f"{sum(v * v for v in protos[lb])}L" for lb in labels) + ")"
    lab_sql = "array(" + ",".join(str(lb) for lb in labels) + ")"
    qv = _quantized(F.col("embedding"))
    # the self-norm binds ONCE before the argmax — inside the lambda it
    # would recompute per matrix row (the text_repetition binding lesson).
    # Zero-norm guard (r10 ADVICE): pn=0 or nv=0 would make negcos NaN
    # and the engines disagree on NaN sort order — define cos := 0 for
    # degenerate norms, mirrored in the oracle.
    darr = F.transform(
        mat,
        lambda c, j: F.struct(
            (-F.when(
                (F.element_at(F.expr(pn_sql), (j + 1).cast("int")) > 0)
                & (F.col("_nv") > 0),
                _cosine(_dot(F.col("_v"), c),
                        F.col("_nv"),
                        F.element_at(F.expr(pn_sql),
                                     (j + 1).cast("int"))))
             .otherwise(F.lit(0.0))).alias("negcos"),
            j.cast("int").alias("p")))
    scored = (emb.select("label", qv.alias("_v"))
              .withColumn("_nv", _dot(F.col("_v"), F.col("_v")))
              .withColumn("_pos", F.array_sort(darr)[0]["p"])
              .withColumn("nearest_label",
                          F.element_at(F.expr(lab_sql),
                                       F.col("_pos") + 1)))
    return (scored.groupBy("label", "nearest_label")
            .agg(F.count("*").alias("n_members")))


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning order: each document gets a difficulty decile
    (by n_chars, the stand-in for a loss/complexity signal) and a
    deterministic position within (difficulty, shard) — easy-to-hard
    scheduling a trainer consumes shard by shard. Decile boundaries are
    EXACT percentile_disc values from grouped_exact_quantiles (two tiny
    passes, never a corpus sort) collected as 9 scalars and inlined as
    constant comparisons — the difficulty expression constant-folds and
    the n_chars IsNotNull guard pushes into the parquet scan
    (plan-pinned). Ordering is the training_order idiom: md5-sharded so
    the per-(difficulty, shard) row_number windows each sort ~1/320th
    of the corpus — 320 parallel sorts, no global one. The oracle
    re-derives the same boundaries with the naive corpus-wide
    rank/count window and must match bit-for-bit."""
    from kafka_connect_streams_spark.operators.layout import (
        grouped_exact_quantiles)
    t = load_tables(spark, sf_dir)
    docs = t["documents"].where(F.col("n_chars").isNotNull())
    lens = docs.select(F.lit(1).alias("g"),
                       F.col("n_chars").cast("bigint").alias("v"))
    bounds = sorted(
        int(r["value"])
        for r in grouped_exact_quantiles(
            lens, "g", "v",
            pcts=(10, 20, 30, 40, 50, 60, 70, 80, 90)).collect())
    # empty corpus → no boundaries → every document (none) is decile 0
    diff = sum((F.col("n_chars") > F.lit(b)).cast("int") for b in bounds) \
        if bounds else F.lit(0).cast("int")
    h = F.md5(F.col("doc_id").cast("string"))
    keyed = docs.select(
        "doc_id", diff.alias("difficulty"), h.alias("_h"),
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 32)
        .alias("shard"))
    w = Window.partitionBy("difficulty", "shard").orderBy("_h", "doc_id")
    return (keyed.withColumn("pos", F.row_number().over(w))
            .select("doc_id", "difficulty", "shard", "pos"))


def q_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global sample indices 0..N-1 in deterministic permuted
    order — training_order's (bucket, pos) made globally contiguous,
    the "give every example a unique slot" pass epoch shuffling and
    checkpoint-addressable datasets need. The naive row_number() over a
    global ORDER BY hash plans the rank stage into ONE partition; this
    runs the two-pass distributed ranking instead (64 parallel bucket
    sorts + an O(64) prefix-sum broadcast — operators/layout.py
    global_index), and equals the naive window bit-for-bit, which is
    exactly what the oracle computes."""
    from kafka_connect_streams_spark.operators.layout import global_index
    t = load_tables(spark, sf_dir)
    return global_index(t["documents"], "doc_id", buckets=64)


def q_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding parameter sweep over the real corpus: for
    each (bands, rows) banding of one 16-hash signature, candidate
    volume and recall/precision against exact 3-gram Jaccard ≥ 0.5 —
    the report run before committing a banding to a corpus-wide dedup
    (collision prob ≈ 1-(1-J^rows)^bands assumes uniform similarity;
    this measures the actual tradeoff). Shingles/signature/truth are
    computed once and checkpoint-pinned; each setting re-bands in-row."""
    from kafka_connect_streams_spark.operators.dedup import lsh_tuning
    t = load_tables(spark, sf_dir)
    return lsh_tuning(t["documents"], "text", "doc_id")


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over sequence_packing's output: per md5
    bucket, how many packs, how many tokens, and the mean fill rate of the
    2048-token budget (e9 fixed-point — packs CAN exceed 100% because
    documents are never split across a pack boundary).

    The observability leg of the packing pipeline: a fill rate drifting low
    means the bucket count or budget is mis-sized for the document length
    distribution. Pure composition — same single-shuffle plan as
    sequence_packing plus one O(buckets) aggregation.
    """
    budget = 2048
    packs = q_sequence_packing(spark, sf_dir)
    return (packs.groupBy("bucket")
            .agg(F.count("*").alias("n_packs"),
                 F.sum("pack_tokens").alias("bucket_tokens"),
                 F.max("pack_tokens").alias("max_pack_tokens"))
            .select("bucket", "n_packs", "bucket_tokens", "max_pack_tokens",
                    F.expr(f"(bucket_tokens * 1000000000) div "
                           f"(n_packs * {budget})").alias("mean_fill_e9")))


def q_decontamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate benchmark decontamination: flag an eval document
    (doc_id % 50 == 0) when any of its MinHash LSH band buckets also holds a
    TRAINING document — the fuzzy-overlap check that catches paraphrased or
    lightly-edited eval leakage exact n-gram decontamination misses.

    Same side-flag aggregation shape as decontamination_ngram (one groupBy
    on the band bucket, never a train⋈eval join), on top of the in-row
    MinHash/banding machinery dedup_minhash_lsh already proved: the shuffle
    carries (band, band_key) pairs — bands × corpus rows regardless of
    document size or embedding of the 16-slot signature.
    """
    from kafka_connect_streams_spark.operators.dedup import (
        banded_signatures, minhash_signatures_wide, shingles)
    t = load_tables(spark, sf_dir)
    sh = shingles(t["documents"], "text", "doc_id", n=3)
    wide = minhash_signatures_wide(sh, "doc_id", k=16)
    banded = banded_signatures(wide, "doc_id", bands=4, rows=4)
    is_eval = F.col("doc_id") % 50 == 0
    per_bucket = banded.groupBy("band", "band_key").agg(
        F.max(F.when(~is_eval, 1).otherwise(0)).alias("in_train"),
        F.collect_list(F.when(is_eval, F.col("doc_id"))).alias("eval_ids"))
    return (per_bucket.filter(F.size("eval_ids") > 0)
            .select(F.explode("eval_ids").alias("doc_id"), "in_train")
            .groupBy("doc_id")
            .agg((F.max("in_train") == 1).alias("near_contaminated")))


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document split into overlapping
    16-token chunks every 12 tokens (chunk k covers tokens
    [12k, 12k+16)) — the step that turns variable-length documents into
    model-context-sized training examples. Pure per-row expansion
    (split → sequence → explode → slice), no shuffle; emits md5 chunk
    fingerprints so downstream dedup carries 16 bytes per chunk, not text.
    """
    from kafka_connect_streams_spark.operators.text import chunk_documents
    t = load_tables(spark, sf_dir)
    return chunk_documents(t["documents"], "text", "doc_id",
                           size=16, stride=12)


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation, one region, one year. Six tables in one plan: nation⋈region
    prefilters to a 5-row broadcast, orders carries the pushed date range,
    and the co-nation predicate rides the supplier join — no extra
    shuffle."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    nr = (t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    o = t["orders"].filter((F.col("o_orderdate") >= lo) &
                           (F.col("o_orderdate") < hi))
    revenue = F.sum(agg.dec("l_extendedprice")
                    * (1 - agg.dec("l_discount"))).cast("double")
    return (t["lineitem"]
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .join(t["supplier"],
                  (F.col("l_suppkey") == F.col("s_suppkey")) &
                  (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nr),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name").agg(revenue.alias("revenue")))


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical selective-scan aggregate — one year,
    a discount band, small quantities, no joins. Exists to prove all three
    predicates reach the parquet scan (PushedFilters) and the sum stays in
    one partial+final aggregation."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi) &
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) &
        (F.col("l_quantity") < 24))
    return li.agg((F.sum(agg.dec("l_extendedprice") * agg.dec("l_discount")))
                  .cast("double").alias("revenue"))


def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape, generalized: shipping revenue between every ordered
    pair of DISTINCT (supplier nation → customer nation), by ship year,
    over two years. The two nation lookups are independent broadcasts of
    the same 25-row dim playing two roles (the Q8 two-role trick)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    sn = (t["supplier"].join(
        F.broadcast(t["nation"].select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation"))
    cn = (t["customer"].join(
        F.broadcast(t["nation"].select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey", "cust_nation"))
    li = t["lineitem"].filter((F.col("l_shipdate") >= lo) &
                              (F.col("l_shipdate") < hi))
    revenue = F.sum(agg.dec("l_extendedprice")
                    * (1 - agg.dec("l_discount"))).cast("double")
    return (li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cn, F.col("o_custkey") == F.col("c_custkey"))
            .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(revenue.alias("revenue")))


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted: profit per (supplier nation, ship year) for
    'blue' parts. The schema has no partsupp, so cost = p_retailprice ×
    quantity stands in for ps_supplycost × quantity (same join/agg shape,
    different cost column — documented adaptation)."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].filter(F.col("p_name").like("%blue%")) \
        .select("p_partkey", "p_retailprice")
    profit = F.sum(agg.dec("l_extendedprice") * (1 - agg.dec("l_discount"))
                   - agg.dec("p_retailprice") * agg.dec("l_quantity")) \
        .cast("double")
    return (t["lineitem"]
            .join(parts, F.col("l_partkey") == F.col("p_partkey"))
            .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name", F.year("l_shipdate").alias("o_year"))
            .agg(profit.alias("profit")))


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the count-of-counts histogram — customers by how
    many non-urgent orders they placed, INCLUDING zero-order customers
    (the left join is the point of the query). Two aggregations, both on
    shrinking keys: per-customer counts, then the distribution."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT") \
        .select("o_custkey", "o_orderkey")
    per_cust = (t["customer"].select("c_custkey")
                .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue. The max is a 1-row broadcast joined back against the
    per-supplier revenue — and the equality compares DECIMAL values, not
    doubles, so 'ties' mean exact money equality on both engines."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    rev = (t["lineitem"]
           .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
           .groupBy("l_suppkey")
           .agg(F.sum(agg.dec("l_extendedprice")
                      * (1 - agg.dec("l_discount"))).alias("_rev")))
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (rev.join(F.broadcast(mx)).filter(F.col("_rev") == F.col("_mx"))
            .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("_rev").cast("double").alias("total_revenue")))


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape, adapted: distinct suppliers per (brand, type, size)
    for non-excluded brands, excluding flagged suppliers. The schema has no
    partsupp, so the DISTINCT (l_partkey, l_suppkey) projection of lineitem
    stands in as the part-supplier relation, and s_acctbal < 0 stands in
    for the complaint filter (no comment column)."""
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (t["lineitem"].select("l_partkey", "l_suppkey").distinct()
           .join(t["part"].filter(F.col("p_brand") != "Brand#1"),
                 F.col("l_partkey") == F.col("p_partkey"))
           .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    return (rel.groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape, adapted: suppliers who alone were late on
    multi-supplier finished orders — the dual correlated EXISTS / NOT
    EXISTS stress test. 'Late' = shipped > 60 days after the order date
    (the schema has no commit/receipt dates). EXISTS(another supplier in
    the order) is a semi join, NOT EXISTS(another LATE supplier) an anti
    join — both with an equi component on the order key so they hash,
    never nested-loop."""
    t = load_tables(spark, sf_dir)
    late_cut = F.expr("o_orderdate + INTERVAL 60 DAYS")
    lo = (t["lineitem"]
          .join(t["orders"].filter(F.col("o_orderstatus") == "F"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate") > late_cut).alias("late")))
    l1 = lo.filter(F.col("late")) \
        .select(F.col("l_orderkey").alias("o1"), F.col("l_suppkey").alias("s1"))
    l2 = lo.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = lo.filter(F.col("late")) \
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    waiting = (l1
               .join(l2, (F.col("o1") == F.col("o2")) &
                         (F.col("s1") != F.col("s2")), "left_semi")
               .join(l3, (F.col("o1") == F.col("o3")) &
                         (F.col("s1") != F.col("s3")), "left_anti"))
    return (waiting.join(t["supplier"], F.col("s1") == F.col("s_suppkey"))
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20))


def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: top-5 neighbors per query (vec_id % 100
    == 0) by asymmetric distance over 8×16 deterministic codebooks — the
    memory-scale ANN path (codes instead of floats, ~32× smaller corpus,
    codebook broadcast into the encode/score expressions). Exact int64
    arithmetic end-to-end, so codes, ADC sums, and the top-k are
    reproducible bit-for-bit in the SQL oracle."""
    from kafka_connect_streams_spark.operators.similarity import (
        pq_codebooks, topk_pq_l2)
    t = load_tables(spark, sf_dir)
    vecs = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    is_q = F.col("id") % 100 == 0
    books = pq_codebooks(vecs, m_sub=8, k_cent=16)
    return topk_pq_l2(vecs.filter(is_q), vecs.filter(~is_q), k=5,
                      m_sub=8, k_cent=16, books=books)


def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality eval: recall@5 of the ADC top-k against exact quantized
    L2, per query — the compression/recall trade-off number that decides
    whether the ~32× memory saving is affordable. One plan scores both
    rankings (broadcast query side) and counts overlaps distributedly;
    recall is e9 fixed-point so the hash gate covers it exactly.

    Expect LOW recall here by design: the codebooks are hash-sampled (16
    centroids, no k-means) to stay deterministic/oracle-checkable, and the
    synthetic embeddings are near-isotropic — the worst case for PQ. The
    eval exists precisely to surface that number; production swaps in
    k-means codebooks at the same seam and the plan does not change."""
    from kafka_connect_streams_spark.operators.similarity import (
        _dot, _quantized, pq_codebooks, topk_pq_l2)
    t = load_tables(spark, sf_dir)
    vecs = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    is_q = F.col("id") % 100 == 0
    queries, cands = vecs.filter(is_q), vecs.filter(~is_q)
    books = pq_codebooks(vecs, m_sub=8, k_cent=16)
    pq = topk_pq_l2(queries, cands, k=5, m_sub=8, k_cent=16, books=books) \
        .select("q_id", "c_id")
    qv = queries.select(F.col("id").alias("q_id"),
                        _quantized(F.col("embedding")).alias("_qv"))
    cv = cands.select(F.col("id").alias("c_id"),
                      _quantized(F.col("embedding")).alias("_cv"))
    d2 = F.aggregate(F.zip_with(F.col("_qv"), F.col("_cv"),
                                lambda a, b: (a - b) * (a - b)),
                     F.expr("CAST(0 AS BIGINT)"), lambda acc, v: acc + v)
    w = Window.partitionBy("q_id").orderBy("l2", "c_id")
    exact = (cv.join(F.broadcast(qv))
             .withColumn("l2", d2)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= 5)
             .select("q_id", "c_id"))
    hits = (exact.join(pq, ["q_id", "c_id"], "left_semi")
            .groupBy("q_id").agg(F.count("*").alias("hits")))
    return (qv.select("q_id").join(hits, "q_id", "left")
            .select("q_id",
                    F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
                    F.expr("coalesce(hits, 0) * 1000000000 div 5")
                    .alias("recall_e9")))


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: candidates pruned by inverted lists (nearest of 8
    coarse centroids; queries probe their 2 nearest), survivors scored by
    PQ asymmetric distance — the production composition where the probe
    is a hash join on the list id, so the ADC scan touches ~nprobe/n_lists
    of the corpus. Exact int64 end-to-end, bit-reproducible in SQL."""
    from kafka_connect_streams_spark.operators.similarity import (
        coarse_centroids, pq_codebooks, topk_ivfpq)
    t = load_tables(spark, sf_dir)
    vecs = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    is_q = F.col("id") % 100 == 0
    books = pq_codebooks(vecs, m_sub=8, k_cent=16)
    coarse = coarse_centroids(vecs, n_lists=8)
    return topk_ivfpq(vecs.filter(is_q), vecs.filter(~is_q), k=5,
                      n_lists=8, nprobe=2, m_sub=8, k_cent=16,
                      books=books, coarse=coarse)


def q_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM count tables (the KenLM/CCNet data-prep step): per token,
    its unigram count plus the Kneser-Ney continuation statistics — the
    number of DISTINCT right neighbors N1+(w·) and distinct left contexts
    N1+(·w) (the lower-order KN numerator). Bigrams assemble IN-ROW
    (transform over the token array, no position explode); the only
    shuffles carry (token, count) and distinct (w1, w2) pairs."""
    t = load_tables(spark, sf_dir)
    # r15 sweep fix: coalesce(text, '') (the repo-wide NULL-text policy
    # spelling) makes the token array NON-NULLABLE, so the explode's
    # inferred isnotnull(<whole tokenize tree>) folds away instead of
    # re-evaluating filter(split(lower(...))) a third time per row in
    # the pushed scan Filter (plans/r15/sweep_hof_filters.txt — the one
    # isnotnull-bearing HOF flag in the registry). Row set identical:
    # NULL text tokenizes to [] which the non-outer explode and the
    # size >= 2 bigram gate drop exactly as they dropped the NULL array.
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\W+"),
                    lambda x: F.length(x) > 0)
    base = t["documents"].select(toks.alias("toks"))
    uni = (base.select(F.explode("toks").alias("token"))
           .groupBy("token").agg(F.count("*").alias("n_unigram")))
    bigrams = (base.filter(F.size("toks") >= 2)  # sequence(1,0) runs backwards
               .select(F.explode(F.expr(
                   "transform(sequence(1, size(toks) - 1), "
                   "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).alias("b"))
               .select("b.w1", "b.w2").distinct())
    # r14: the two continuation statistics used to be SEPARATE groupBys
    # over the bigram table — two consumers re-deriving the whole
    # tokenize+explode+distinct chain (6 scans in the plan), then two
    # left joins. One in-row (token, side) fan-out + ONE conditional
    # aggregate computes both: bigram (a,b) contributes a to the
    # right-neighbor count and b to the left-context count. Identical
    # values (each distinct bigram counted once per side; tokens with no
    # bigram rows still coalesce to 0 through the left join).
    sides = (bigrams.select(F.explode(F.array(
        F.struct(F.col("w1").alias("token"), F.lit(1).alias("r")),
        F.struct(F.col("w2").alias("token"), F.lit(0).alias("r"))))
        .alias("s"))
        .groupBy(F.col("s.token").alias("token"))
        .agg(F.sum("s.r").alias("n_right_types"),
             F.sum(1 - F.col("s.r")).alias("n_left_types")))
    return (uni.join(sides, "token", "left")
            .select("token", "n_unigram",
                    F.coalesce("n_right_types", F.lit(0)).cast("bigint")
                    .alias("n_right_types"),
                    F.coalesce("n_left_types", F.lit(0)).cast("bigint")
                    .alias("n_left_types")))


def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the 5 heaviest keys of a prospective
    join/groupBy column with their e9 row share — the number you read
    BEFORE choosing between a plain shuffle, AQE skew splitting, or
    salting (skew.py). One groupBy on the key + a 1-row broadcast total;
    the report is O(distinct keys) shuffled, 5 rows out."""
    t = load_tables(spark, sf_dir)
    per_key = t["events"].groupBy("event_type").agg(F.count("*").alias("n"))
    tot = per_key.agg(F.sum("n").alias("n_total"))
    w = Window.orderBy(F.desc("n"), "event_type")
    return (per_key.join(F.broadcast(tot))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select(F.col("event_type").alias("key"), "n",
                    F.expr("(n * 1000000000) div n_total").alias("share_e9"),
                    F.col("rank").cast("int").alias("rank")))


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index phrase search: build positional postings (term →
    (doc, position)) in one explode+shuffle, then answer the phrase query
    "the data" by joining the two terms' postings on (doc, adjacent
    positions) — the search-engine primitive LIKE '%the data%' can't
    express efficiently at scale (the postings join touches only the two
    terms' lists, not the corpus). Emits per-doc match counts with the
    first match position as evidence."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id", F.posexplode(F.filter(
            F.split(F.lower(F.col("text")), r"\W+"),
            lambda x: F.length(x) > 0)).alias("pos", "term"))
    # r14: the two phrase terms' postings rode SEPARATE consumers of the
    # tokenize+posexplode subtree — two full corpus passes (the term
    # filter sits above the explode, so nothing pushes to the scan).
    # One pass with an isin prefilter builds BOTH terms' postings; the
    # pinned table holds only those two lists (skinny by construction,
    # EAGER per the measured parallel-consumer rule).
    hits = (toks.filter(F.col("term").isin("the", "data"))
            .localCheckpoint(eager=True))
    a = hits.filter(F.col("term") == "the") \
        .select("doc_id", F.col("pos").alias("pos_a"))
    b = hits.filter(F.col("term") == "data") \
        .select("doc_id", F.col("pos").alias("pos_b"))
    return (a.join(b, (a.doc_id == b.doc_id) &
                   (b.pos_b == a.pos_a + 1))
            .drop(b.doc_id)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matches"),
                 F.min("pos_a").cast("bigint").alias("first_pos")))


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness per day: daily active users plus the 7-day
    rolling DISTINCT user count — the product-analytics staple where the
    rolling distinct canNOT be a sum of dailies. Exact and scale-shaped:
    events dedupe to (user, day) first (the only corpus-sized shuffle),
    each user-day then expands to the ≤7 report days it supports (in-row
    sequence, no self-join), and one groupBy counts distinct users per
    report day. Stickiness = dau/wau in e9 fixed point."""
    t = load_tables(spark, sf_dir)
    ud = (t["events"]
          .select("user_id", F.to_date(F.col("ts")).alias("day"))
          .distinct())
    # r14: DAU and WAU used to be two aggregations over two consumers of
    # the (user, day) dedup, plus a report-day semi-join and a final
    # inner join — the dedup chain (the only corpus-sized shuffle) ran
    # three times (6 scans in the plan). ONE conditional aggregate over
    # the 7-day expansion computes both: a user-day supports report_day
    # == day for DAU and all ≤7 forward days for WAU, and ``dau >= 1``
    # keeps exactly the real report days (a day is in the report iff
    # some user was active ON it — the same set the old dau⋈wau inner
    # join kept, since the DAU side only ever held real days).
    expanded = ud.select(
        "user_id", "day",
        F.explode(F.sequence(F.col("day"),
                             F.date_add(F.col("day"), 6))).alias("report_day"))
    both = (expanded.groupBy("report_day")
            .agg(F.countDistinct("user_id").alias("wau"),
                 F.countDistinct(F.when(F.col("day") == F.col("report_day"),
                                        F.col("user_id"))).alias("dau")))
    return (both.filter(F.col("dau") >= 1)
            .select("report_day", "dau", "wau",
                    F.expr("(dau * 1000000000) div wau")
                    .alias("stickiness_e9")))


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event streams: for each
    (event_type → next event_type within a user's time-ordered sequence),
    the transition count and e9 fixed-point row-normalized probability.
    The sequence-analytics shape: one lead() window per user (users are
    many and small — no skew), one pair groupBy, and the row totals join
    back by broadcast. Ties in timestamps break on event_id so the
    sequence — and therefore the matrix — is total-ordered and
    engine-reproducible."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (t["events"]
             .withColumn("next_type", F.lead("event_type").over(w))
             .filter(F.col("next_type").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"),
                      F.col("next_type").alias("to_type"))
             .agg(F.count("*").alias("n")))
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (pairs.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n",
                    F.expr("(n * 1000000000) div row_n").alias("p_e9")))


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: per source, the L1 distance between the
    source's term distribution and the corpus-wide distribution over the
    20 globally most frequent terms — the per-feed health check that
    catches a source going off-distribution (spam bursts, language flips)
    before it poisons a training mix.

    Exact integer throughout: both distributions quantize to e9
    fixed-point rates (n_st·10⁹ div N_s vs n_t·10⁹ div N) and the drift
    is Σ_t |rate_source − rate_corpus| — bounded by 2·10⁹·|top|, int64-
    safe. Shuffles carry (term, count) pairs; the top-20 vocabulary and
    the scalar totals are broadcast. (Past ~10⁹ tokens per source the
    n·10⁹ products need a decimal(38,0) intermediate — same pattern as
    packing_efficiency.)"""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "source", F.explode(F.filter(
            F.split(F.lower(F.col("text")), r"\W+"),
            lambda x: F.length(x) > 0)).alias("term"))
    per_st = toks.groupBy("source", "term").agg(F.count("*").alias("n_st"))
    glob = per_st.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    top = (glob.orderBy(F.desc("n_t"), "term").limit(20))
    n_corpus = glob.agg(F.sum("n_t").alias("n_corpus"))
    n_source = per_st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    # every (source × top-term) cell, zero-filled via the cross join
    cells = (n_source.crossJoin(F.broadcast(top))
             .join(per_st, ["source", "term"], "left")
             .withColumn("n_st", F.coalesce("n_st", F.lit(0))))
    return (cells.join(F.broadcast(n_corpus))
            .groupBy("source", "n_s")
            .agg(F.sum(F.abs(
                F.expr("(n_st * 1000000000) div n_s")
                - F.expr("(n_t * 1000000000) div n_corpus")))
                .alias("drift_e9"))
            .select("source", "n_s", "drift_e9"))


def q_ann_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ recall@5 with TRAINED codebooks: three deterministic Lloyd
    rounds per subspace (kmeans_subspace_codebooks — int64 floor-average
    recentering, one job per round, O(m·k) driver rows) upgrade the
    hash-sampled codebooks, and the same ADC-vs-exact-L2 eval measures
    the gain. The THREE FIXED Lloyd rounds unroll into the SQL twin as
    chained CTE stages (assign → floor-average recenter, per round — the
    recenter floors via floor(sx/n) in double, exact below 2^53, because
    DuckDB's // truncates while the trainer floors), so even the trained
    path is full hash-gated; a numpy reference test additionally
    replicates every Lloyd round bit-for-bit."""
    from kafka_connect_streams_spark.operators.similarity import (
        _dot, _quantized, kmeans_subspace_codebooks, topk_pq_l2)
    t = load_tables(spark, sf_dir)
    vecs = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    is_q = F.col("id") % 100 == 0
    queries, cands = vecs.filter(is_q), vecs.filter(~is_q)
    books = kmeans_subspace_codebooks(vecs, m_sub=8, k_cent=16, iters=3)
    pq = topk_pq_l2(queries, cands, k=5, m_sub=8, k_cent=16, books=books) \
        .select("q_id", "c_id")
    qv = queries.select(F.col("id").alias("q_id"),
                        _quantized(F.col("embedding")).alias("_qv"))
    cv = cands.select(F.col("id").alias("c_id"),
                      _quantized(F.col("embedding")).alias("_cv"))
    d2 = F.aggregate(F.zip_with(F.col("_qv"), F.col("_cv"),
                                lambda a, b: (a - b) * (a - b)),
                     F.expr("CAST(0 AS BIGINT)"), lambda acc, v: acc + v)
    w = Window.partitionBy("q_id").orderBy("l2", "c_id")
    exact = (cv.join(F.broadcast(qv))
             .withColumn("l2", d2)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= 5)
             .select("q_id", "c_id"))
    hits = (exact.join(pq, ["q_id", "c_id"], "left_semi")
            .groupBy("q_id").agg(F.count("*").alias("hits")))
    return (qv.select("q_id").join(hits, "q_id", "left")
            .select("q_id",
                    F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
                    F.expr("coalesce(hits, 0) * 1000000000 div 5")
                    .alias("recall_e9")))


def q_ann_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat recall@5 with a TRAINED coarse quantizer vs the hash-sampled
    one, plus the list-size skew each codebook induces — in ONE plan.

    Hash-sampled coarse centroids skew inverted-list sizes, and the hottest
    list bounds the probe-stage straggler at scale; three deterministic
    full-vector Lloyd rounds (kmeans_coarse_centroids — in-row argmin
    assignment, int64 floor-average recentering, one job per round,
    O(n_lists) driver rows) rebalance them. Both variants run through
    topk_cosine_ivf_inrow (codebook folded into expressions, zero centroid
    joins) against the same exact brute-force top-5, so the recall uplift
    AND the skew drop are measured, hash-verified numbers. skew_e9 =
    max_list_size / ideal_list_size as e9 fixed-point (1e9 = perfectly
    balanced). The THREE FIXED Lloyd rounds unroll into the SQL twin as
    chained CTE stages, like ann_pq_trained_recall's subspace version."""
    from kafka_connect_streams_spark.operators.similarity import (
        MAX_BRUTE_PAIRS, _coarse_assign, _cosine, _dot, _nonnull_key,
        _quantized, _salted_list_join, coarse_centroids,
        kmeans_coarse_centroids)
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    # r14 optimization (guide §2.4 — compute once, never re-derive): ONE
    # pinned quantized corpus (id, int64 vector, self-norm) feeds the
    # codebook sample, the 3 Lloyd rounds, the exact leg, both IVF probe
    # legs and both skew legs — the previous spelling re-scanned and
    # re-quantized the parquet per consumer (~10 subtrees). Each
    # codebook's corpus-wide argmin list assignment is computed ONCE and
    # shared by its recall leg and its skew leg; the exact top-5 table
    # is pinned for its three consumers. topk_cosine's brute-force guard
    # (two count jobs) folds into one aggregate over the pinned corpus,
    # with the identical ValueError contract.
    qv = (emb.select("id", _quantized(F.col("embedding")).alias("_v"))
          .withColumn("_n", _dot(F.col("_v"), F.col("_v")))
          .localCheckpoint(eager=False))
    is_q = F.col("id") % 100 == 0
    row = qv.agg(F.count("*").alias("n"),
                 F.sum(is_q.cast("bigint")).alias("nq")).collect()[0]
    n_all, nq = int(row["n"] or 0), int(row["nq"] or 0)
    nc = n_all - nq
    cb_hash = coarse_centroids(qv, n_lists=8, quantized_col="_v")
    if not cb_hash:        # empty corpus: nothing to train or score
        return spark.createDataFrame(
            [], "recall_hash_e9 bigint, recall_trained_e9 bigint, "
                "n_queries bigint, skew_hash_e9 bigint, "
                "skew_trained_e9 bigint")
    if nq * nc > MAX_BRUTE_PAIRS:
        raise ValueError(
            f"brute-force topk_cosine would score {nq}×{nc} = {nq * nc:,}"
            f" pairs (> max_pairs={MAX_BRUTE_PAIRS:,}). Use topk_cosine_lsh"
            " or topk_cosine_ivf, or pass allow_full_scan=True if the full"
            " scan is intentional.")
    cb_trained = kmeans_coarse_centroids(qv, n_lists=8, iters=3,
                                         init=cb_hash, quantized_col="_v")

    q = qv.filter(is_q).select(F.col("id").alias("q_id"),
                               F.col("_v").alias("_qv"),
                               F.col("_n").alias("qn"))
    c = qv.filter(~is_q).select(F.col("id").alias("c_id"),
                                F.col("_v").alias("_cv"),
                                F.col("_n").alias("cn"))

    def topk5(paired):
        # exact quantized cosine over a (q_id, c_id) pair set — the
        # _exact_topk_over_pairs shape, reading the pinned sides
        sim = (paired.join(q, "q_id").join(c, "c_id")
               .withColumn("cosine", _cosine(
                   _dot(F.col("_qv"), F.col("_cv")),
                   F.col("qn"), F.col("cn"))))
        w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                               F.col("c_id"))
        return (sim.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5).select("q_id", "c_id"))

    exact = (topk5(q.select("q_id").crossJoin(c.select("c_id")))
             .localCheckpoint(eager=False))

    def lists_of(cb):
        return (c.select("c_id",
                         _coarse_assign(F.col("_cv"), cb)[0]["j"]
                         .alias("list"))
                .localCheckpoint(eager=False))

    lists_hash, lists_trained = lists_of(cb_hash), lists_of(cb_trained)

    def hits_of(cb, lists, name):
        probes = (q.select(
            "q_id",
            F.explode(F.slice(_coarse_assign(F.col("_qv"), cb),
                              1, 2)).alias("_p"))
            .select("q_id", _nonnull_key(F.col("_p")["j"]).alias("list")))
        # r15: 8-key probe⋈lists join salted against the guaranteed
        # hot keys at scale (see _salted_list_join — result-identical)
        approx = topk5(_salted_list_join(probes, lists, "list"))
        return (exact.join(approx, ["q_id", "c_id"])
                .groupBy("q_id").agg(F.count("*").alias(name)))

    h_hash = hits_of(cb_hash, lists_hash, "h_hash")
    h_trained = hits_of(cb_trained, lists_trained, "h_trained")
    per_q = (exact.groupBy("q_id").agg(F.count("*").alias("k_actual"))
             .join(h_hash, "q_id", "left").join(h_trained, "q_id", "left")
             .select(F.coalesce("h_hash", F.lit(0)).alias("h_hash"),
                     F.coalesce("h_trained", F.lit(0)).alias("h_trained"),
                     "k_actual"))
    recall = lambda c: F.expr(  # noqa: E731
        f"(sum({c}) * CAST(1000000000 AS BIGINT)) DIV sum(k_actual)")
    recalls = per_q.agg(recall("h_hash").alias("recall_hash_e9"),
                        recall("h_trained").alias("recall_trained_e9"),
                        F.count("*").alias("n_queries"))

    def skew_of(lists, name):
        sizes = lists.groupBy("list").agg(F.count("*").alias("n"))
        return sizes.agg(F.expr(
            "(max(n) * 8 * CAST(1000000000 AS BIGINT)) DIV sum(n)")
            .alias(name))

    return (recalls
            .crossJoin(skew_of(lists_hash, "skew_hash_e9"))
            .crossJoin(skew_of(lists_trained, "skew_trained_e9")))



def q_bm25_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (operators/text.py: bm25_term_topk): top-10
    docs per highest-df query term, ranked by the exact integer-rational
    tf-saturation form of BM25(k1=1.2, b=0.75) — per-term idf is
    rank-neutral, so no libm ln enters and the ranking hash-verifies."""
    from kafka_connect_streams_spark.operators.text import bm25_term_topk
    t = load_tables(spark, sf_dir)
    return bm25_term_topk(t["documents"], "text", "doc_id",
                          n_terms=5, k=10)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed train/valid/test split (operators/text.py:
    leakage_safe_split): buckets on md5(coalesce(text,'')) so exact
    duplicates always co-assign — the eval-leakage guarantee an id-hash
    split cannot give."""
    from kafka_connect_streams_spark.operators.text import leakage_safe_split
    t = load_tables(spark, sf_dir)
    return leakage_safe_split(t["documents"], "text", "doc_id")


def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality segmentation: overlapping 96-byte windows every 64
    bytes over each binary payload (Arrow-batched mapInPandas 1→N
    expansion, the real decoder's seam) — the byte-domain counterpart of
    frame_sampling and doc_chunking."""
    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, segment_audio)
    t = load_tables(spark, sf_dir)
    media = attach_payload(t["documents"], "text", "doc_id")
    return segment_audio(media, window_bytes=96, hop_bytes=64)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE Spark plan — the round-5 capstone
    composing the new operators the way a production pretraining pipeline
    chains them:

    1. CCNet-style selection: per-language quality terciles, DROP the tail
       (bin-boundary cuts from a tiny broadcast table — no corpus sort);
    2. exact dedup over the survivors: canonical token-set fingerprint,
       keep the min-id doc per fingerprint (one ``min_by`` groupBy);
    3. per-source token-budget sampling of the canonical docs (500-token
       budget, md5 walk order, 256-bin two-level running sum — no
       per-source total sort);
    4. report per (lang, bucket): documents and tokens that survived all
       three gates.

    r14 (guide §2.3/§2.4 — scan the payload once, decide on skinny rows):
    the corpus is now scanned ONCE. The previous shape scanned text twice
    (tercile histogram + gate chain) and tokenized it twice per scan; now
    one projection computes EVERY text-derived column (quality bin,
    canonical-token-set fingerprint, token count) and is checkpointed as
    a SKINNY table (ids + scalars, never text) that the histogram branch,
    the broadcast cut table and the gate chain all read. The fingerprint
    is now computed for tail docs too (dropped later): at sf0.1 that
    extra third offsets the saved scan (solo A/B measured parity, 2.5 →
    2.6 s), but the trade is the right one at 100 TB, where the removed
    full-text corpus scan dominates everything else in the plan. Every join against derived statistics is
    broadcast, and shuffles touch only (fingerprint, scalars) — never
    text. EAGER pin: the cut-table broadcast subtree and the gate chain
    probe side both read the skinny table inside one action (the lazy-pin
    duplication hazard measured on triangle_census).
    """
    from kafka_connect_streams_spark.operators.text import quality_score
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    scored = quality_score(docs, "text", "doc_id",
                           keep=["lang", "source", "text"])
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                    lambda x: F.length(x) > 0)
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda x: F.length(x) > 0)
    skinny = (scored.select(
        "doc_id", "lang", "source",
        F.floor(F.col("quality") * 1000).cast("int").alias("qbin"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("fingerprint"),
        F.size(ws).cast("bigint").alias("n_tok"))
        .localCheckpoint(eager=True))
    per_bin = skinny.groupBy("lang", "qbin").agg(F.count("*").alias("_n"))
    wl = Window.partitionBy("lang").orderBy(F.col("qbin").desc())
    cuts = (per_bin
            .withColumn("_cum", F.sum("_n").over(wl))
            .withColumn("_tot", F.sum("_n").over(Window.partitionBy("lang")))
            .withColumn("_before", F.col("_cum") - F.col("_n"))
            .select("lang", "qbin",
                    F.when(F.col("_before") * 3 < F.col("_tot"), "head")
                    .when(F.col("_before") * 3 < 2 * F.col("_tot"), "middle")
                    .otherwise("tail").alias("bucket")))
    kept2 = (skinny.join(F.broadcast(cuts), ["lang", "qbin"])
             .filter(F.col("bucket") != "tail")
             .select("doc_id", "lang", "source", "bucket",
                     "fingerprint", "n_tok"))
    canon = (kept2.groupBy("fingerprint")
             .agg(F.min_by(F.struct("doc_id", "lang", "source", "bucket",
                                    "n_tok"),
                           F.col("doc_id")).alias("_r"))
             .select("_r.*"))
    h = F.md5(F.col("doc_id").cast("string"))
    base = canon.withColumn("_h", h).withColumn(
        "_bin", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int") % 256)
    per_src_bin = base.groupBy("source", "_bin") \
                      .agg(F.sum("n_tok").alias("_bin_tok"))
    wb = Window.partitionBy("source").orderBy("_bin")
    prior = per_src_bin.withColumn(
        "_prior", F.sum("_bin_tok").over(wb) - F.col("_bin_tok")) \
        .select("source", "_bin", "_prior")
    wd = Window.partitionBy("source", "_bin").orderBy("_h", "doc_id")
    sampled = (base.join(F.broadcast(prior), ["source", "_bin"])
               .withColumn("_cum", F.col("_prior") + F.sum("n_tok").over(wd))
               .filter(F.col("_cum") <= 500))
    return (sampled.groupBy("lang", "bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens")))


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility report per language: characters per BPE-ish
    token (e9 fixed point) plus corpus mass — the diagnostic that shows
    which languages a tokenizer serves poorly (high fertility = more
    tokens per char = shorter effective context and higher train cost).
    One projection + one O(langs) groupBy: scan-speed at 100 TB.
    """
    from kafka_connect_streams_spark.operators.text import token_stats
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    stats = token_stats(docs, "text", "doc_id") \
        .join(docs.select("doc_id", "lang"), "doc_id")
    return (stats.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("bpe_tokens").alias("total_bpe"))
            .select("lang", "n_docs", "total_chars", "total_bpe",
                    F.expr("(total_chars * 1000000000) div total_bpe")
                    .alias("chars_per_token_e9")))


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-token fertility per language: the tokenizer_fertility
    diagnostic recomputed with the trained tokenizer's ACTUAL token
    counts (bpe_encode applies the 3 learned merges in-row) instead of
    the \\W+/BPE-ish proxy — the number a training pipeline actually
    allocates context and compute by. Per language: docs, characters,
    real BPE tokens, and chars-per-token (e6 fixed point, NULL for a
    tokenless language). The encode pass is the same map-only
    Scan → Project as bpe_encode; the fertility fold is one O(langs)
    groupBy — scan-speed at 100 TB."""
    from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                           bpe_merges)
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    mt = bpe_merges(spark, docs, "text", "doc_id", rounds=3).collect()
    merges = [(r.lhs, r.rhs)
              for r in sorted(mt, key=lambda r: r.round)]
    enc = bpe_encode(docs, "text", "doc_id", merges,
                     keep=("lang", "n_chars"))
    return (enc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_tokens").alias("total_tokens"))
            .select("lang", "n_docs", "total_chars", "total_tokens",
                    F.expr("CASE WHEN total_tokens > 0 THEN"
                           " (total_chars * 1000000) div total_tokens"
                           " END").alias("chars_per_token_e6")))


def q_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by REAL token counts: sequence_packing's
    bucketed first-fit assignment driven by the trained tokenizer's
    actual per-document token counts (bpe_encode) instead of the
    whitespace proxy — so a pack's token budget is the budget the
    trainer's context window actually enforces. Same scale shape as
    sequence_packing: md5-bucketed sequential chunking, embarrassingly
    parallel, one corpus shuffle. Catalyst prunes bpe_encode's
    token_ids column entirely (plan-pinned: the md5-affine id
    transform never runs), so the packing pass costs one pruned scan +
    the encode fold + one window — and because the window hash-
    partitions by bucket, the (bucket, seq) rollup reuses that
    partitioning: ONE exchange total."""
    from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                           bpe_merges)
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    mt = bpe_merges(spark, docs, "text", "doc_id", rounds=3).collect()
    merges = [(r.lhs, r.rhs)
              for r in sorted(mt, key=lambda r: r.round)]
    enc = bpe_encode(docs, "text", "doc_id", merges)
    budget = 4096
    toks = enc.select(
        "doc_id", F.col("n_tokens").alias("n_tok"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10).cast("int") % 32).alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    packed = toks.withColumn("cum", F.sum("n_tok").over(w)).select(
        "doc_id", "n_tok", "bucket",
        F.floor((F.col("cum") - F.col("n_tok")) / budget).cast("int")
        .alias("seq"))
    return (packed.groupBy("bucket", "seq")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("pack_tokens"))
            .withColumn("bucket", F.col("bucket").cast("int")))


def q_bpe_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer generalization eval: train the merge table on the
    80% md5 hash split (hash_split's bucket convention), encode the
    WHOLE corpus with it, and compare real-token fertility
    (chars-per-token) on train vs holdout — the gap is the number that
    says whether a tokenizer trained on yesterday's corpus still
    compresses tomorrow's. Holdout-only words the training never saw
    still encode (the merge fold applies per-position over the
    character base — no vocab lookup to miss), which is exactly the
    property the eval exercises; the oracle therefore applies the
    train-derived merges to the FULL corpus vocabulary via a separate
    apply-only CTE chain (_bpe_apply_sql). Same map-only encode +
    O(splits) fold shape as bpe_fertility — scan-speed at 100 TB."""
    from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                           bpe_merges)
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10).cast("int") % 100)
    tagged = docs.withColumn(
        "split", F.when(b < 80, "train").otherwise("holdout"))
    train = tagged.where(F.col("split") == "train")
    mt = bpe_merges(spark, train, "text", "doc_id", rounds=3).collect()
    merges = [(r.lhs, r.rhs)
              for r in sorted(mt, key=lambda r: r.round)]
    enc = bpe_encode(tagged, "text", "doc_id", merges,
                     keep=("split", "n_chars"))
    return (enc.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_tokens").alias("total_tokens"))
            .select("split", "n_docs", "total_chars", "total_tokens",
                    F.expr("CASE WHEN total_tokens > 0 THEN"
                           " (total_chars * 1000000) div total_tokens"
                           " END").alias("chars_per_token_e6")))


def q_cluster_best_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: per near-dup cluster, KEEP the
    highest-quality document (ties → lowest doc_id) instead of the
    arbitrary min-id — what a production dedup actually ships, since near
    duplicates differ in boilerplate/truncation and the keeper choice
    decides training-data quality.

    Composition: connected components over the 5-gram Jaccard pair graph
    (the dedup_clusters machinery) + the single-scan quality score +
    ONE ``max_by`` aggregation — no per-cluster sort, no window over the
    corpus."""
    from kafka_connect_streams_spark.operators.text import quality_score
    t = load_tables(spark, sf_dir)
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    quality = quality_score(t["documents"], "text", "doc_id") \
        .select("doc_id", "quality")
    j = clusters.join(quality, "doc_id")
    return (j.groupBy("cluster_id")
            .agg(F.count("*").alias("n_docs"),
                 F.max_by("doc_id",
                          F.struct(F.col("quality"),
                                   (-F.col("doc_id")).alias("_tb")))
                 .alias("best_doc")))


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-chunk detection: chunks (16-token windows, stride 12)
    whose fingerprint appears in MORE THAN ONE document — the
    repeated-header/footer/navigation content a crawl pipeline strips
    before training. Chunk-level dedup catches shared passages document-
    level fingerprints can't see.

    One scan + one groupBy over 16-byte chunk fingerprints (never chunk
    text): shuffle volume is ~32 bytes per chunk regardless of chunk
    width, and the partial aggregate collapses within-partition repeats
    before the exchange.
    """
    from kafka_connect_streams_spark.operators.text import chunk_documents
    t = load_tables(spark, sf_dir)
    ch = chunk_documents(t["documents"], "text", "doc_id",
                         size=16, stride=12)
    return (ch.groupBy("chunk_fp")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occurrences"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_docs") > 1))


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget sampling: walk each source's documents in
    md5(doc_id) order and keep rows while the running token sum stays
    ≤ 700 — "take ~N tokens per source", capping dominant sources by token
    mass rather than document count. The md5 order is bin-segmented
    (256 bins) so no stratum ever needs a total sort: per-bin offsets come
    from a tiny aggregate and the per-document window runs within
    (source, bin) — bit-identical to the naive single window the oracle
    runs, with 256× its parallelism on a skewed source.
    """
    from kafka_connect_streams_spark.operators.text import token_budget_sample
    t = load_tables(spark, sf_dir)
    return token_budget_sample(t["documents"], "text", "doc_id",
                               "source", budget=700)


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail selection: per language, documents are
    ranked by quality score and cut into thirds at integer-millipoint bin
    boundaries (head = best third). The corpus never sorts: per-(lang,bin)
    counts are a tiny aggregate, a window over THAT yields each bin's
    cumulative rank, and documents join their bucket back by broadcast —
    the scale shape a perplexity-tercile filter needs at 100 TB.
    """
    from kafka_connect_streams_spark.operators.text import quality_buckets
    t = load_tables(spark, sf_dir)
    return quality_buckets(t["documents"], "text", "doc_id", "lang")


def q_cross_source_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every pair of sources, how many
    canonical fingerprints appear in BOTH — the crawl-curation report that
    finds mirror sites and syndicated content before dedup collapses them.

    One scan + one fingerprint shuffle: distinct (fingerprint, source)
    pairs fold into a groupBy(fingerprint) whose sorted source set expands
    to ordered pairs IN-ROW (sources per fingerprint is tiny), then one
    O(sources²) count. A fingerprint self-join would scan and shuffle the
    corpus twice for the same answer."""
    from kafka_connect_streams_spark.operators.text import fingerprint
    t = load_tables(spark, sf_dir)
    fp = fingerprint(t["documents"], "text", "doc_id", keep=["source"]) \
        .select("fingerprint", "source").distinct()
    srcs = (fp.groupBy("fingerprint")
            .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
            .filter(F.size("srcs") > 1))
    pairs = srcs.select(F.explode(F.expr(
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), "
        "y -> struct(x AS a, y AS b))))")).alias("p"))
    return (pairs.groupBy(F.col("p.a").alias("source_a"),
                          F.col("p.b").alias("source_b"))
            .agg(F.count("*").alias("n_shared")))


def q_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: an eval vector
    (vec_id % 50 == 0) is contaminated when a TRAINING vector lands in its
    hyperplane-LSH bucket with exact quantized cosine ≥ 0.4 — the
    semantic-similarity leakage check that catches rewordings n-gram and
    MinHash overlap both miss.

    Bucket-local candidate join (never eval × train), exact in-row cosine
    on the survivors only; evals with an empty bucket report zero
    candidates via one left join against the tiny eval side.
    """
    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _qvecs, hyperplane_signatures)
    t = load_tables(spark, sf_dir)
    # r14: pin the corpus (4 consumers: sig, eval/train qvec sides, the
    # eval id spine) and the signature table (its eval and train halves
    # are two branches of the same plan — unpinned, the 8-plane
    # projection ran twice over the parquet scan)
    vecs = (t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
            .localCheckpoint(eager=False))
    sig = (hyperplane_signatures(vecs, "id", "embedding", planes=8)
           .localCheckpoint(eager=False))
    is_eval = F.col("id") % 50 == 0
    ev = sig.filter(is_eval).select(F.col("id").alias("id_e"), "bucket")
    tr = sig.filter(~is_eval).select(F.col("id").alias("id_t"), "bucket")
    # the eval side (benchmark suites) is orders of magnitude smaller than
    # the training corpus: broadcast IT — never the train legs, whose join
    # strategy stays size-driven (AQE) so 100× growth re-plans correctly
    cand = F.broadcast(ev).join(tr, "bucket").select("id_e", "id_t")
    ve = _qvecs(vecs.filter(is_eval), "id", "embedding", "id_e", "_ve", "ne")
    vt = _qvecs(vecs.filter(~is_eval), "id", "embedding", "id_t", "_vt", "nt")
    scored = (cand.join(F.broadcast(ve), "id_e").join(vt, "id_t")
              .withColumn("cosine", _cosine(
                  _dot(F.col("_ve"), F.col("_vt")),
                  F.col("ne"), F.col("nt"))))
    per_eval = scored.groupBy("id_e").agg(
        F.count("*").alias("n_candidates"),
        F.max(F.col("cosine") >= 0.4).alias("contaminated"))
    evals = vecs.filter(is_eval).select(F.col("id").alias("id_e"))
    return (evals.join(F.broadcast(per_eval), "id_e", "left")
            .select(F.col("id_e").alias("vec_id"),
                    F.coalesce("n_candidates", F.lit(0).cast("bigint"))
                    .alias("n_candidates"),
                    F.coalesce("contaminated", F.lit(False))
                    .alias("contaminated")))


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted: for every LARGE part of size ≤ 5, the
    EUROPE supplier(s) offering it at the minimum observed price. The
    schema has no partsupp, so min(l_extendedprice) per DISTINCT
    (l_partkey, l_suppkey) stands in for ps_supplycost; the correlated
    min-cost subquery becomes a window min over the part — the
    Spark-idiomatic equivalent (one shuffle, no self-join). Cost equality
    compares DECIMAL, not double; nation⋈region rides in as a broadcast.
    Deterministic top-20 by (s_acctbal DESC, n_name, s_name, p_partkey)."""
    t = load_tables(spark, sf_dir)
    ps = (t["lineitem"].groupBy("l_partkey", "l_suppkey")
          .agg(F.min(agg.dec("l_extendedprice")).alias("_cost")))
    eur_nations = (t["nation"]
                   .join(t["region"].filter(F.col("r_name") == "EUROPE"),
                         F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("n_nationkey", "n_name"))
    sup = (t["supplier"].join(F.broadcast(eur_nations),
                              F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (ps.join(t["part"].filter((F.col("p_size") <= 5)
                                     & (F.col("p_type") == "LARGE")),
                    F.col("l_partkey") == F.col("p_partkey"))
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey")))
    wp = Window.partitionBy("p_partkey")
    wr = Window.orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                        "p_partkey")
    return (cand.withColumn("_min", F.min("_cost").over(wp))
            .filter(F.col("_cost") == F.col("_min"))
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= 20)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    F.col("_cost").cast("double").alias("supply_cost"),
                    F.col("rnk").cast("int").alias("rnk")))


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape, adapted: EUROPE suppliers who shipped MORE THAN
    HALF of some part's total 1995 quantity (the schema has no
    partsupp.availqty, so share-of-part-volume stands in for the excess-
    inventory predicate). Quantities aggregate as DECIMAL and the half
    test is ``2·supp_qty > part_qty`` — integer-exact, no division.
    Scale shape: per-(part, supplier) agg, per-part totals derived FROM
    that aggregate (never a second corpus scan), one join back, then a
    per-supplier count; nation⋈region is a broadcast."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1995-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-01-01").cast("timestamp_ntz")
    sp = (t["lineitem"]
          .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(agg.dec("l_quantity")).alias("_sq")))
    # part totals as a window over the aggregate, NOT a groupBy+self-join:
    # the latter re-expands sp's subtree and scans lineitem twice; the
    # window re-shuffles only the small (part, supp) aggregate
    wp = Window.partitionBy("l_partkey")
    dom = (sp.withColumn("_pq", F.sum("_sq").over(wp))
           .filter(F.lit(2) * F.col("_sq") > F.col("_pq"))
           .groupBy("l_suppkey").agg(F.count("*").alias("n_dominated")))
    eur_nations = (t["nation"]
                   .join(t["region"].filter(F.col("r_name") == "EUROPE"),
                         F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("n_nationkey", "n_name"))
    return (dom.join(t["supplier"],
                     F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(eur_nations),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name", "n_dominated"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.py:
    semantic_dedup): IVF coarse clusters + within-cluster min-id pruning
    at quantized cosine ≥ 0.4. n_centroids pinned to 16 for the oracle
    twin; production sizing is auto_centroids (≈ sqrt N)."""
    from kafka_connect_streams_spark.operators.similarity import (
        semantic_dedup)
    t = load_tables(spark, sf_dir)
    vecs = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    return semantic_dedup(vecs, n_centroids=16, threshold=0.4)


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced (diversity-preserving) sampling: assign every
    embedding to its trained k-means cluster, then keep an equal quota
    per cluster in deterministic md5 order — the DataComp/SemDeDup-style
    curation move that stops a dominant mode from eating the whole
    sample budget. Training is kmeans_coarse_centroids (3 deterministic
    Lloyd rounds, O(n_lists) driver rows/round); assignment is an
    in-row argmin over the broadcast centroid matrix — no centroid
    join.

    The per-cluster top-quota NEVER sorts a cluster: the md5 order is
    bin-segmented by the hash's first byte (prefix-monotone, so
    (bin, h) order IS h order — the token_budget_sample idiom), a tiny
    (cluster, bin) count table finds each bin's prior offset, bins
    whose offset already exceeds the quota are dropped by a broadcast
    semi-filter BEFORE any shuffle, and the row_number window runs only
    over the few surviving head bins. The corpus-sized assignment
    materializes once (skinny localCheckpoint: id/list/hash/bin — the
    fat vector column is dropped), so the embedding scan and the argmin
    run exactly once. Oracle runs the naive per-cluster window over the
    same unrolled Lloyd rounds."""
    from kafka_connect_streams_spark.operators.similarity import (
        _coarse_assign, _quantized, kmeans_coarse_centroids)
    t = load_tables(spark, sf_dir)
    # r14: pin the QUANTIZED corpus once — the codebook sample, the 3
    # Lloyd rounds and the final assignment pass all read it (the old
    # spelling re-scanned and re-quantized the parquet in each of those
    # 5 subtrees; guide §2.4). EAGER: the first consumer is a collect
    # inside codebook training, and the A/B measured the lazy variant
    # 2× slower (lazy pin + collect-driven training jobs re-derived the
    # quantize chain instead of reading the cache).
    qv = (t["embeddings"]
          .select(F.col("vec_id").alias("id"),
                  _quantized(F.col("embedding")).alias("_v"))
          .localCheckpoint(eager=True))
    coarse = kmeans_coarse_centroids(qv, n_lists=8, iters=3,
                                     quantized_col="_v")
    if not coarse:
        return spark.createDataFrame(
            [], "list int, vec_id bigint, rank_in_list int")
    quota = 8
    h = F.md5(F.col("id").cast("string"))
    base = (qv.select(
                "id",
                _coarse_assign(F.col("_v"), coarse)[0]["j"]
                .alias("list"),
                h.alias("_h"),
                (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 256)
                .alias("_bin"))
            .localCheckpoint(eager=False))
    per_bin = base.groupBy("list", "_bin").agg(F.count("*").alias("_c"))
    wb = Window.partitionBy("list").orderBy("_bin")
    prior = (per_bin
             .withColumn("_off", F.sum("_c").over(wb) - F.col("_c"))
             .filter(F.col("_off") < quota)
             .select("list", "_bin", "_off"))
    wd = Window.partitionBy("list", "_bin").orderBy("_h", "id")
    return (base.join(F.broadcast(prior), ["list", "_bin"])
            .withColumn("_r", (F.col("_off") + F.row_number().over(wd))
                        .cast("int"))
            .filter(F.col("_r") <= quota)
            .select("list", F.col("id").alias("vec_id"),
                    F.col("_r").alias("rank_in_list")))


def q_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic sample: the 100 documents with the
    smallest (md5(id), id) — hash order is uniform-pseudorandom yet
    reproducible, and the plan is TakeOrderedAndProject: each partition
    keeps its local top-100 and the driver merges k·partitions rows, so
    an EXACT-k sample never global-sorts the corpus (the companion to
    hash_split/stratified_sample, whose rates are only approximate)."""
    t = load_tables(spark, sf_dir)
    return (t["documents"]
            .select("doc_id",
                    F.md5(F.col("doc_id").cast("string")).alias("h"))
            .orderBy("h", "doc_id").limit(100))


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (outlier capping) of events.value per
    event type: exact p05/p95 under the rank/count-window convention of
    q_percentile_disc (no collect, no sketch), then values clip to the
    bounds and re-aggregate — sums pass through DECIMAL so the hash is
    order-independent. The feature-engineering step before any
    scale-sensitive model consumes a long-tailed metric."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = (t["events"].select("event_type", "event_id", "value")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(cw)))
    at = lambda q: F.max(F.when(  # noqa: E731
        F.col("rn") == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
        F.col("value")))
    bounds = ranked.groupBy("event_type").agg(
        at(0.05).alias("lo"), at(0.95).alias("hi"))
    clipped = (t["events"].join(F.broadcast(bounds), "event_type")
               .withColumn("cv", F.least(F.greatest(F.col("value"),
                                                    F.col("lo")),
                                         F.col("hi"))))
    return (clipped.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum((F.col("value") < F.col("lo")).cast("bigint"))
                  .alias("n_clipped_low"),
                 F.sum((F.col("value") > F.col("hi")).cast("bigint"))
                  .alias("n_clipped_high"),
                 F.min("lo").alias("lo"), F.min("hi").alias("hi"),
                 F.sum(F.col("cv").cast("decimal(18,6)"))
                  .cast("double").alias("sum_winsorized")))


def q_winnowing_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (operators/dedup.py: winnow_pairs): MOSS
    local fingerprints — min-hash of each 4-window over word-3-gram
    hashes — bucket-joined with the stop-fingerprint cap; emits shared
    counts + e9 containment."""
    from kafka_connect_streams_spark.operators.dedup import winnow_pairs
    t = load_tables(spark, sf_dir)
    return winnow_pairs(t["documents"], "text", "doc_id",
                        k=3, w=4, min_shared=2, max_doc_freq=50)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/Dolma-style document-quality rule gate (operators/text.py:
    gopher_rules): five classic rules evaluated as ONE zero-shuffle
    projection — every signal, including the top-token count, computes
    in-row over the token array."""
    from kafka_connect_streams_spark.operators.text import gopher_rules
    t = load_tables(spark, sf_dir)
    return gopher_rules(t["documents"], "text", "doc_id")


def q_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring (operators/text.py: lm_doc_score): the
    KenLM/CCNet quality-filter step with the LM estimated from the corpus
    and conditional probabilities in e9 fixed point (bit-deterministic —
    no cross-engine ``ln()`` ulps)."""
    from kafka_connect_streams_spark.operators.text import lm_doc_score
    t = load_tables(spark, sf_dir)
    return lm_doc_score(t["documents"], "text", "doc_id")


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span removal (operators/text.py: boilerplate_removal):
    word 3-grams occurring in ≥3 distinct documents are boilerplate; the
    covered positions are dropped and the text reassembled in-row — the
    Lee-et-al. exact-substring dedup step at n-gram granularity."""
    from kafka_connect_streams_spark.operators.text import boilerplate_removal
    t = load_tables(spark, sf_dir)
    return boilerplate_removal(t["documents"], "text", "doc_id",
                               n=3, min_docs=3)


def q_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier inference (operators/text.py:
    linear_classifier_score): the fastText-style model-based quality
    filter as a pure in-row fold — zero shuffles."""
    from kafka_connect_streams_spark.operators.text import (
        linear_classifier_score)
    t = load_tables(spark, sf_dir)
    return linear_classifier_score(t["documents"], "text", "doc_id")


def q_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style set-similarity join (operators/dedup.py:
    prefix_filter_jaccard): exact 3-gram-shingle-set Jaccard ≥ 0.5 with
    rarest-first prefix filtering — candidates join only on each set's
    prefix shingles, then verify in-row against sorted shingle arrays.
    The third member of the Jaccard family (alongside the rare-shingle
    cap and MinHash banding) and the one with a lossless-pruning
    guarantee."""
    from kafka_connect_streams_spark.operators.dedup import (
        prefix_filter_jaccard)
    t = load_tables(spark, sf_dir)
    return prefix_filter_jaccard(t["documents"], "text", "doc_id",
                                 threshold_e2=50, shingle_n=3)


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/text.py: dsir_weights): hashed
    unigram buckets, target = lang='en' documents, raw = whole corpus;
    per-doc score is the token-summed target/raw rate ratio in integer
    e6 fixed point. The importance-resampling scorer that upweights
    target-domain-looking documents in a pretraining mix."""
    from kafka_connect_streams_spark.operators.text import dsir_weights
    t = load_tables(spark, sf_dir)
    return dsir_weights(t["documents"], "text", "doc_id",
                        F.col("lang") == "en")


def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: daily event counts/totals per
    type over a generated date spine, missing days zero-filled — the
    step every downstream rolling/anomaly computation assumes (a gap
    read as "no row" instead of "zero" silently corrupts averages).
    Scale shape: the spine is |types|·|days| rows built from a broadcast
    1-row bounds aggregate — never a corpus-sized generator; the corpus
    contributes one groupBy. Totals pass through exact DECIMAL so the
    double is bit-identical cross-engine."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_type", F.to_date("ts").alias("day"),
                            "value")
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast("decimal(18,6)"))
                   .cast("double").alias("total")))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (ev.select("event_type").distinct()
             .crossJoin(F.broadcast(bounds))
             .select("event_type",
                     F.explode(F.sequence("d0", "d1")).alias("day")))
    return (spine.join(daily, ["event_type", "day"], "left")
            .select("event_type", "day",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.coalesce("total", F.lit(0.0)).alias("total")))


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: flag days whose event count sits more
    than 2 population standard deviations from the type's daily mean.
    The test is integer-exact — (x·n − S)² > 4·(n·Q − S²) is
    (x − μ)² > (2σ)² cleared of division, with S=Σx, Q=Σx² — so no
    cross-engine float ulp can flip a flag. Intermediates square through
    DECIMAL(38,0) (counts up to ~1e9/day stay exact). Per-type stats are
    a tiny broadcast; the corpus contributes one groupBy."""
    t = load_tables(spark, sf_dir)
    daily = (t["events"]
             .select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day")
             .agg(F.count("*").alias("x")))
    stats = (daily.groupBy("event_type")
             .agg(F.count("*").alias("nd"), F.sum("x").alias("s"),
                  F.sum(F.col("x") * F.col("x")).alias("q")))
    # explicit multiplies, never **: Column.__pow__ lowers to pow() which
    # is DOUBLE and would reintroduce the float ulps this query avoids
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    diff = d18("x") * d18("nd") - d18("s")
    lhs = diff * diff
    rhs = F.lit(4).cast("decimal(18,0)") \
        * (d18("nd") * d18("q") - d18("s") * d18("s"))
    return (daily.join(F.broadcast(stats), "event_type")
            .select("event_type", "day", "x",
                    F.when(lhs > rhs, F.lit(1)).otherwise(F.lit(0))
                     .cast("int").alias("is_spike")))


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) Poisson sample:
    document i with weight w_i = n_chars is kept iff
    h30_i · W < k · w_i · 2³⁰ — inclusion probability k·w_i/W with
    expected size k=100, from a 30-bit md5 hash. Deterministic,
    coordinated (supersets under growing k), and integer-exact: the
    comparison runs in DECIMAL(38,0) so corpus weight totals up to
    1e28 never overflow. The companion to exact_k_sample (unweighted
    exact-k) and token_budget_sample (sequential budget): this one is a
    single scan + broadcast scalar — no sort, no window, no state."""
    t = load_tables(spark, sf_dir)
    docs = (t["documents"]
            .select("doc_id", F.col("n_chars").alias("w"))
            .withColumn("_h30", F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 12),"
                " 16, 10) as bigint) div 262144")))
    tot = docs.agg(F.sum("w").alias("tw"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (docs.crossJoin(F.broadcast(tot))
            .filter(d38("_h30") * d38("tw")
                    < F.lit(100).cast("decimal(38,0)") * d38("w")
                    * F.lit(1073741824).cast("decimal(38,0)"))
            .select("doc_id", "w"))


def q_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed activity counter: per event type, the
    exponentially decayed daily-count sum as of the corpus's latest day,
    with a one-day half-life — the freshness-weighted popularity signal
    behind trending rankings and decayed CTR features. Integer-exact:
    weight 2^(−age) is a LEFT SHIFT — day d contributes x_d·2^(20−age)
    in units of 2⁻²⁰, days older than the 20-day horizon contribute less
    than one ulp and truncate to zero by construction (documented cap;
    no float pow, no cross-engine ulps). One corpus groupBy; the as-of
    day is a broadcast 1-row aggregate."""
    t = load_tables(spark, sf_dir)
    daily = (t["events"]
             .select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day")
             .agg(F.count("*").alias("x")))
    asof = daily.agg(F.max("day").alias("as_of"))
    aged = (daily.crossJoin(F.broadcast(asof))
            .withColumn("age", F.datediff("as_of", "day")))
    return (aged.groupBy("event_type")
            .agg(F.min("as_of").alias("as_of"),
                 F.sum(F.expr(
                     "CASE WHEN age <= 20 THEN"
                     " x * shiftleft(cast(1 as bigint), 20 - age)"
                     " ELSE cast(0 as bigint) END"))
                  .alias("decayed_x2e20"),
                 F.sum((F.col("age") <= 20).cast("bigint"))
                  .alias("n_days_in_horizon")))


def q_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the event-type transition graph (edges =
    q_transition_matrix's lead() pairs, weighted by count), 5 unrolled
    Jacobi iterations at damping 0.85 in e9 fixed point — truncating
    integer div makes every iteration bit-identical cross-engine (the
    q_ann_pq_trained_recall precedent: iterative algorithms hash-gate by
    unrolling into SQL). Scale shape: the corpus is touched ONCE to
    aggregate the edge list, which is then ``localCheckpoint``-ed (the
    dedup_clusters precedent) so the 5 iterations replay a materialized
    |types|²-bounded graph instead of re-expanding the corpus subtree
    5×; per-iteration joins broadcast the tiny rank vector. Iteration
    cost is independent of corpus size. Dangling mass is not
    redistributed (documented choice; no dangling nodes in this graph —
    every type transitions somewhere)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # r14: pin the RAW edge aggregate too — the out_n self-join consumes
    # it twice, so unpinned it re-ran the corpus lead()-window on both
    # sides (3 corpus passes total; now 2: edge aggregate + node set).
    # Pins stay EAGER: the 5 unrolled iterations read edges/nodes from
    # many parallel broadcast-build stages of ONE action, and a lazy pin
    # re-derives its subtree in every stage that starts before another
    # has cached it (the triangle_census A/B measured that 1.55× slower).
    edges0 = (t["events"]
              .withColumn("_next", F.lead("event_type").over(w))
              .filter(F.col("_next").isNotNull())
              .groupBy(F.col("event_type").alias("src"),
                       F.col("_next").alias("dst"))
              .agg(F.count("*").alias("n"))
              .localCheckpoint(eager=True))
    edges = edges0.join(
        edges0.groupBy("src").agg(F.sum("n").alias("out_n")), "src") \
        .localCheckpoint(eager=True)
    nodes = (t["events"].select(F.col("event_type").alias("node"))
             .distinct().localCheckpoint(eager=True))
    n_nodes = nodes.agg(F.count("*").alias("nn"))
    pr = (nodes.crossJoin(F.broadcast(n_nodes))
          .select("node", F.expr("1000000000 div nn").alias("pr_e9")))
    base = F.expr("150000000 div nn")
    for _ in range(5):
        contrib = (edges.join(F.broadcast(
                       pr.withColumnRenamed("node", "src")), "src")
                   .withColumn("c", F.expr("pr_e9 * n div out_n"))
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum("c").alias("inc")))
        pr = (nodes.join(F.broadcast(contrib), "node", "left")
              .crossJoin(F.broadcast(n_nodes))
              .select("node",
                      (base + F.expr("85 * coalesce(inc, 0) div 100"))
                      .alias("pr_e9")))
    return pr.select(F.col("node").alias("event_type"), "pr_e9")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (operators/frequency.py:
    heavy_hitters_exact): words with frequency > N/100 via mergeable
    Misra-Gries partition summaries + an exact bounded second pass —
    the shuffle carries ≤ partitions×k candidates instead of the whole
    vocabulary, and the answer is provably partitioning-independent
    (hence this oracle row). The registry's first answer-bounded
    frequency operator."""
    from kafka_connect_streams_spark.operators.frequency import (
        heavy_hitters_exact)
    t = load_tables(spark, sf_dir)
    return heavy_hitters_exact(t["documents"], "text", k=100)


def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries (operators/frequency.py:
    count_min_sketch / cms_estimate): a d=4 × w=512 counter matrix from
    md5-affine hash rows — deterministic, so the sketch itself is
    bit-reproducible in SQL — probed with the 10 most frequent words;
    ``overcount_ok`` asserts the CMS one-sided guarantee est ≥ exact
    in-plan. Sketch size is independent of corpus and vocabulary size."""
    from kafka_connect_streams_spark.operators.frequency import (
        cms_estimate)
    t = load_tables(spark, sf_dir)
    # r14: probes=None derives the top-10 probe set from cms_estimate's
    # own pinned word-count table — the corpus is tokenized ONCE for
    # sketch + exact + probes instead of three times (guide §2.3)
    return cms_estimate(t["documents"], "text", probes=None, probe_top=10)


def q_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-order graph (operators/graph.py:
    triangle_census): parts co-occurring in an order are linked (pairs
    expand in-row from the order's sorted part set — never a fact-table
    self-join), then triangles are counted with the degree-ordered
    edge-iterator: orient low→high rank, intersect out-neighbor arrays
    in-row. Wedges never materialize as rows — the classic wedge
    explosion becomes bounded array payloads. Deterministic ¼ order
    subset keeps the census cheap at any SF."""
    from kafka_connect_streams_spark.operators.graph import (
        cooccurrence_edges, triangle_census)
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(F.col("l_orderkey") % 4 == 0)
    return triangle_census(
        cooccurrence_edges(li, "l_orderkey", "l_partkey"))


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering stats (operators/layout.py:
    zorder_layout_stats): Morton-interleave (ship-day, partkey&4095)
    into one sort key and report per-bucket min-max spans of BOTH
    dimensions — the file-skipping statistics a z-ordered parquet write
    gives min-max pruning, shown as narrow spans per bucket. Pure bit
    arithmetic: codegen in Spark, bit-identical in the SQL twin; one
    groupBy over ≤ 64 bucket keys."""
    from kafka_connect_streams_spark.operators.layout import (
        zorder_layout_stats)
    t = load_tables(spark, sf_dir)
    x = F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1992-01-01").cast("date")).cast("long")
    y = F.col("l_partkey").bitwiseAND(4095).cast("long")
    return zorder_layout_stats(t["lineitem"], x, y,
                               bits=12, bucket_shift=18)


#: the layout A/B's shared geometry: both clustering keys bucket the
#: same (ship-day, partkey&4095) plane at bits=12 into ≤64 buckets, and
#: the pruning workload is a FIXED data-independent 4×4 tiling of the
#: 4096×4096 key domain (1024-wide range predicates on both dims — the
#: shape a min-max-pruned scan actually sees).
_LAYOUT_BITS, _LAYOUT_SHIFT, _LAYOUT_TILE = 12, 18, 1024


def _layout_dims(t):
    x = F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1992-01-01").cast("date")).cast("long")
    y = F.col("l_partkey").bitwiseAND(4095).cast("long")
    return t["lineitem"], x, y


def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering stats (operators/layout.py
    with_hilbert / hilbert_layout_stats) — the locality-better sibling
    of q_zorder_layout on the SAME dimensions and bucketing:
    consecutive Hilbert indices are always adjacent cells, so bucket
    ranges are tighter rectangles than Morton ranges — smaller
    per-file min-max spans, more file-skipping. The walk unrolls to
    12 integer CASE/shift projections (one per round; a single nested
    expression would grow ~3^12 nodes), all codegen; one groupBy over
    ≤64 bucket keys with map-side combine. The measured pruning
    comparison is q_layout_prune_ab."""
    from kafka_connect_streams_spark.operators.layout import (
        hilbert_layout_stats)
    t = load_tables(spark, sf_dir)
    li, x, y = _layout_dims(t)
    return hilbert_layout_stats(li, x, y, bits=_LAYOUT_BITS,
                                bucket_shift=_LAYOUT_SHIFT)


def q_layout_prune_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED layout A/B (the oph_recall / robustness-eval
    precedent): 64 EQUAL-FREQUENCY files along each clustering key
    (operators/layout.py layout_file_spans — what a layout write
    actually produces; aligned key-range buckets give both curves
    identical square tiles and measure NOTHING, which is why the files
    spelling exists), then for the fixed 4×4 range-query tiling of the
    key domain, count the (file, query) pairs each layout leaves
    un-prunable: a file is TOUCHED iff its min-max span intersects the
    query rectangle on both dims — exactly the zonemap file-skipping
    decision. One bounded row per layout: (layout, n_files,
    touched_pairs, total_pairs); fewer touched = tighter clustering.
    Measured at sf0.1: hilbert 76 vs zorder 87 of 1024 (13% fewer
    un-prunable reads), summed bounding-box area 1.77× tighter. The
    ranking is the global_index two-pass pattern over key-range
    buckets — no global single-partition sort at any scale; the A/B
    costs two such layout passes and nothing else."""
    from kafka_connect_streams_spark.operators.layout import (
        layout_file_spans, with_hilbert, zorder_key)
    t = load_tables(spark, sf_dir)
    li, x, y = _layout_dims(t)
    pts = li.select(x.alias("x"), y.alias("y"))
    zkeyed = pts.withColumn(
        "zkey", zorder_key(F.col("x"), F.col("y"), _LAYOUT_BITS))
    hkeyed = with_hilbert(pts, F.col("x"), F.col("y"), _LAYOUT_BITS)
    stats = (layout_file_spans(zkeyed, "zkey", 64, _LAYOUT_SHIFT)
             .withColumn("layout", F.lit("zorder"))
             .unionByName(
                 layout_file_spans(hkeyed, "hkey", 64, _LAYOUT_SHIFT)
                 .withColumn("layout", F.lit("hilbert"))))
    ts = _LAYOUT_TILE
    rects = spark.createDataFrame(
        [(qx * ts, qx * ts + ts - 1, qy * ts, qy * ts + ts - 1)
         for qx in range(4) for qy in range(4)],
        "qx0 long, qx1 long, qy0 long, qy1 long")
    hit = ((F.col("min_x") <= F.col("qx1"))
           & (F.col("max_x") >= F.col("qx0"))
           & (F.col("min_y") <= F.col("qy1"))
           & (F.col("max_y") >= F.col("qy0")))
    return (stats.crossJoin(F.broadcast(rects))
            .groupBy("layout")
            .agg(F.countDistinct("file").alias("n_files"),
                 F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0)))
                  .cast("bigint").alias("touched_pairs"),
                 F.count(F.lit(1)).alias("total_pairs"))
            .orderBy("layout"))


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front over parts (operators/layout.py: skyline2d): the
    cheapest-for-their-size parts — minimize retail cents, maximize
    size (maximize folds into the minimize-minimize kernel by
    negation). Pass 1 streams Arrow batch skylines with zero wide
    exchange; pass 2 broadcast-filters the tiny candidate union exactly
    — the distributive skyline of Börzsönyi et al. ICDE'01. Integer
    dims (cents, size) keep the compare ulp-free."""
    from kafka_connect_streams_spark.operators.layout import skyline2d
    t = load_tables(spark, sf_dir)
    p = t["part"].select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        (-F.col("p_size")).cast("long").alias("neg_size"))
    return (skyline2d(p, "cents", "neg_size", "p_partkey")
            .select("pid", F.col("x").alias("cents"),
                    (-F.col("y")).alias("size")))


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch set algebra (operators/frequency.py:
    kmv_report): per order-priority pair, sketch-estimated vs exact
    |A|, |B|, |A∪B|, |A∩B| over customer sets, k=64 — the mergeable
    distinct-counting family (union by sketch merge, intersection by
    theta filter), deterministic md5 hashes so even the ESTIMATES
    hash-match the oracle; 4·RSE bound flagged in-plan."""
    from kafka_connect_streams_spark.operators.frequency import kmv_report
    t = load_tables(spark, sf_dir)
    return kmv_report(t["orders"], "o_orderpriority", "o_custkey", k=64)


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join economics (operators/membership.py:
    bloom_semijoin_report): urgent-order customer keys → one broadcast
    bit-position array; customers probe it with 3 in-row
    array_contains — the runtime-filter trick made explicit, with
    candidates / true matches / false positives / fp rate scored
    exactly and the no-false-negatives soundness flag in-plan."""
    from kafka_connect_streams_spark.operators.membership import (
        bloom_semijoin_report)
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return bloom_semijoin_report(urgent, "o_custkey",
                                 t["customer"], "c_custkey")


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked delta-encoded inverted index (operators/indexing.py:
    inverted_index): word → per-128-doc-block (df, total tf, gap-coded
    postings). Blocking bounds every row's payload and spreads hot
    words across reducers; delta coding is computed in-row from the
    sorted array. The IR-index build workload as one shuffle."""
    from kafka_connect_streams_spark.operators.indexing import (
        inverted_index)
    t = load_tables(spark, sf_dir)
    return inverted_index(t["documents"], "text", "doc_id",
                          block_size=128)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, 3 rounds (operators/bpe.py: bpe_merges):
    corpus word-frequency table → iterated most-frequent-adjacent-pair
    merges with the (count DESC, lhs, rhs) total tie order and the
    no-self-merge variant that makes merge application pure
    per-position logic in both engines. The corpus is scanned ONCE;
    the training loop iterates over the checkpointed |vocab|-row
    symbol table (the trained-PQ discipline). Emits the merge table
    plus the post-merge corpus token counts — the compression curve.
    The loop is UNROLLED into the SQL twin (bpe_round_sql), so this is
    a full hash row, not rows-only."""
    from kafka_connect_streams_spark.operators.bpe import bpe_merges
    t = load_tables(spark, sf_dir)
    return bpe_merges(spark, t["documents"], "text", "doc_id", rounds=3)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY at corpus scale (operators/bpe.py bpe_encode):
    train 3 BPE merges on the corpus word-frequency table, then encode
    EVERY document with them in-row — (doc_id, n_tokens, token_ids),
    the real-token-count materialization a training pipeline allocates
    budgets by. The learned merge table is inlined as a literal and
    applied as an aggregate fold per word (each round's symbol array is
    a bound lambda variable, evaluated once), so the encode pass is
    map-only: no explode, no join, no shuffle touches the corpus.
    Token ids are the repo's md5-affine 48-bit hash. The oracle unrolls
    the same 3 training rounds (bpe_round_sql), whose round-R symbol
    table IS the encoded vocabulary, and maps documents through it.

    Driver contract (r10 red row): the registered query must emit only
    SCALAR columns — the driver's pandas canonicalizer sort_values all
    columns and list cells are unhashable. So the array API's
    ``token_ids`` is serialized to ``ids_md5 = md5(comma-joined ids)``
    here; empty/NULL-text documents hash the empty string on BOTH
    engines (Spark array_join([])='' vs DuckDB array_to_string([])=NULL
    — the oracle coalesces; pinned by a fixture test)."""
    from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                           bpe_merges)
    t = load_tables(spark, sf_dir)
    mt = bpe_merges(spark, t["documents"], "text", "doc_id",
                    rounds=3).collect()
    merges = [(r.lhs, r.rhs)
              for r in sorted(mt, key=lambda r: r.round)]
    enc = bpe_encode(t["documents"], "text", "doc_id", merges)
    return enc.select(
        "doc_id", "n_tokens",
        F.md5(F.expr("array_join(transform(token_ids, "
                     "t -> cast(t as string)), ',')")).alias("ids_md5"))


def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/dbt-style data-quality constraint audit in one report:
    primary-key uniqueness, referential integrity (left-anti semi
    counts — the FK check that never materializes the join; dims
    broadcast, corpus-sized parents stay AQE-size-driven), domain
    rules, and not-null checks across four tables. Each check is one
    aggregate over one scan; the report unions the scalar rows. The
    audit every 100 TB ingest runs before promoting a partition."""
    t = load_tables(spark, sf_dir)

    def check(name: str, checked, violations) -> DataFrame:
        return (violations.select(
            F.lit(name).alias("check_name"),
            checked.alias("n_checked"),
            F.col("v").alias("n_violations"),
            (F.col("v") == 0).alias("pass")))

    orders, customer, li, part = (t["orders"], t["customer"],
                                  t["lineitem"], t["part"])
    pk_o = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v"))
    pk_c = customer.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("c_custkey")).alias("v"))
    # no broadcast hint on customer: the FK parent is corpus-sized at
    # scale (unlike part below) — AQE picks broadcast at test SFs and
    # a shuffled semi at 100×, both correct
    fk_oc = (orders.join(customer.select("c_custkey"),
                         orders.o_custkey == F.col("c_custkey"),
                         "left_anti")
             .agg(F.count("*").alias("v"))
             .crossJoin(orders.agg(F.count("*").alias("n"))))
    fk_lp = (li.join(F.broadcast(part.select("p_partkey")),
                     li.l_partkey == F.col("p_partkey"), "left_anti")
             .agg(F.count("*").alias("v"))
             .crossJoin(li.agg(F.count("*").alias("n"))))
    dom_disc = li.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("l_discount") < 0)
               | (F.col("l_discount") > 1)).cast("bigint")).alias("v"))
    dom_qty = li.agg(
        F.count("*").alias("n"),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("v"))
    nn_date = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_orderdate").isNull().cast("bigint")).alias("v"))
    report = (check("pk_unique_orders", F.col("n"), pk_o)
              .unionAll(check("pk_unique_customer", F.col("n"), pk_c))
              .unionAll(check("fk_orders_customer", F.col("n"), fk_oc))
              .unionAll(check("fk_lineitem_part", F.col("n"), fk_lp))
              .unionAll(check("domain_discount_0_1", F.col("n"), dom_disc))
              .unionAll(check("domain_quantity_pos", F.col("n"), dom_qty))
              .unionAll(check("not_null_orderdate", F.col("n"), nn_date)))
    return report.orderBy("check_name")


def q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide block-level exact dedup with reconstruction (Lee et
    al. exact-substring dedup at 8-token block granularity): every
    block seen earlier in (doc_id, block_id) order is removed and each
    doc is rebuilt from its survivors. Output per doc: block counts,
    surviving token count, md5 of the reconstructed text."""
    from kafka_connect_streams_spark.operators.text import block_dedup
    t = load_tables(spark, sf_dir)
    return block_dedup(t["documents"], "text", "doc_id", size=8)


def q_block_dedup_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block_dedup's extreme-scale shape (round-7 verdict #5): the
    first-occurrence window shuffles ONLY (doc, block_id, fingerprint),
    surviving block ids aggregate to one array per doc, and a second
    corpus scan re-joins the token arrays by id for in-row rebuild —
    text crosses the wire once instead of twice. Same oracle as
    block_dedup: the two shapes are decision- and output-identical."""
    from kafka_connect_streams_spark.operators.text import block_dedup
    t = load_tables(spark, sf_dir)
    return block_dedup(t["documents"], "text", "doc_id", size=8,
                       shape="fp_rejoin")


def q_block_dedup_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window exact-substring dedup (operators/text.py
    block_dedup_rolling): stride-1 8-token window fingerprints close
    block_dedup's boundary blind spot — any shared span of ≥ 8 tokens
    is guaranteed caught, including spans shorter than two blocks that
    straddle a block boundary (a planted-straddle property test pins
    the case block_dedup provably misses). Duplicate-covered tokens are
    removed via an in-row interval merge + gap slicing; output per doc:
    window counts, surviving token count, md5 of the rebuilt text."""
    from kafka_connect_streams_spark.operators.text import (
        block_dedup_rolling)
    t = load_tables(spark, sf_dir)
    return block_dedup_rolling(t["documents"], "text", "doc_id", k=8)


def q_bm25_multiterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term Okapi BM25 retrieval (operators/text.py
    bm25_multiterm): corpus-wide top-25 documents for a 4-term query
    (the 4 highest-df terms), score = Σ idf_e6·tfsat_e9 per matched
    term — BIGINT fixed point, so the cross-term sum is
    order-insensitive and hash-exact (bm25_term_topk's single-term
    ranking never exercises idf weighting BETWEEN terms; this does).
    Query terms broadcast; global top-k is TakeOrderedAndProject."""
    from kafka_connect_streams_spark.operators.text import bm25_multiterm
    t = load_tables(spark, sf_dir)
    return bm25_multiterm(t["documents"], "text", "doc_id",
                          n_terms=4, k=25)


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (operators/similarity.py
    mmr_diversify): per query (vec_id % 100 == 0), greedily select 5 of
    the 25 most-cosine-relevant candidates maximizing λ·rel −
    (1−λ)·max-sim-to-selected (λ=0.7) — the rerank that stops top-k
    returning near-copies. All comparisons are e6 fixed-point BIGINTs
    (zero-norm → 0), the greedy runs IN-ROW over one collected
    candidate array per query, and the oracle unrolls the 4 greedy
    rounds relationally (_mmr_round_sql)."""
    from kafka_connect_streams_spark.operators.similarity import (
        mmr_diversify)
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    is_q = F.col("id") % 100 == 0
    return mmr_diversify(emb.filter(is_q), emb.filter(~is_q),
                         k=5, n_cand=25, lam_pct=70)


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty (operators/text.py ngram_novelty):
    fraction of each doc's distinct n-grams whose FIRST corpus
    occurrence (lowest doc_id) is in that doc — the marginal-
    contribution curve a curation pipeline watches while scaling a
    source (text_repetition is within-doc; this is cross-doc).
    Gram fingerprints are xxhash64'd in-row before any shuffle (a
    plan-internal fingerprint — it only defines the grouping and never
    reaches the output, so no cross-engine digest is needed; the oracle
    groups by the gram text via md5, an equivalent partition)."""
    from kafka_connect_streams_spark.operators.text import ngram_novelty
    t = load_tables(spark, sf_dir)
    return ngram_novelty(t["documents"], "text", "doc_id", n=3)


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal payload near-duplicate pairs
    (operators/multimodal.py payload_simhash + media_neardup): byte-
    level 48-bit SimHash of each opaque binary payload (gram hashes and
    ±1 bit votes exactly as the text dedup_simhash — computed entirely
    IN-ROW over the hexed payload, zero shuffles for the fingerprint),
    then banded candidate pairs (4 × 12-bit bands; lossless for
    hamming ≤ 3 by pigeonhole) verified by exact bit_count(a ^ b).
    The re-encoded-copy / shifted-container detector of a multimodal
    ingest; a real perceptual hash (pHash/chromaprint) plugs in at the
    decode seam and reuses the same banding/verify machinery. Only
    fixed-width (id, band, key, fingerprint) rows reach any exchange;
    hot degenerate buckets (the all-zero fingerprint of empty
    payloads) are dropped by the stop-bucket cap before the
    self-join."""
    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, media_neardup)
    t = load_tables(spark, sf_dir)
    payloads = attach_payload(t["documents"], "text", "doc_id")
    return media_neardup(payloads, "payload", "doc_id",
                         bits=48, bands=4, max_hamming=3, max_bucket=50)


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real perceptual hashing through a real container round trip
    (operators/multimodal.py media_phash_roundtrip): each document's
    deterministic 16×16 luma is ENCODED as an actual 8-bit grayscale
    BMP, DECODED back by the repo's pure-stdlib BMP parser (the decode
    seam made real — decode_bmp), box-downsampled, and hashed with the
    integer-exact 8×8-DCT pHash (hardcoded 2^20 fixed-point cosine
    table, lower-median threshold, 63-bit fingerprint). The oracle
    computes the pHash directly over the md5 bytes with NO container
    leg, so the driver hash match proves the BMP encode→decode is the
    identity on luma AND the DCT is engine-exact. Arrow-batched
    mapInPandas (the sanctioned multimodal Python path): one scan, zero
    shuffles, fixed per-row cost."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_phash_roundtrip)
    t = load_tables(spark, sf_dir)
    return media_phash_roundtrip(t["documents"], "text", "doc_id")


def q_phash_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED re-encoding tolerance of the 63-bit pHash
    (operators/multimodal.py phash_robustness): per document, the
    baseline pHash of its synthetic luma grid, then the grid uniformly
    quantized at three severities (q = 2, 8, 32 — the integer-exact
    stand-in for progressively lossier re-encoding), pushed through the
    REAL BMP encode→decode leg and re-hashed; report per severity the
    Hamming-distance distribution (n, sum, max) and the within-threshold
    counts at the fingerprint_neardup (≤3) and video_neardup (≤2)
    Hamming cutoffs — the measured-not-claimed number (the
    jl_then_neardup precedent) for how much re-encoding the near-dup
    family tolerates. Plan: one Arrow-batched map (fixed 4 pHash
    evaluations/row) → one map-side-partial groupBy over the 3-value
    severity key — a one-exchange, bounded-output report at any corpus
    size. The quantization is integer-exact, so the DuckDB twin
    reproduces every count with NO container leg: the driver hash match
    proves the quantized-grid encode→decode identity AND the DCT
    arithmetic at every severity simultaneously."""
    from kafka_connect_streams_spark.operators.multimodal import (
        phash_robustness)
    t = load_tables(spark, sf_dir)
    rows = phash_robustness(t["documents"], "text", "doc_id",
                            qs=(2, 8, 32))
    return (rows.groupBy("q")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("hamming").alias("sum_hamming"),
                 F.max("hamming").alias("max_hamming"),
                 F.sum(F.when(F.col("hamming") <= 3, F.lit(1))
                        .otherwise(F.lit(0)).cast("bigint"))
                  .alias("within_fp"),
                 F.sum(F.when(F.col("hamming") <= 2, F.lit(1))
                        .otherwise(F.lit(0)).cast("bigint"))
                  .alias("within_video"))
            .withColumn("sum_hamming", F.col("sum_hamming").cast("bigint"))
            .orderBy("q"))


def q_audiofp_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED requantization tolerance of the audio energy-delta
    fingerprint (operators/multimodal.py audiofp_robustness — the audio
    twin of phash_robustness): per document the baseline fingerprint,
    then every PCM sample requantized at q = 4/64/1024 (14-/10-/6-bit
    audio via the bias-to-unsigned floor spelling), pushed through the
    REAL RIFF/WAVE encode→decode leg and re-fingerprinted; report per
    severity the Hamming distribution (n, sum, max), the count within
    the fingerprint_neardup cutoff (≤3), and the exact-match count.
    Same one-exchange plan as phash_robustness: Arrow map with fixed
    per-row cost → map-side-partial groupBy over the 3-value severity
    key. The DuckDB twin requantizes the md5-derived samples with NO
    container leg, so the driver hash match proves the quantized-sample
    WAV round trip AND the energy arithmetic at every severity."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audiofp_robustness)
    t = load_tables(spark, sf_dir)
    rows = audiofp_robustness(t["documents"], "text", "doc_id",
                              qs=(4, 64, 1024))
    return (rows.groupBy("q")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("hamming").alias("sum_hamming"),
                 F.max("hamming").alias("max_hamming"),
                 F.sum(F.when(F.col("hamming") <= 3, F.lit(1))
                        .otherwise(F.lit(0)).cast("bigint"))
                  .alias("within_fp"),
                 F.sum(F.when(F.col("hamming") == 0, F.lit(1))
                        .otherwise(F.lit(0)).cast("bigint"))
                  .alias("exact_matches"))
            .orderBy("q"))


def q_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection report (operators/pii.py pii_detect) — the
    redaction-stage audit of a curation pipeline: per document, the
    independent match counts for the email / IPv4 / phone detectors
    plus a has_pii flag. The corpus carries no PII, so the registered
    query runs the detectors over the deterministic md5-derived
    contact enrichment (attach_contacts — the md5_luma_grid precedent:
    each class lands on its own ~1/3 of docs, mixing 0–3-class
    positives with ~30% true negatives). Zero-shuffle Scan → Project,
    JVM regex inside whole-stage codegen, stream-transparent; the
    patterns live in the Java-regex ∩ RE2 subset so the DuckDB twin
    matches byte-for-byte."""
    from kafka_connect_streams_spark.operators.pii import (
        attach_contacts, pii_detect)
    t = load_tables(spark, sf_dir)
    enr = attach_contacts(t["documents"].select("doc_id", "text"))
    return pii_detect(enr)


def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/pii.py pii_mask) over the same
    enriched corpus as pii_report: sequential in-place masking to
    [EMAIL] / [IPV4] / [PHONE] in the pinned order (EMAIL first so an
    address with a dotted-quad local part redacts as one token), plus
    a measured-not-claimed ``residual`` column that RE-RUNS all three
    detectors over the masked text — the driver row verifies the
    redaction actually zeroed the corpus, not just that the replace
    ran. Zero-shuffle projection; the masked text itself is
    hash-compared against the DuckDB twin, pinning both the match
    spans and the replacement semantics across engines."""
    from kafka_connect_streams_spark.operators.pii import (
        attach_contacts, pii_mask)
    t = load_tables(spark, sf_dir)
    enr = attach_contacts(t["documents"].select("doc_id", "text"))
    return pii_mask(enr)


def q_media_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-modality dedup clusters: the banded byte-SimHash near-dup
    pairs (media_neardup) fed into connected components — the same
    pairs→graph→canonical composition embedding_dedup_clusters runs for
    the embedding modality, completing cluster resolution for all three
    modalities (text: dedup_clusters; embeddings:
    embedding_dedup_clusters; media payloads: this). One canonical
    payload (min doc_id) per cluster; the CC rounds are exact-or-raise
    over the pair graph, never the corpus."""
    from kafka_connect_streams_spark.operators.dedup import (
        connected_components)
    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, media_neardup)
    t = load_tables(spark, sf_dir)
    payloads = attach_payload(t["documents"], "text", "doc_id")
    pairs = media_neardup(payloads, "payload", "doc_id",
                          bits=48, bands=4, max_hamming=3,
                          max_bucket=50).select("id_a", "id_b")
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    return (t["documents"].select(F.col("doc_id").cast("bigint").alias("doc_id"))
            .join(labels, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("label", F.col("doc_id")).alias("cluster_id"))
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("cluster_id")))


def q_media_audiofp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of media_phash (operators/multimodal.py
    media_audiofp_roundtrip): each document's md5-derived PCM waveform
    is ENCODED as a real RIFF/WAVE container, DECODED back by the
    repo's pure-stdlib WAV parser (decode_wav — the audio decode seam
    made real), and fingerprinted with the integer-exact 63-bit
    energy-delta hash (64 fixed frames, bit f = E_f > E_{f+1} — the
    simplified chromaprint-style delta). The oracle fingerprints the
    md5 bytes directly with NO container leg, so the driver hash match
    proves the WAV encode→decode identity AND the fingerprint
    arithmetic simultaneously. Arrow mapInPandas, one scan, fixed
    per-row cost."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_audiofp_roundtrip)
    t = load_tables(spark, sf_dir)
    return media_audiofp_roundtrip(t["documents"], "text", "doc_id")


def q_media_videofp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video leg of the real-container battery
    (operators/multimodal.py media_videofp_roundtrip): each document's
    four md5-derived 16×16 luma frames are ENCODED as an actual
    YUV4MPEG2 container (the public yuv4mpeg(5) stream layout), DECODED
    back by the repo's pure-stdlib Y4M parser (decode_y4m — the ffmpeg
    seam made real), and every decoded frame is pHashed with the same
    integer-exact DCT the image leg uses. One row per (doc, frame).
    The oracle pHashes the md5 bytes directly with NO container leg, so
    the driver hash match proves the Y4M encode→decode identity on
    every frame AND the DCT arithmetic simultaneously. Arrow
    mapInPandas, one scan, fixed n_frames fan-out per row."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_videofp_roundtrip)
    t = load_tables(spark, sf_dir)
    return media_videofp_roundtrip(t["documents"], "text", "doc_id")


def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs by frame-fingerprint voting
    (operators/multimodal.py video_neardup over the
    media_videofp_roundtrip frame table): two documents' videos pair
    when ≥2 frame pairs — any index combination, so temporal shifts
    still match — are within 2 bits of pHash Hamming distance. Frames
    ride the existing banded machinery (fingerprint_neardup, 63-bit
    hashes in 3×21-bit bands — pigeonhole-lossless for hamming ≤ 2,
    hot-bucket cap, localCheckpoint-pinned skinny table) under a
    synthetic doc·64+frame id, then collapse to doc pairs with a
    map-side-combinable count. Completes the near-dup battery across
    modalities: text (media_neardup), embeddings (embedding_neardup),
    video (here)."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_videofp_roundtrip, video_neardup)
    t = load_tables(spark, sf_dir)
    frames = media_videofp_roundtrip(t["documents"], "text", "doc_id")
    return video_neardup(frames)


def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the per-frame pHash table
    (operators/multimodal.py video_scene_cuts over
    media_videofp_roundtrip): a cut is a frame >= 16 pHash bits from
    its predecessor — the fingerprint-delta segmentation a frame
    sampler uses to keep one frame per scene. One ordered lag window
    partitioned by the video id (bounded fan-in: the sampler fixes
    frames-per-video), Hamming delta in-row."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_videofp_roundtrip, video_scene_cuts)
    t = load_tables(spark, sf_dir)
    frames = media_videofp_roundtrip(t["documents"], "text", "doc_id")
    return video_scene_cuts(frames)


def q_block_dedup_minspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact-substring dedup with the Lee-et-al. minimum
    match length (operators/text.py block_dedup_rolling, min_span=16
    over k=8 windows; the paper's production setting is 50 tokens):
    duplicate windows merge into maximal covered intervals and only
    intervals spanning >= 16 tokens are removed, so an incidental
    8-gram collision (a common phrase) no longer deletes text while
    every shared span >= 16 tokens is still removed in full. Same
    skew-safe plan as block_dedup_rolling — the threshold is one
    in-row filter over the merged interval array; the oracle merges
    intervals via gaps-and-islands (break when pos > prev + k) and
    applies the same length cut."""
    from kafka_connect_streams_spark.operators.text import (
        block_dedup_rolling)
    t = load_tables(spark, sf_dir)
    return block_dedup_rolling(t["documents"], "text", "doc_id",
                               k=8, min_span=16)


def q_ksql_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KSQL 5.1 rewriter surface under the oracle gate
    (functions/ksql_functions.py rewrite_ksql_sql; the functions belong
    to the ksql 5.1.0 engine the reference embeds, pom.xml:55-59).
    Fifteen ksql spellings — the MASK family incl. the '-' 'other'
    class (r11 ADVICE), GEO_DISTANCE (haversine with a case-insensitive
    unit alias), a STRINGTODATE/DATETOSTRING roundtrip,
    SUBSTRING/LEN/UCASE/LCASE/CONCAT/IFNULL/NULLIF, and the
    TOPK/HISTOGRAM aggregates — driven THROUGH the SQL front end
    (KsqlContext.sql → rewrite_ksql_sql → spark.sql), never the
    DataFrame registry, so the rewrite templates themselves are what
    the hash verifies. Determinism conventions: GEO_DISTANCE floors to
    0.1-km units (the only float-trig column; the worst nonzero
    floor-boundary margin across all SFs is ~2.4e-5 grid units vs a
    cross-engine libm-vs-JVM trig deviation of ~2e-8 — 1000× headroom,
    margin-pinned in test_driver_contract); TOPK/HISTOGRAM arrays/maps
    serialize to sorted CSV strings (the scalar-gate convention) before
    the final broadcast join of the 5-row group table. Scale shape: one
    pruned scan per leg, one O(|priorities|) aggregation shuffle,
    broadcast join back."""
    from kafka_connect_streams_spark.sql.ksql import KsqlContext
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("ksqlfn_orders")
    ctx = KsqlContext(spark, resolver=lambda name: t["orders"])
    grouped = ctx.sql("""
        SELECT o_orderpriority AS grp,
               COUNT(*) AS n_rows,
               TOPK(o_orderkey % 97, 3) AS top_mod,
               HISTOGRAM(LCASE(o_orderstatus)) AS hist
        FROM ksqlfn_orders
        WHERE o_orderkey % 29 = 0
        GROUP BY o_orderpriority""")
    (grouped.select(
        "grp", "n_rows",
        F.array_join(F.transform("top_mod",
                                 lambda x: x.cast("string")), ",")
        .alias("top_mod_csv"),
        F.array_join(F.transform(
            F.array_sort(F.map_entries("hist")),
            lambda e: F.concat(e["key"], F.lit("="),
                               e["value"].cast("string"))), ",")
        .alias("hist_csv"))
     .createOrReplaceTempView("ksqlfn_grouped"))
    return ctx.sql("""
        SELECT r.id, r.grp, r.masked, r.mkl, r.mkr, r.ml, r.mr,
               r.status_u, r.prio_len, r.prio_word, r.dstr,
               CAST(r.days_rt AS BIGINT) AS days_rt, r.geo_dm,
               r.status_or_open, g.n_rows, g.top_mod_csv, g.hist_csv
        FROM (SELECT o_orderkey AS id,
                     o_orderpriority AS grp,
                     MASK(CONCAT(CONCAT(o_orderpriority, '#'),
                                 o_orderstatus)) AS masked,
                     MASK_KEEP_LEFT(o_orderpriority, 3) AS mkl,
                     MASK_KEEP_RIGHT(o_orderpriority, 4) AS mkr,
                     MASK_LEFT(o_orderpriority, 2) AS ml,
                     MASK_RIGHT(o_orderpriority, 2) AS mr,
                     UCASE(LCASE(o_orderstatus)) AS status_u,
                     CAST(LEN(o_orderpriority) AS BIGINT) AS prio_len,
                     SUBSTRING(o_orderpriority, 3, 6) AS prio_word,
                     DATETOSTRING(CAST(o_orderkey % 20000 AS INT),
                                  'yyyy-MM-dd') AS dstr,
                     STRINGTODATE(DATETOSTRING(
                         CAST(o_orderkey % 20000 AS INT), 'yyyy-MM-dd'),
                         'yyyy-MM-dd') AS days_rt,
                     CAST(FLOOR(GEO_DISTANCE(
                         CAST(o_orderkey % 89 AS DOUBLE),
                         CAST(o_custkey % 179 AS DOUBLE),
                         CAST(o_orderkey % 67 AS DOUBLE),
                         CAST(o_custkey % 131 AS DOUBLE),
                         'KM') * 10) AS BIGINT) AS geo_dm,
                     IFNULL(NULLIF(o_orderstatus, 'O'), 'open')
                         AS status_or_open
              FROM ksqlfn_orders
              WHERE o_orderkey % 29 = 0) r
        JOIN ksqlfn_grouped g ON r.grp = g.grp""")


def q_vocab_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-concentration report: type-token ratio,
    hapax-legomena share, top-10 token mass — the corpus-health
    diagnostics run before mixing sources (templated/spam sources show
    a fat head and few hapaxes). Exact integers + e9 fixed-point."""
    from kafka_connect_streams_spark.operators.text import (
        vocab_concentration)
    t = load_tables(spark, sf_dir)
    return vocab_concentration(t["documents"], "text", "source", top=10)


def q_cosine_pair_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar document pairs by term-frequency cosine via a
    df-pruned postings self-join (Bayardo et al. all-pairs similarity):
    integer dots/norms, cos² ranking in e9 fixed-point, global top-k as
    TakeOrderedAndProject."""
    from kafka_connect_streams_spark.operators.indexing import (
        cosine_pair_topk)
    t = load_tables(spark, sf_dir)
    return cosine_pair_topk(t["documents"], "text", "doc_id",
                            k=20, max_df=50)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event-type stream into change intervals (new version only
    when the value CHANGES) with valid_from / valid_to / is_current —
    the warehouse changelog-compaction pattern. One shuffle by user;
    windows are per-user (never a global sort); the (ts, event_id)
    total order makes versioning deterministic."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (t["events"]
            .select("user_id", "event_id", "event_type", "ts")
            .withColumn("chg", (F.lag("event_type").over(w).isNull()
                                | (F.col("event_type")
                                   != F.lag("event_type").over(w)))
                        .cast("bigint"))
            .withColumn("version", F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    hist = (runs.groupBy("user_id", "version")
            .agg(F.min("event_type").alias("event_type"),  # constant per run
                 F.min("ts").alias("valid_from"),
                 F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("version")
    return (hist
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select("user_id", "version", "event_type", "valid_from",
                    "valid_to", "n_events", "is_current")
            .orderBy("user_id", "version"))


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (time-travel) snapshot from the SCD2 history: each user's
    dimension version in effect at T — ``valid_from <= T <
    coalesce(valid_to, +inf)``. The read side of the warehouse
    changelog-compaction pattern; same one-shuffle-per-user shape as
    the history build, then a per-row interval filter."""
    hist = q_scd2_history(spark, sf_dir)
    T = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    return (hist.filter((F.col("valid_from") <= T)
                        & (F.col("valid_to").isNull()
                           | (F.col("valid_to") > T)))
            .select("user_id", "version", "event_type", "valid_from",
                    "valid_to", "n_events")
            .orderBy("user_id"))


def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a BASE aggregate (orders
    before 1995-06-01) merged with a DELTA aggregate (orders after) via
    the algebraic merge rules — sums add, counts add, min/max fold, avg
    derives from merged sums — and the oracle recomputes the aggregate
    FLAT over the whole table, so the hash match IS the proof that
    merge(partial, partial) == recompute: the property that lets a
    100 TB rollup absorb a day's partition without rescanning history.
    Prices are exact integer cents; avg is truncating integer division.
    """
    t = load_tables(spark, sf_dir)
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    split = F.lit("1995-06-01").cast("timestamp_ntz")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"))

    base = partial(t["orders"].filter(F.col("o_orderdate") < split))
    delta = partial(t["orders"].filter(F.col("o_orderdate") >= split))
    merged = (base.unionByName(delta)
              .groupBy("o_orderpriority")
              .agg(F.sum("n").alias("n_orders"),
                   F.sum("sum_cents").alias("sum_cents"),
                   F.min("min_cents").alias("min_cents"),
                   F.max("max_cents").alias("max_cents")))
    return (merged.select(
        "o_orderpriority", "n_orders", "sum_cents", "min_cents",
        "max_cents",
        F.expr("sum_cents DIV n_orders").alias("avg_cents"))
        .orderBy("o_orderpriority"))


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the event stream: for every purchase,
    the user's FIRST and LAST touch (click/view) within a 7-day
    lookback, plus the touch count — first-touch/last-touch
    attribution as one per-user range-frame window (no self-join, no
    per-pair expansion; the frame is evaluated in a single sorted pass
    per user). Timestamps are exact integer microseconds on both
    engines (unix_micros ↔ epoch_us)."""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    touch_us = F.when(F.col("event_type").isin("click", "view"),
                      F.col("us"))
    week = 7 * 24 * 3600 * 1_000_000
    w = (Window.partitionBy("user_id").orderBy("us")
         .rangeBetween(-week, 0))
    ev = t["events"].withColumn("us", us)
    attributed = (ev
                  .withColumn("first_touch_us", F.min(touch_us).over(w))
                  .withColumn("last_touch_us", F.max(touch_us).over(w))
                  .withColumn("n_touches",
                              F.count(touch_us).over(w)))
    return (attributed.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", F.col("us").alias("conv_us"),
                    "first_touch_us", "last_touch_us", "n_touches")
            .orderBy("event_id"))


def q_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prunability A/B report: for a 2-D range predicate on
    lineitem (ship-day × partkey-bucket), how many file-sized buckets a
    min-max-pruning scan skips under a LINEAR (single-dimension sort)
    layout vs a Z-ORDER layout — the quantified version of the
    zorder_layout story: the Morton layout turns a second-dimension
    predicate into real file skipping, the linear layout cannot. One
    corpus-bucket aggregate per layout (~64 keys each, map-side
    combine), then a 2-row report: buckets pruned and rows skipped,
    with the true selected-row count as the honesty column (identical
    in both layouts — pruning changes I/O, never results)."""
    from kafka_connect_streams_spark.operators.layout import zorder_key
    t = load_tables(spark, sf_dir)
    x = F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1992-01-01").cast("date")).cast("long")
    y = F.col("l_partkey").bitwiseAND(4095).cast("long")
    pts = t["lineitem"].select(x.alias("x"), y.alias("y"))
    X_LO, X_HI, Y_LO, Y_HI = 1100, 3500, 256, 287
    hit = ((F.col("x").between(X_LO, X_HI))
           & (F.col("y").between(Y_LO, Y_HI))).cast("bigint")

    def report(bucket_col, name):
        per_bucket = (pts.withColumn("bucket", bucket_col)
                      .groupBy("bucket")
                      .agg(F.count("*").alias("n_rows"),
                           F.min("x").alias("min_x"),
                           F.max("x").alias("max_x"),
                           F.min("y").alias("min_y"),
                           F.max("y").alias("max_y"),
                           F.sum(hit).alias("n_selected")))
        pruned = ((F.col("max_x") < X_LO) | (F.col("min_x") > X_HI)
                  | (F.col("max_y") < Y_LO) | (F.col("min_y") > Y_HI))
        return per_bucket.agg(
            F.lit(name).alias("layout"),
            F.count("*").alias("n_buckets"),
            F.sum(pruned.cast("bigint")).alias("buckets_pruned"),
            F.sum(F.when(pruned, F.col("n_rows")).otherwise(0))
            .alias("rows_skipped"),
            F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
            .alias("rows_scanned"),
            F.sum("n_selected").alias("rows_selected"))

    linear = report(F.expr("x DIV 40"), "linear_x")
    zord = report(F.shiftright(zorder_key(F.col("x"), F.col("y"), 12),
                               18), "zorder")
    return linear.unionByName(zord).orderBy("layout")


#: hard-negative mining knobs, shared by the query and its recall eval.
_HN_PLANES = 8
_HN_TABLES = 4
_HN_K = 3


def _hard_negative_candidates(emb: DataFrame) -> DataFrame:
    """Bucketed (q_id, c_id) candidate pairs for hard-negative mining:
    4 independent hyperplane-LSH tables over the whole corpus
    (OR-amplification), and within each table anchors (id % 100 == 0)
    multiprobe their own bucket plus every Hamming-distance-1 bucket
    (one bit flipped per plane) — both standard LSH recall levers, and
    both fan out ONLY the 1% anchor side (×tables×(planes+1)) and the
    two-long signature rows (×tables), never the vectors. The
    probe-candidate join carries NO strategy hint: the probe side is
    ~0.36 rows per corpus row, so a forced broadcast grows linearly
    with the corpus and breaks past the broadcast limit at 100 TB —
    AQE picks broadcast at small scale and a partitioned hash join
    beyond it (the plan pin asserts cartesian-free, not
    broadcast-present; r8 ADVICE). The cross-table union dedups with
    one (q_id, c_id) distinct — the same 100 TB shape as the
    MinHash-LSH band machinery (per-band buckets, unioned
    candidates)."""
    from kafka_connect_streams_spark.operators.similarity import (
        hyperplane_signatures_multi)
    # r14: pin the multi-table signature — the probe and candidate
    # branches are two consumers of the same corpus projection
    sig = hyperplane_signatures_multi(
        emb, "id", "embedding",
        planes=_HN_PLANES, tables=_HN_TABLES).localCheckpoint(eager=False)
    probes = (sig.filter(F.col("id") % 100 == 0)
              .select(F.col("id").alias("q_id"), "tbl", F.explode(F.array(
                  F.col("bucket"),
                  *[F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("bigint"))
                    for p in range(_HN_PLANES)])).alias("bucket")))
    cand = sig.select(F.col("id").alias("c_id"), "tbl", "bucket")
    return (probes.join(cand, ["tbl", "bucket"])
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id").distinct())


def _hard_negative_rank(emb: DataFrame, pairs: DataFrame,
                        k: int = _HN_K) -> DataFrame:
    """Exact quantized rescoring + label anti-filter + per-anchor top-k
    over a (q_id, c_id) candidate set — the part of hard-negative mining
    that never changes when the candidate generator does."""
    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _quantized)

    def side(pred, id_out, label_out, v_out, n_out):
        return (emb.filter(pred) if pred is not None else emb) \
            .select(F.col("id").alias(id_out),
                    F.col("label").alias(label_out),
                    _quantized(F.col("embedding")).alias(v_out)) \
            .withColumn(n_out, _dot(F.col(v_out), F.col(v_out)))

    q = side(F.col("id") % 100 == 0, "q_id", "q_label", "_qv", "qn")
    c = side(None, "c_id", "c_label", "_cv", "cn")
    # no broadcast hint on the anchor side: 1% of the corpus WITH
    # vectors grows linearly and breaks any broadcast limit at 100 TB —
    # AQE picks broadcast at small scale, partitioned hash join beyond
    # (the same reasoning that removed the probe-join hint, r8 ADVICE)
    scored = (pairs.join(q, "q_id").join(c, "c_id")
              .filter(F.col("q_label") != F.col("c_label"))
              .withColumn("cosine", _cosine(
                  _dot(F.col("_qv"), F.col("_cv")),
                  F.col("qn"), F.col("cn"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "q_label", "c_id", "c_label", "cosine",
                    "rank"))


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining: for each sampled
    anchor vector (id % 100 == 0), the top-3 most-similar candidates
    with a DIFFERENT label — the pass that makes embedding/contrastive
    training work (easy negatives teach nothing; the hardest
    same-looking other-class examples carry the gradient).

    Candidate generation is hyperplane-LSH bucketed with Hamming-1
    multiprobe on the anchor side (see :func:`_hard_negative_candidates`
    — never an anchors × corpus cross join, whose pair count grows
    quadratically with the corpus); rescoring is exact quantized cosine
    with the same in-row dot/norm machinery as the ann_* family. The
    approximation is the standard ANN recall tradeoff, measured by
    ``hard_negatives_recall`` against the exact (scale-guarded)
    ground truth."""
    t = load_tables(spark, sf_dir)
    # r14: pin the corpus — the LSH tables, the anchor qvec side and the
    # candidate qvec side are three consumers of the same scan
    emb = (t["embeddings"].select(F.col("vec_id").alias("id"),
                                  "embedding", "label")
           .localCheckpoint(eager=False))
    return _hard_negative_rank(emb, _hard_negative_candidates(emb))


def q_hard_negatives_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall eval for ``hard_negatives``: the exact brute-force top-3
    (the pre-round-8 crossJoin shape, now scale-guarded by ``max_pairs``
    exactly like topk_cosine) is ground truth; the bucketed multiprobe
    result is the system under test. One row: anchors covered, exact vs
    approx pair counts, hits, recall — the eval harness the round-7
    verdict asked to keep when the registered query went bucketed."""
    from kafka_connect_streams_spark.operators.similarity import (
        MAX_BRUTE_PAIRS, cosine_pairs)
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"),
                                 "embedding", "label")
    anchors = emb.filter(F.col("id") % 100 == 0)
    exact_pairs = (cosine_pairs(anchors.select("id", "embedding"),
                                emb.select("id", "embedding"),
                                max_pairs=MAX_BRUTE_PAIRS)
                   .filter(F.col("q_id") != F.col("c_id"))
                   .select("q_id", "c_id"))
    exact = _hard_negative_rank(emb, exact_pairs).select("q_id", "c_id")
    approx = (_hard_negative_rank(emb, _hard_negative_candidates(emb))
              .select(F.col("q_id").alias("a_q_id"),
                      F.col("c_id").alias("a_c_id"))
              .withColumn("hit", F.lit(1)))
    joined = exact.join(
        approx, (F.col("q_id") == F.col("a_q_id"))
        & (F.col("c_id") == F.col("a_c_id")), "left").select(
            "q_id", "c_id", F.coalesce("hit", F.lit(0)).alias("hit"))
    return joined.agg(
        F.countDistinct("q_id").alias("n_anchors"),
        F.count("*").alias("exact_pairs"),
        F.sum("hit").alias("hits"),
        (F.sum("hit") / F.count("*")).alias("recall"))


def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (the Debezium-consumer / MERGE INTO pattern):
    treat the event stream as an ordered upsert/delete log per user —
    'error' events are tombstones, everything else upserts — and
    materialize the final table state: last surviving value per key,
    keys whose LAST op is a delete absent from the result. One
    row_number window per key on the (ts, event_id) total order; no
    key's history is ever replayed more than once, and the shuffle
    carries (key, op, value), never the log."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    log = (t["events"]
           .select("user_id", "event_id", "ts", "event_type",
                   F.when(F.col("event_type") == "error", F.lit("delete"))
                   .otherwise(F.lit("upsert")).alias("op")))
    latest = (log.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1))
    n_ops = (log.groupBy("user_id")
             .agg(F.count("*").alias("n_changes"),
                  F.sum((F.col("op") == "delete").cast("bigint"))
                  .alias("n_deletes")))
    return (latest.filter(F.col("op") == "upsert")
            .join(n_ops, "user_id")
            .select("user_id",
                    F.col("event_type").alias("last_value"),
                    F.col("ts").alias("updated_at"),
                    "n_changes", "n_deletes")
            .orderBy("user_id"))


#: Poisson(1) inverse-CDF thresholds scaled to 2^30 (exact ints, same
#: constants inlined in the DuckDB oracle): replicate weight w = number
#: of thresholds a 30-bit hash clears — P(w=k) = e^-1/k!, capped at 8.
_POISSON_CUM_E30 = (395007542, 790015084, 987518855, 1053353445,
                    1069812093, 1073103822, 1073652444, 1073730819)


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap of the mean order price: 32 resamples in
    ONE scan via deterministic per-(row, replicate) Poisson(1) weights
    (the standard Poisson bootstrap — multinomial resampling needs the
    global count up front; Poisson(1) weights are independent per row,
    so the resample is embarrassingly parallel and streaming-friendly).
    The weight is an exact integer inverse-CDF ladder on a 30-bit md5
    hash, so both engines draw the identical resample; weighted sums
    run in DECIMAL (order-insensitive), and the only doubles are one
    final division per replicate. The ×32 fan-out never materializes:
    explode feeds a map-side partial aggregate that collapses each
    partition to ≤32 rows before the one 32-group shuffle. ``ci_rank``
    orders the replicate means (a 32-row window): ranks 2 and 31 of 32
    bound the ~94% percentile CI."""
    t = load_tables(spark, sf_dir)
    # r10 rewrite (found by the bench's switch to full evaluation —
    # count() had pruned the whole weight ladder, hiding a 10.7 s/sf0.1
    # true cost): one md5 PER (row, replicate) was 32 digests/row, and
    # the ×32 explode amplified every corpus row before the partial
    # aggregate. Now 8 digests/row each yield FOUR 30-bit replicate
    # hashes (8-hex slices div 4), digests/hashes/weights are flat
    # column expressions (whole-stage-codegen'd with subexpression
    # elimination — measured faster than the lambda/HOF form, which
    # runs interpreted), prices ride as exact bigint CENTS (decimal
    # multiply was the other hotspot; at >1e15-cent corpus mass move
    # the product sums to DECIMAL(38,0)), and all 32 replicates
    # aggregate IN-ROW as 64 map-side partial sums — zero row
    # amplification. Measured 10.7 s → 5.1 s at sf0.1.
    # all expression trees build as parsed SQL strings — the PQ-family
    # lesson: ~500 chained Py4J constructor calls cost ~2 s of DRIVER
    # plan-build per run (measured 7.5 → 5.5 s fresh-plan at sf0.1)
    o = t["orders"].selectExpr(
        "o_orderkey",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        " as _pc")
    s1 = ["_pc"] + [
        f"md5(concat(cast(o_orderkey as string), ':{i}')) AS _d{i}"
        for i in range(8)]
    # r14 (guide §1.2 per-task work): the inverse-CDF ladder now compares
    # the 8-hex digest slices AS STRINGS instead of conv()-parsing each
    # to an int first — same-length lowercase hex orders lexicographically
    # exactly as its numeric value, and `v div 4 < c  ⟺  v < 4·c` lets
    # the 30-bit thresholds pre-scale into 8-hex literals driver-side.
    # The 32 conv(substring(...),16,10) parses were the single hottest
    # expression block (decomposed A/B: scan 0.44 s, +md5 1.04 s,
    # +conv 3.3 s at sf0.1); dropping them cut the query 5.3 → 3.5 s
    # with bit-identical output (prototype A/B checked all 64 sums).
    s2 = ["_pc"] + [
        f"substring(_d{(b - 1) // 4}, {1 + 8 * ((b - 1) % 4)}, 8)"
        f" AS _s{b}"
        for b in range(1, 33)]

    def _ladder(b: int) -> str:
        s = "CASE"
        for k, c in enumerate(_POISSON_CUM_E30):
            s += f" WHEN _s{b} < '{4 * c:08x}' THEN {k}"
        return s + f" ELSE 8 END AS _w{b}"

    stage = (o.selectExpr(*s1).selectExpr(*s2)
             .selectExpr("_pc", *[_ladder(b) for b in range(1, 33)]))
    aggs = []
    for b in range(1, 33):
        aggs.append(F.expr(f"sum(_w{b}) AS _n{b}"))
        aggs.append(F.expr(f"sum(_w{b} * _pc) AS _wp{b}"))
    row = stage.agg(*aggs)
    structs = ", ".join(
        f"struct(cast({b} as bigint) AS b, _n{b} AS n_eff,"
        f" cast(_wp{b} as double) / 100.0 / _n{b} AS est_mean)"
        for b in range(1, 33))
    est = (row.selectExpr(f"explode(array({structs})) AS _s")
           .select("_s.*")
           .where(F.col("n_eff").isNotNull()))
    w32 = Window.orderBy("est_mean", "b")
    return (est.withColumn("ci_rank",
                           F.row_number().over(w32).cast("bigint"))
            .select("b", "n_eff", "est_mean", "ci_rank"))


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket 2-itemset mining (the SON/Apriori candidate pass):
    the top-100 part pairs co-purchased in the same order, with support
    counts and lift. The pair space is generated IN-ROW from per-order
    sorted distinct-part baskets — a basket of m parts emits m(m-1)/2
    pairs inside one projection (TPC-H orders hold ≤7 lineitems, so the
    fan-out is bounded by the basket size, never the catalog) — instead
    of the O(|lineitem|²/orders) self-join the SQL oracle runs. Per-part
    order counts join back un-hinted (the part dimension is ~1e8 keys at
    100 TB — AQE picks broadcast at small SF, shuffle join beyond);
    lift = n_pair·N/(n_p1·n_p2) is exact-integer until one double
    division, and the top-100 is a TakeOrderedAndProject on the unique
    total order (n_pair DESC, p1, p2)."""
    t = load_tables(spark, sf_dir)
    baskets = (t["lineitem"]
               .select(F.col("l_orderkey").alias("okey"),
                       F.col("l_partkey").alias("pk"))
               .groupBy("okey")
               .agg(F.array_sort(F.collect_set("pk")).alias("ps"))
               # three consumers (pairs, per-part counts, N) — pin the
               # basket build so the corpus scans ONCE, not per reader
               .localCheckpoint(eager=False))
    pairs = (baskets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> transform("
        "slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .alias("pr"))
        .select("pr.p1", "pr.p2"))
    pp = (pairs.groupBy("p1", "p2")
          .agg(F.count("*").cast("bigint").alias("n_pair")))
    parts = baskets.select("okey", F.explode("ps").alias("pk"))
    pc = (parts.groupBy("pk")
          .agg(F.count("*").cast("bigint").alias("n_p")))
    n = baskets.agg(F.count("*").cast("bigint").alias("n_orders"))
    return (pp.join(pc.select(F.col("pk").alias("p1"),
                              F.col("n_p").alias("n_p1")), "p1")
            .join(pc.select(F.col("pk").alias("p2"),
                            F.col("n_p").alias("n_p2")), "p2")
            .crossJoin(F.broadcast(n))
            .withColumn("lift",
                        (F.col("n_pair") * F.col("n_orders"))
                        .cast("double")
                        / (F.col("n_p1") * F.col("n_p2")))
            .select("p1", "p2", "n_pair", "n_p1", "n_p2", "lift")
            .orderBy(F.desc("n_pair"), "p1", "p2").limit(100))


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez-Stolfo) over the
    corpus: two blocking passes (normalized text, reversed text), each
    comparing a document only with the 8 that follow it in sort order —
    O(n·w) candidates via order-preserving distributed ranking + banded
    block join (see operators/dedup.py sorted_neighborhood_pairs), then
    exact Levenshtein verify at distance <= max_len/5. The oracle runs
    the textbook form: row_number over the full sort + a rank-band
    self-join — bit-identical because the two-pass rank IS row_number
    by construction."""
    from kafka_connect_streams_spark.operators.dedup import (
        sorted_neighborhood_pairs)
    t = load_tables(spark, sf_dir)
    return sorted_neighborhood_pairs(t["documents"], "text", "doc_id",
                                     window=8)


def q_snm_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-pass sorted-neighborhood linkage — the Hernandez-Stolfo
    multi-pass prescription in full: the ``fwd``/``rev`` passes of
    ``sorted_neighborhood`` plus an ``init_len`` pass whose key is
    first-character + zero-padded length + text, grouping same-initial
    similar-length records that neither lexicographic order places
    adjacently. ``n_passes`` now ranges 1..3, so the result both adds
    pairs (those only the third order finds) and re-scores shared ones.
    All derived keys ASCII-fold before reverse/length so ordering is
    engine-portable (operators/dedup.py SNM_PASS_KEYS); same banded
    block join + thresholded Levenshtein verify as the 2-pass form."""
    from kafka_connect_streams_spark.operators.dedup import (
        sorted_neighborhood_pairs)
    t = load_tables(spark, sf_dir)
    return sorted_neighborhood_pairs(t["documents"], "text", "doc_id",
                                     window=8,
                                     pass_names=("fwd", "rev",
                                                 "init_len"))


def q_quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-priority percentiles (p25/p50/p75/p90/p99) of order
    value — percentile_disc semantics, the element at rank
    ceil(pct·N/100). The oracle runs the textbook form: a corpus-wide
    row_number window per group — a full sort whose only output is 25
    rows, the canonical 100 TB anti-pattern. Spark runs the two-pass
    histogram selection instead (operators/layout.py
    grouped_exact_quantiles): one map-side-combined (group, bucket)
    count shuffle locates each quantile's bucket via integer rank
    arithmetic ((N·pct + 99) div 100 — ceil with no floats), then a
    rescan ranks ONLY the ≤ 25 needed buckets. Bit-identical to the
    naive sort; values are selected (never summed), so the final
    DOUBLE cast of the picked DECIMAL is engine-exact."""
    from kafka_connect_streams_spark.operators.layout import (
        grouped_exact_quantiles)
    t = load_tables(spark, sf_dir)
    # NULL values are excluded on BOTH sides (the SQL-standard
    # percentile semantics): Spark windows sort NULLs first and DuckDB
    # last, so without the guard the engines would diverge the day the
    # data gains a NULL price.
    o = (t["orders"]
         .where(F.col("o_totalprice").isNotNull())
         .select(F.col("o_orderpriority").alias("priority"),
                 F.col("o_totalprice").cast("decimal(18,2)").alias("v")))
    out = grouped_exact_quantiles(o, "priority", "v")
    return out.withColumn("value", F.col("value").cast("double"))


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE per-priority quantile sketch (operators/frequency.py
    quantile_sketch): the deterministic fixed-width histogram whose
    (g, bucket) counts ADD across executors/batches — the quantile
    member of the MG/CMS/KMV/HLL mergeable-sketch family, with a
    streaming mirror (streaming/state.py streaming_quantile_sketch)
    that is cell-identical by construction. Estimates fold from the
    |groups|×|buckets|-row sketch alone (quantile_from_sketch): for
    each pct the rank (n·pct+99) div 100 lands in one bucket, emitted
    as the [est_lo, est_hi] value interval with the in-plan err_bound
    = width−1 cents (the hll_report within_4rse precedent: the
    accuracy contract rides with the answer). Values are exact integer
    cents via DECIMAL — no float division anywhere. Unlike
    quantile_exact's two-pass selection this never rescans the corpus:
    one aggregation, then sketch-only algebra."""
    from kafka_connect_streams_spark.operators.frequency import (
        quantile_from_sketch, quantile_sketch)
    t = load_tables(spark, sf_dir)
    o = (t["orders"]
         .where(F.col("o_totalprice").isNotNull())
         .select(F.col("o_orderpriority").alias("priority"),
                 F.expr("cast(cast(o_totalprice as decimal(18,2)) * 100"
                        " as bigint)").alias("cents")))
    sk = quantile_sketch(o, "priority", "cents", width=50000)
    return (quantile_from_sketch(sk, width=50000)
            .select(F.col("g").alias("priority"), "pct", "n",
                    "est_lo", "est_hi", "err_bound"))


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-core of the part co-order graph (operators/graph.py kcore):
    the maximal subgraph where every part co-occurs with ≥ 16 others —
    iterative degree peeling, the dense-backbone filter community
    mining starts from. Edges come from the same in-row pair expansion
    as triangle_census (¼-order lineitem subset, never a fact-table
    self-join); 8 unrolled peel rounds (max observed to converge on
    this corpus: 7 at sf0.1) each run one degree aggregate + two
    semi-joins over the shrinking edge list, localCheckpoint-pinned,
    with a fixpoint assertion after the last round (exact-or-raise —
    the bpe_merges/dedup_clusters precedent for hash-gating loops).
    The SQL twin unrolls the identical 8 rounds (_kcore_round_sql).
    Returns survivors' (node, deg-inside-core)."""
    from kafka_connect_streams_spark.operators.graph import (
        cooccurrence_edges, kcore)
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(F.col("l_orderkey") % 4 == 0)
    return kcore(cooccurrence_edges(li, "l_orderkey", "l_partkey"),
                 k=16, rounds=8)


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of a
    lexical and a semantic retrieval run — the standard hybrid-search
    combiner. System L: BM25 tf-saturation top-50 for the corpus's
    highest-df term (bm25_term_topk with n_terms=1 — single-term
    ranking keeps idf rank-neutral, so no libm ln enters). System S:
    quantized-cosine top-50 to probe vec_id=0 (a broadcast 1×N score —
    linear in the corpus, and the top-50 is a TakeOrderedAndProject,
    not a global rank window; only the 50 survivors see a window).
    Fusion joins the two runs FULL OUTER and scores
    Σ 1e9 div (60 + rank) in exact integers (a run that missed a doc
    contributes 0 — standard RRF), then takes the top 20 on the total
    order (score DESC, doc_id)."""
    from kafka_connect_streams_spark.operators.similarity import (
        cosine_pairs)
    from kafka_connect_streams_spark.operators.text import bm25_term_topk
    t = load_tables(spark, sf_dir)
    lex = (bm25_term_topk(t["documents"], "text", "doc_id",
                          n_terms=1, k=50)
           .select(F.col("doc_id").alias("id"),
                   F.col("rnk").cast("bigint").alias("lex_rank")))
    emb = t["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    pairs = cosine_pairs(F.broadcast(emb.filter(F.col("id") == 0)), emb)
    top = (pairs.filter(F.col("c_id") != 0)
           .select("c_id", "cosine")
           .orderBy(F.desc("cosine"), "c_id").limit(50))
    w50 = Window.orderBy(F.desc("cosine"), "c_id")
    sem = (top.withColumn("sem_rank",
                          F.row_number().over(w50).cast("bigint"))
           .select(F.col("c_id").alias("id"), "sem_rank"))
    fused = (lex.join(sem, "id", "full_outer")
             .select(F.col("id").alias("doc_id"), "lex_rank", "sem_rank")
             .withColumn("rrf_e9", F.expr(
                 "coalesce(1000000000 div (60 + lex_rank), 0)"
                 " + coalesce(1000000000 div (60 + sem_rank), 0)"))
             .orderBy(F.desc("rrf_e9"), "doc_id").limit(20))
    w20 = Window.orderBy(F.desc("rrf_e9"), "doc_id")
    return (fused.withColumn("fused_rank",
                             F.row_number().over(w20).cast("bigint"))
            .select("doc_id", "lex_rank", "sem_rank", "rrf_e9",
                    "fused_rank"))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-order counts per return flag
    (operators/frequency.py hll_report): 256 max-merged registers from
    a 60-bit md5 (8-bit index, 52-bit rank window), the harmonic
    denominator carried EXACTLY as Σ 2^(53−M_j) in int64, and one IEEE
    division of a pre-folded constant as the only float — the
    estimates themselves hash-match the oracle, like kmv_set_ops and
    cms_frequency. The third mergeable-sketch family (count-distinct),
    with the exact count and a 4·RSE flag as the in-plan eval."""
    from kafka_connect_streams_spark.operators.frequency import hll_report
    t = load_tables(spark, sf_dir)
    return hll_report(t["lineitem"], "l_returnflag", "l_orderkey")


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64→16-d ±1 projection of the embeddings
    (operators/similarity.py jl_projection) with its exact
    distance-preservation eval: per consecutive-id probe pair, the
    int64 squared distances before and after projection and the
    scale-corrected ratio_e6 (concentrates at 1e6, RSE √(2/16)). The
    projection itself is shuffle-free scan work — the pass that shrinks
    every downstream pairwise shuffle 4-fold; the md5 ±1 sign family is
    hyperplane_signatures', so the oracle reproduces it bit-for-bit."""
    from kafka_connect_streams_spark.operators.similarity import (
        jl_projection)
    t = load_tables(spark, sf_dir)
    return jl_projection(t["embeddings"], "vec_id", "embedding")


def q_jl_then_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JL payoff, measured on the DECISION it buys (round-8/9
    verdict order): run the embedding_neardup decision (cosine ≥ 0.35)
    twice over the SAME LSH candidate pairs — once on the 64-d
    quantized vectors (ground truth, identical to embedding_neardup's
    decision set) and once on their 16-d JL projections — and report
    one row of candidate/true/JL-positive counts with integer-e6
    recall and precision. This turns the operator-table's "shrinks
    every downstream pairwise shuffle ~4-fold" claim into a quality
    number: what fraction of true near-dups survive when the pairwise
    stage pays a quarter of the bytes (the byte ratio itself is
    measured in tests/test_plans.py by differencing the two plans'
    shuffled vector widths). All scoring is in-row over exact int64
    dots/norms; the 16-d vectors reuse hyperplane_signatures' md5 ±1
    family, so the oracle reproduces both spaces bit-for-bit."""
    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _hyperplane_proj, _quantized, _vec_dims,
        hyperplane_signatures)
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select(F.col("vec_id").alias("id"),
                                 "embedding")
    dims = _vec_dims(emb, "embedding")
    # r14: pin BOTH double-consumed computed tables EAGERLY before their
    # same-lineage self-joins — the neardup_pairs-measured hazards
    # (operators/similarity.py): unpinned, (a) the 8-plane signature
    # tree re-derives per join side and its analysis cost lands on the
    # driver, (b) the bucket join's inferred isnotnull pushes the whole
    # fold into a scan Filter (_join_key=True folds it to a coalesce),
    # (c) the 16-projection + quantized-vector tree materializes twice.
    proj = emb.select(
        "id", _quantized(F.col("embedding")).alias("_v")).select(
        "id", "_v",
        F.array(*[_hyperplane_proj(p, dims) for p in range(16)])
        .alias("_y")).localCheckpoint(eager=True)
    sig = hyperplane_signatures(emb, "id", "embedding", planes=8,
                                _join_key=True).localCheckpoint(eager=True)
    pairs = (sig.select(F.col("id").alias("id_a"), "bucket")
             .join(sig.select(F.col("id").alias("id_b"), "bucket"),
                   "bucket")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    va = proj.select(F.col("id").alias("id_a"),
                     F.col("_v").alias("_va"), F.col("_y").alias("_ya"))
    vb = proj.select(F.col("id").alias("id_b"),
                     F.col("_v").alias("_vb"), F.col("_y").alias("_yb"))
    # NaN guard: a zero-norm side makes the cosine NaN, and the engines
    # disagree on NaN >= x (Spark false, DuckDB orders NaN high) — the
    # explicit norm > 0 conjunct keeps the flag engine-portable.
    def flag(a, b):
        na, nb = _dot(F.col(a), F.col(a)), _dot(F.col(b), F.col(b))
        return ((na > 0) & (nb > 0)
                & (_cosine(_dot(F.col(a), F.col(b)), na, nb) >= 0.35))
    scored = (pairs.join(va, "id_a").join(vb, "id_b")
              .withColumn("t64", flag("_va", "_vb"))
              .withColumn("t16", flag("_ya", "_yb")))
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return (scored.agg(
        F.count("*").alias("n_cand"),
        F.sum(F.when(F.col("t64"), one).otherwise(zero)).alias("n_true"),
        F.sum(F.when(F.col("t16"), one).otherwise(zero)).alias("n_jl"),
        F.sum(F.when(F.col("t64") & F.col("t16"), one)
              .otherwise(zero)).alias("hits"))
        .select("n_cand", "n_true", "n_jl", "hits",
                F.expr("CASE WHEN n_true > 0 THEN"
                       " hits * 1000000 div n_true END")
                .alias("recall_e6"),
                F.expr("CASE WHEN n_jl > 0 THEN"
                       " hits * 1000000 div n_jl END")
                .alias("precision_e6")))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ORDER MATTERS: the driver's correctness gate checks
    # list(QUERIES)[:50]. Since round 8 the window is set EXPLICITLY by
    # _R8_WINDOW below (the dict is re-keyed right after this literal),
    # so the literal order here is era-grouping documentation only; the
    # era comments ("latest driver row: rNN") still describe where each
    # query's newest green row came from. Recompute _R8_WINDOW after
    # EVERY registry edit.
    "ngram_lm_counts": q_ngram_lm_counts,
    "phrase_search": q_phrase_search,
    "quality_funnel": q_quality_funnel,
    "source_drift": q_source_drift,
    "lm_doc_score": q_lm_doc_score,
    "cluster_best_doc": q_cluster_best_doc,
    "cross_source_duplicates": q_cross_source_duplicates,
    "linear_quality": q_linear_quality,
    "ccnet_buckets": q_ccnet_buckets,
    "training_pipeline": q_training_pipeline,
    "session_window": q_session_window,
    # -- (b) round-7 touched / added --
    "constraint_report": q_constraint_report,
    "block_dedup": q_block_dedup,
    "block_dedup_fp": q_block_dedup_fp,
    "vocab_concentration": q_vocab_concentration,
    "cosine_pair_topk": q_cosine_pair_topk,
    "scd2_asof": q_scd2_asof,
    "rollup_merge": q_rollup_merge,
    "attribution": q_attribution,
    "zonemap_prune": q_zonemap_prune,
    "cdc_materialize": q_cdc_materialize,
    "hard_negatives": q_hard_negatives,
    "hard_negatives_recall": q_hard_negatives_recall,
    # -- latest driver row: r03 --
    "select_project": q_select_project,
    "filter": q_filter,
    "scalar_functions": q_scalar_functions,
    "json_extract": q_json_extract,
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_outer": q_join_outer,
    "agg_pricing": q_agg_pricing,
    "groupby_stats": q_groupby_stats,
    "rollup": q_rollup,
    "window_rank": q_window_rank,
    "window_running": q_window_running,
    "topk": q_topk,
    "set_ops": q_set_ops,
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "cube": q_cube,
    "semi_anti_join": q_semi_anti_join,
    "string_functions": q_string_functions,
    "date_functions": q_date_functions,
    "having": q_having,
    "pivot": q_pivot,
    "exists_subquery": q_exists_subquery,
    "distinct": q_distinct,
    "multiway_join": q_multiway_join,
    "asof_join": q_asof_join,
    "correlated_subquery": q_correlated_subquery,
    "topn_per_group": q_topn_per_group,
    "percentile_disc": q_percentile_disc,
    "approx_distinct": q_approx_distinct,
    "interval_join": q_interval_join,
    "grouping_sets": q_grouping_sets,
    # -- latest driver row: r04 --
    "moving_avg": q_moving_avg,
    "time_range_frame": q_time_range_frame,
    "ntile_buckets": q_ntile_buckets,
    "listagg": q_listagg,
    "shipping_priority": q_shipping_priority,
    "range_join": q_range_join,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "hash_split": q_hash_split,
    "percent_rank_cume": q_percent_rank_cume,
    "user_journeys": q_user_journeys,
    "unpivot": q_unpivot,
    "data_profile": q_data_profile,
    "approx_quantile": q_approx_quantile,
    "market_share": q_market_share,
    "promo_revenue": q_promo_revenue,
    "returned_items": q_returned_items,
    "disjunctive_predicates": q_disjunctive_predicates,
    "idle_customers": q_idle_customers,
    "ann_recall": q_ann_recall,
    "skew_salted_agg": q_skew_salted_agg,
    "stratified_sample": q_stratified_sample,
    "pii_redaction": q_pii_redaction,
    "histogram": q_histogram,
    "large_orders": q_large_orders,
    "ann_auto_recall": q_ann_auto_recall,
    "ann_topk_cosine": q_ann_topk_cosine,
    "ann_lsh_cosine": q_ann_lsh_cosine,
    "ann_ivf_cosine": q_ann_ivf_cosine,
    "embedding_neardup": q_embedding_neardup,
    "embedding_dedup_clusters": q_embedding_dedup_clusters,
    # -- latest driver row: r05 --
    "important_parts": q_important_parts,
    "conditional_agg": q_conditional_agg,
    "null_handling": q_null_handling,
    "linestatus_priority": q_linestatus_priority,
    "sequence_packing": q_sequence_packing,
    "mix_weights": q_mix_weights,
    "training_order": q_training_order,
    "global_index": q_global_index,
    "lsh_tuning": q_lsh_tuning,
    "bootstrap_ci": q_bootstrap_ci,
    "copurchase_pairs": q_copurchase_pairs,
    "sorted_neighborhood": q_sorted_neighborhood,
    "snm_multikey": q_snm_multikey,
    "quantile_sketch": q_quantile_sketch,
    "quantile_exact": q_quantile_exact,
    "kcore": q_kcore,
    "rrf_fusion": q_rrf_fusion,
    "hll_distinct": q_hll_distinct,
    "jl_projection": q_jl_projection,
    "jl_then_neardup": q_jl_then_neardup,
    "packing_efficiency": q_packing_efficiency,
    "doc_chunking": q_doc_chunking,
    "chunk_dedup": q_chunk_dedup,
    "tokenizer_fertility": q_tokenizer_fertility,
    "ann_pq_adc": q_ann_pq_adc,
    "ann_pq_recall": q_ann_pq_recall,
    "ann_pq_trained_recall": q_ann_pq_trained_recall,
    "ann_ivfpq": q_ann_ivfpq,
    "transition_matrix": q_transition_matrix,
    "rolling_active_users": q_rolling_active_users,
    "join_skew_report": q_join_skew_report,
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue": q_forecast_revenue,
    "nation_volume_shipping": q_nation_volume_shipping,
    "product_profit": q_product_profit,
    "customer_distribution": q_customer_distribution,
    "top_supplier": q_top_supplier,
    "supplier_part_counts": q_supplier_part_counts,
    "waiting_suppliers": q_waiting_suppliers,
    "token_budget_sample": q_token_budget_sample,
    "embedding_decontamination": q_embedding_decontamination,
    "min_cost_supplier": q_min_cost_supplier,
    "dominant_suppliers": q_dominant_suppliers,
    "semantic_dedup": q_semantic_dedup,
    "exact_k_sample": q_exact_k_sample,
    "winsorize": q_winsorize,
    # -- latest driver row: r06 --
    "dsir_importance": q_dsir_importance,
    "resample_gapfill": q_resample_gapfill,
    "anomaly_zscore": q_anomaly_zscore,
    "pps_sample": q_pps_sample,
    "pagerank_types": q_pagerank_types,
    "decayed_counts": q_decayed_counts,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "audio_segments": q_audio_segments,
    "bigram_topk": q_bigram_topk,
    "boilerplate_removal": q_boilerplate_removal,
    "curation_pipeline": q_curation_pipeline,
    "decontamination": q_decontamination,
    "decontamination_minhash": q_decontamination_minhash,
    "decontamination_ngram": q_decontamination_ngram,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
    "dedup_clusters": q_dedup_clusters,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_recall": q_dedup_recall,
    "dedup_simhash": q_dedup_simhash,
    "flatmap_rekey": q_flatmap_rekey,
    "frame_sampling": q_frame_sampling,
    "gopher_rules": q_gopher_rules,
    "incremental_dedup": q_incremental_dedup,
    "jaccard_prefix_join": q_jaccard_prefix_join,
    "multimodal_decode": q_multimodal_decode,
    "regex_functions": q_regex_functions,
    "text_fingerprint": q_text_fingerprint,
    "text_language_id": q_text_language_id,
    "text_quality": q_text_quality,
    "text_repetition": q_text_repetition,
    "text_tokens": q_text_tokens,
    "tfidf_topk": q_tfidf_topk,
    "winnowing_dedup": q_winnowing_dedup,
    "wordcount": q_wordcount,
    "ann_ivf_trained_recall": q_ann_ivf_trained_recall,
    "bm25_term_topk": q_bm25_term_topk,
    "leakage_safe_split": q_leakage_safe_split,
    "heavy_hitters": q_heavy_hitters,
    "cms_frequency": q_cms_frequency,
    "triangle_census": q_triangle_census,
    "zorder_layout": q_zorder_layout,
    "skyline": q_skyline,
    "kmv_set_ops": q_kmv_set_ops,
    "bloom_semijoin": q_bloom_semijoin,
    "inverted_index": q_inverted_index,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "bpe_fertility": q_bpe_fertility,
    "bpe_packing": q_bpe_packing,
    "bpe_generalization": q_bpe_generalization,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "curriculum_order": q_curriculum_order,
    "embedding_prototypes": q_embedding_prototypes,
    "label_noise": q_label_noise,
    "pack_spans": q_pack_spans,
    "scd2_history": q_scd2_history,
    "block_dedup_rolling": q_block_dedup_rolling,
    "bm25_multiterm": q_bm25_multiterm,
    "mmr_diversify": q_mmr_diversify,
    "ngram_novelty": q_ngram_novelty,
    "ksql_functions": q_ksql_functions,
    "block_dedup_minspan": q_block_dedup_minspan,
    "media_neardup": q_media_neardup,
    "media_phash": q_media_phash,
    "media_audiofp": q_media_audiofp,
    "media_dedup_clusters": q_media_dedup_clusters,
    "media_videofp": q_media_videofp,
    "video_neardup": q_video_neardup,
    "video_scene_cuts": q_video_scene_cuts,
    "k_anonymize": q_k_anonymize,
    "l_diversity": q_l_diversity,
    "langid": q_langid,
    "langid_confusion": q_langid_confusion,
    "t_closeness": q_t_closeness,
    "phash_robustness": q_phash_robustness,
    "audiofp_robustness": q_audiofp_robustness,
    "pii_report": q_pii_report,
    "pii_mask": q_pii_mask,
    "dp_counts": q_dp_counts,
    "dp_utility": q_dp_utility,
    "dedup_oph": q_dedup_oph,
    "oph_recall": q_oph_recall,
    "hilbert_layout": q_hilbert_layout,
    "layout_prune_ab": q_layout_prune_ab,
}

#: ROUND-10 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r9 "Next round" #1 (the rotation ordered in r8 and never
#: executed in the zero-commit round 9): (a) ALL 32 queries whose
#: latest driver row still dates to r05 — four rounds stale, the
#: oldest cohort in the registry — queued first; (b) the five round-10
#: additions (snm_multikey 3-pass Hernandez-Stolfo linkage,
#: quantile_sketch mergeable histogram percentiles, jl_then_neardup
#: JL-decision recall eval, bpe_encode corpus tokenizer apply,
#: bpe_fertility real-token fertility);
#: (c) everything round 10 touched: sorted_neighborhood (oracle
#: rev-key now ASCII-folds — engine-portable reverse) and
#: hard_negatives / hard_negatives_recall (forced probe broadcast
#: dropped); (d) the later round-10 addition batches (bpe_packing
#: real-token sequence packing, cluster_balanced_sample k-means
#: quota sampling, curriculum_order difficulty-decile scheduling,
#: bpe_generalization train/holdout tokenizer gap, embedding_prototypes
#: per-label compactness, label_noise prototype confusion matrix,
#: pack_spans exact-fill split packing) plus bootstrap_ci, whose
#: weights were re-derived this round (8 digests/row, in-row replicate
#: aggregation — oracle changed in lockstep); (e) the remaining
#: 2 slots from the r06 cohort in registry order (curation_pipeline,
#: audio_segments, bigram_topk, boilerplate_removal,
#: dedup_ngram_jaccard, pps_sample, pagerank_types and anomaly_zscore
#: ceded their slots to the additions; their r06 rows stay inside the
#: zero-older-than-r06 criterion).
#: After this round no latest row is older than r06.
#: All 50 were locally hash-green via tools/check.py at sf0.01 AND
#: sf0.1 before commit; the driver row is the bar.
_R10_WINDOW = [
    "important_parts", "conditional_agg", "null_handling",
    "linestatus_priority", "sequence_packing", "training_order",
    "packing_efficiency", "doc_chunking", "chunk_dedup",
    "tokenizer_fertility", "ann_pq_adc", "ann_pq_recall",
    "ann_pq_trained_recall", "ann_ivfpq", "transition_matrix",
    "rolling_active_users", "join_skew_report", "local_supplier_volume",
    "forecast_revenue", "nation_volume_shipping", "product_profit",
    "customer_distribution", "top_supplier", "supplier_part_counts",
    "waiting_suppliers", "token_budget_sample",
    "embedding_decontamination", "min_cost_supplier",
    "dominant_suppliers", "semantic_dedup", "exact_k_sample",
    "winsorize",
    "snm_multikey", "quantile_sketch", "jl_then_neardup", "bpe_encode",
    "bpe_fertility",
    "sorted_neighborhood", "hard_negatives", "hard_negatives_recall",
    "bpe_packing", "cluster_balanced_sample", "curriculum_order",
    "bpe_generalization", "bootstrap_ci",
    "embedding_prototypes", "label_noise", "pack_spans",
    "dsir_importance", "resample_gapfill",
]

#: ROUND-11 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r10 "Next round" #3: (a) every query whose code changed this
#: round leads — bpe_encode (r10's one red row: token_ids array
#: serialized to the scalar ids_md5, oracle mirrored),
#: text_repetition + gopher_rules (rewritten r10 AFTER the window was
#: set — their r06 driver rows predate the bound-_toks / sorted-run
#: rewrites), label_noise + embedding_prototypes (zero-norm cosine
#: guard, r10 ADVICE), and the two round-11 additions
#: block_dedup_rolling (stride-1 exact-substring dedup closing
#: block_dedup's boundary blind spot) and bm25_multiterm (multi-term
#: Okapi top-k in BIGINT fixed point), mmr_diversify (greedy MMR
#: rerank, 4 rounds unrolled in the oracle) and ngram_novelty
#: (cross-doc first-occurrence n-gram contribution); (b) the remaining
#: 41 slots from the r06 cohort in registry order. bpe_merges,
#: scd2_history, bloom_semijoin and inverted_index cede their slots to
#: the four additions and lead the r12 window — after this round no
#: other latest row is older than r07.
#: All 50 locally hash-green via tools/check.py at sf0.01 AND sf0.1
#: before commit; the driver row is the bar.
_R11_WINDOW = [
    "bpe_encode", "text_repetition", "gopher_rules", "label_noise",
    "embedding_prototypes", "block_dedup_rolling", "bm25_multiterm",
    "mmr_diversify", "ngram_novelty",
    "anomaly_zscore", "pps_sample", "pagerank_types", "decayed_counts",
    "dedup_ngram_jaccard", "audio_segments", "bigram_topk",
    "boilerplate_removal", "curation_pipeline", "decontamination",
    "decontamination_minhash", "decontamination_ngram",
    "dedup_cluster_sizes", "dedup_clusters", "dedup_edit_distance",
    "dedup_exact", "dedup_minhash_lsh", "dedup_recall", "dedup_simhash",
    "flatmap_rekey", "frame_sampling", "incremental_dedup",
    "jaccard_prefix_join", "multimodal_decode", "regex_functions",
    "text_fingerprint", "text_language_id", "text_quality",
    "text_tokens", "tfidf_topk", "winnowing_dedup", "wordcount",
    "ann_ivf_trained_recall", "bm25_term_topk", "leakage_safe_split",
    "heavy_hitters", "cms_frequency", "triangle_census", "zorder_layout",
    "skyline", "kmv_set_ops",
]
assert len(_R11_WINDOW) == 50 and len(set(_R11_WINDOW)) == 50

#: ROUND-12 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r11 "Next round" #2 (slot arithmetic checked this time:
#: 4 + 3 + 6 + 37 = 50): (a) the four r06-stale rows lead
#: (bloom_semijoin, inverted_index, bpe_merges, scd2_history — the r11
#: window's arithmetic miss); (b) the three round-12 additions
#: (ksql_functions — the KSQL 5.1 rewriter surface under the oracle
#: gate; block_dedup_minspan — rolling dedup with the Lee-et-al.
#: minimum match length; media_neardup — banded byte-SimHash payload
#: near-dup pairs); (c) every query whose code changed this
#: round: block_dedup + block_dedup_fp + training_pipeline (the
#: fingerprint-window → partial-aggregatable-min migration, decisions
#: provably identical), block_dedup_rolling (min_span parameter,
#: default path bit-identical), label_noise + embedding_prototypes
#: (NULL-label group skip, r11 ADVICE); (d) the first 37 of the 46
#: remaining r07-cohort rows in registry order. having, pivot,
#: exists_subquery, distinct, multiway_join, asof_join,
#: correlated_subquery, topn_per_group and percentile_disc cede their
#: slots and lead the r13 window — after this round no latest row is
#: older than r07.
#: All 50 locally hash-green via tools/check.py at sf0.01 AND sf0.1
#: before commit; the driver row is the bar.
_R12_WINDOW = [
    "bloom_semijoin", "inverted_index", "bpe_merges", "scd2_history",
    "ksql_functions", "block_dedup_minspan", "media_neardup",
    "block_dedup", "block_dedup_fp", "training_pipeline",
    "block_dedup_rolling", "label_noise", "embedding_prototypes",
    "ngram_lm_counts", "phrase_search", "quality_funnel", "source_drift",
    "lm_doc_score", "cluster_best_doc", "cross_source_duplicates",
    "linear_quality", "ccnet_buckets", "session_window",
    "constraint_report", "vocab_concentration", "scd2_asof",
    "rollup_merge", "attribution", "zonemap_prune", "cdc_materialize",
    "select_project", "filter", "scalar_functions", "json_extract",
    "join_inner", "join_left", "join_outer", "agg_pricing",
    "groupby_stats", "rollup", "window_rank", "window_running", "topk",
    "set_ops", "tumbling_window", "sliding_window", "cube",
    "semi_anti_join", "string_functions", "date_functions",
]
assert len(_R12_WINDOW) == 50 and len(set(_R12_WINDOW)) == 50

#: ROUND-13 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r12 "Next round" #4 (slot arithmetic: 11 + 9 + 30 = 50):
#: (a) every query whose code changed this round leads — media_phash
#: media_audiofp, media_dedup_clusters, media_videofp, video_neardup
#: video_scene_cuts, k_anonymize and l_diversity (NEW: the
#: real-container roundtrip perceptual/audio/video fingerprints, the
#: media cluster resolution, the frame-voting video near-dup, the
#: fingerprint-delta scene segmentation, the k-anonymity release and
#: its l-diversity audit, never driver-checked),
#: tfidf_topk (the DF hot-term window migrated to the
#: partial-aggregatable groupBy+join — the r12 verdict's #1),
#: media_neardup (banding/verify factored into fingerprint_neardup +
#: lazy localCheckpoint) and ksql_functions (MASK char classes switched
#: to Unicode \\p{Lu}/\\p{Ll}/\\p{Nd} in both engines — ASCII data, so
#: the hash is unchanged, but the code is not); (b) the nine r07-stale
#: rows the r12 rotation ceded (asof_join, correlated_subquery,
#: distinct, exists_subquery, having, multiway_join, percentile_disc,
#: pivot, topn_per_group — after this round no latest row predates r09);
#: (c) the first 30 of the 44 r09-cohort rows in registry order.
#: mix_weights, global_index, lsh_tuning, copurchase_pairs,
#: quantile_exact, kcore, rrf_fusion, hll_distinct, jl_projection and —
#: ceding to the five post-settlement entries — ann_topk_cosine,
#: ann_lsh_cosine, ann_ivf_cosine, embedding_neardup and
#: embedding_dedup_clusters cede their slots and lead the r14 window. All 50 locally hash-green via tools/check.py at sf0.01 AND
#: sf0.1 before commit; the driver row is the bar.
_R13_WINDOW = [
    "media_phash", "media_audiofp", "media_dedup_clusters",
    "media_videofp", "video_neardup", "video_scene_cuts",
    "k_anonymize", "l_diversity",
    "tfidf_topk", "media_neardup",
    "ksql_functions", "asof_join", "correlated_subquery",
    "distinct", "exists_subquery", "having",
    "multiway_join", "percentile_disc", "pivot",
    "topn_per_group", "cosine_pair_topk", "approx_distinct",
    "interval_join", "grouping_sets", "moving_avg",
    "time_range_frame", "ntile_buckets", "listagg",
    "shipping_priority", "range_join", "funnel",
    "cohort_retention", "hash_split", "percent_rank_cume",
    "user_journeys", "unpivot", "data_profile",
    "approx_quantile", "market_share", "promo_revenue",
    "returned_items", "disjunctive_predicates", "idle_customers",
    "ann_recall", "skew_salted_agg", "stratified_sample",
    "pii_redaction", "histogram", "large_orders",
    "ann_auto_recall",
]
assert len(_R13_WINDOW) == 50 and len(set(_R13_WINDOW)) == 50

#: ROUND-14 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r13 "Next round" #1 (slot arithmetic: 7 + 14 + 29 = 50):
#: (a) every query added or code-touched since the r13 driver rows —
#: t_closeness (NEW: the skew audit completing the privacy family),
#: langid + langid_confusion (NEW: the trained CCNet first stage),
#: video_neardup (floor-division id collapse, strict Y4M markers),
#: media_videofp + video_scene_cuts (decode_y4m marker strictness is
#: on their decode path) and k_anonymize (pseudonymous-id docstring
#: contract — behavior unchanged, but the code is not);
#: (b) the 14 r09-stale rows the r13 rotation ceded, ordered first by
#: the verdict: ann_topk_cosine, ann_lsh_cosine, ann_ivf_cosine,
#: embedding_neardup, embedding_dedup_clusters, mix_weights,
#: global_index, lsh_tuning, copurchase_pairs, quantile_exact, kcore,
#: rrf_fusion, hll_distinct, jl_projection — after this round no
#: latest row predates r10; (c) the first 19 of the 47 r10-cohort rows
#: in registry order (later r14 additions cede the r10 tail —
#: phash_robustness, the VERDICT Next #6 re-encoding-tolerance eval,
#: took customer_distribution's slot; audiofp_robustness, its audio
#: twin, took product_profit's; pii_report + pii_mask, the redaction
#: curation stage, took nation_volume_shipping's and forecast_revenue's;
#: dp_counts + dp_utility, the ε-DP histogram release + its utility
#: eval, took join_skew_report's and local_supplier_volume's;
#: dedup_oph + oph_recall, the one-permutation-hashing signature and
#: its measured classic-agreement eval, took transition_matrix's and
#: rolling_active_users's; hilbert_layout + layout_prune_ab, the
#: Hilbert clustering key and the equal-frequency-file pruning A/B,
#: took ann_pq_trained_recall's and ann_ivfpq's (both r10 rows stay
#: inside the zero-older-than-r10 criterion); slot arithmetic
#: re-checked after every
#: registry edit). All 50 locally hash-green via tools/check.py at
#: sf0.01 AND sf0.1 before commit; the driver row is the bar.
_R14_WINDOW = [
    # optimization-phase code-touched queries lead (the changed-query
    # rule): cosine_pair_topk (tf/pruned pins), ngram_lm_counts (fused
    # continuation aggregate), phrase_search (single tokenize pass),
    # rolling_active_users (joinless conditional aggregate),
    # ann_recall + ann_auto_recall (the three legs now share one pinned
    # quantized table and one pinned signature table) — all six
    # hash-identical, verified at sf0.001/0.01/0.1; jl_then_neardup
    # (sig/proj pins) was already windowed below. The last six
    # r10-cohort tail rows (chunk_dedup, tokenizer_fertility,
    # ann_pq_adc, ann_pq_recall, packing_efficiency, doc_chunking —
    # code-unchanged, r10-green) cede; slot arithmetic becomes
    # 6 + 7 + 14 + 23 = 50.
    "cosine_pair_topk", "ngram_lm_counts", "phrase_search",
    "rolling_active_users", "ann_recall", "ann_auto_recall",
    "phash_robustness", "audiofp_robustness", "pii_report", "pii_mask",
    "dp_counts", "dp_utility", "dedup_oph", "oph_recall",
    "hilbert_layout", "layout_prune_ab",
    "t_closeness", "langid", "langid_confusion",
    "video_neardup", "media_videofp", "video_scene_cuts",
    "k_anonymize",
    "ann_topk_cosine", "ann_lsh_cosine", "ann_ivf_cosine",
    "embedding_neardup", "embedding_dedup_clusters", "mix_weights",
    "global_index", "lsh_tuning", "copurchase_pairs",
    "quantile_exact", "kcore", "rrf_fusion",
    "hll_distinct", "jl_projection",
    "hard_negatives", "hard_negatives_recall", "important_parts",
    "conditional_agg", "null_handling", "linestatus_priority",
    "sequence_packing", "training_order", "bootstrap_ci",
    "sorted_neighborhood", "snm_multikey", "quantile_sketch",
    "jl_then_neardup",
]
assert len(_R14_WINDOW) == 50 and len(set(_R14_WINDOW)) == 50

#: ROUND-15 WINDOW — the 50 names the driver hashes this round, per
#: VERDICT r14 "Next round" #1 (slot arithmetic: 5 + 20 + 25 = 50):
#: (a) the five r15-optimization-touched queries that were already
#: r14-verified but whose code changed AGAIN this round (the
#: changed-query rule): cosine_pair_topk (norm window carried through
#: the pair aggregate — 2 joins and 8 exchanges removed), ann_ivf_cosine
#: + ann_recall + ann_auto_recall (salted IVF list join;
#: topk_cosine_lsh prebuilt-signature count skip), and ngram_lm_counts
#: (non-nullable tokenize — the sweep's one isnotnull-bearing HOF flag);
#: (b) the ~20 r14-touched queries the r14 window did NOT cover — the
#: r14 verdict's enumerated correctness debt (cms_frequency one-pass
#: sketch, curation_pipeline scan fusion, semantic_dedup _nullsafe_ge,
#: ccnet_buckets skinny pin, the five bpe queries behind the training
#: restructure — bpe_merges/encode/fertility/packing/generalization,
#: ALSO r15-touched: the compression curve is now derived
#: arithmetically from the argmax pair counts — the dedup-family pins
#: (dedup_clusters, dedup_minhash_lsh, dedup_ngram_jaccard,
#: dedup_edit_distance, dedup_recall), ann_ivf_trained_recall (r14 big
#: restructure + r15 salted list join), ann_ivfpq, cluster_balanced_
#: sample, pagerank_types, triangle_census, embedding_decontamination);
#: (c) 25 of the 26 remaining r10-cohort rows in staleness order —
#: customer_distribution (thin TPC-H shape, code-stable since r10)
#: cedes its slot to ngram_lm_counts and is the ONE r10 row left for
#: the next rotation. All 50 locally hash-green via tools/check.py at
#: sf0.01 AND sf0.1 before commit; the driver row is the bar.
_R15_WINDOW = [
    "cosine_pair_topk", "ann_ivf_cosine", "ann_recall",
    "ann_auto_recall", "ngram_lm_counts",
    "cms_frequency", "curation_pipeline", "semantic_dedup",
    "ccnet_buckets", "bpe_merges", "bpe_encode", "bpe_fertility",
    "bpe_packing", "bpe_generalization", "dedup_clusters",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_edit_distance",
    "dedup_recall", "ann_ivf_trained_recall", "ann_ivfpq",
    "cluster_balanced_sample", "pagerank_types", "triangle_census",
    "embedding_decontamination",
    "ann_pq_adc", "ann_pq_recall", "ann_pq_trained_recall",
    "chunk_dedup", "curriculum_order",
    "doc_chunking", "dominant_suppliers", "dsir_importance",
    "exact_k_sample", "forecast_revenue", "join_skew_report",
    "local_supplier_volume", "min_cost_supplier",
    "nation_volume_shipping", "pack_spans", "packing_efficiency",
    "product_profit", "resample_gapfill", "supplier_part_counts",
    "token_budget_sample", "tokenizer_fertility", "top_supplier",
    "transition_matrix", "waiting_suppliers", "winsorize",
]
assert len(_R15_WINDOW) == 50 and len(set(_R15_WINDOW)) == 50
QUERIES = {**{k: QUERIES[k] for k in _R15_WINDOW},
           **{k: v for k, v in QUERIES.items() if k not in set(_R15_WINDOW)}}

def _kcore_round_sql(i: int, k: int = 16) -> str:
    """One unrolled k-core peel round as oracle CTEs (the bpe_round_sql
    precedent): degree over e{i-1}, keep nodes ≥ k, keep edges whose
    both endpoints survive. Every e{i} is MATERIALIZED — each round
    references the previous edge list three times, so DuckDB's default
    inline-by-reference would expand the 8-round chain 3^8-fold (and
    re-open the parquet at every leaf: observed "Too many open
    files")."""
    p = i - 1
    return f"""d{i} AS (
            SELECT node, count(*) AS deg FROM (
                SELECT a AS node FROM e{p}
                UNION ALL SELECT b AS node FROM e{p}) u
            GROUP BY node),
        k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
        e{i} AS MATERIALIZED (
            SELECT c.a, c.b FROM e{p} c
            JOIN k{i} ka ON ka.node = c.a
            JOIN k{i} kb ON kb.node = c.b)"""


def _bpe_apply_sql(r: int) -> str:
    """Apply the train chain's ``best{r}`` merge to the FULL-corpus
    ``vocab{r-1}`` — bpe_round_sql's encode half without the pair
    counting, so holdout words the training never saw still encode
    through the merge table (the bpe_encode per-position fold
    semantics)."""
    p = r - 1
    return f"""vocab{r} AS (
            SELECT word,
                   list_filter(list_transform(range(1, len(s) + 1),
                       i -> CASE
                           WHEN s[i] = m.a AND i < len(s)
                                AND s[i + 1] = m.b THEN m.a || m.b
                           WHEN i > 1 AND s[i - 1] = m.a
                                AND s[i] = m.b THEN NULL
                           ELSE s[i] END),
                       x -> x IS NOT NULL) AS s
            FROM vocab{p} CROSS JOIN best{r} m)"""


def _mmr_round_sql(r: int, lam_pct: int = 70) -> str:
    """One unrolled MMR greedy round as oracle CTEs (the bpe/lloyd
    unroll precedent): among candidates not yet in ``sel{r-1}``, pick
    per query the argmax of ``λ·rel_e6 − (1−λ)·max sim_e6 to the
    selected set`` (integer percent λ, ties → lowest c_id). Requires
    ``cand`` (q_id, c_id, rel_e6, rn) and ``simt`` (q_id, ca, cb,
    sim_e6); every sel CTE is MATERIALIZED (multi-reference expansion
    trap)."""
    p = r - 1
    return f"""pick{r} AS MATERIALIZED (
            SELECT q_id, c_id, {r} AS round FROM (
                SELECT c.q_id, c.c_id,
                       row_number() OVER (PARTITION BY c.q_id
                           ORDER BY ({lam_pct} * c.rel_e6
                                     - {100 - lam_pct} * m.maxsim) DESC,
                                    c.c_id) AS pr
                FROM cand c
                JOIN (SELECT t.q_id, t.ca AS c_id,
                             max(t.sim_e6) AS maxsim
                      FROM simt t JOIN sel{p} s
                        ON s.q_id = t.q_id AND s.c_id = t.cb
                      GROUP BY t.q_id, t.ca) m
                  ON m.q_id = c.q_id AND m.c_id = c.c_id
                WHERE NOT EXISTS (SELECT 1 FROM sel{p} s
                                  WHERE s.q_id = c.q_id
                                    AND s.c_id = c.c_id)) z
            WHERE pr = 1),
        sel{r} AS MATERIALIZED (
            SELECT * FROM sel{p} UNION ALL SELECT * FROM pick{r})"""


def _lloyd_round_sql(i: int) -> str:
    """One unrolled full-vector Lloyd round as oracle CTEs — the same
    text the ann_ivf_trained_recall oracle spells out inline (assign ALL
    vectors by exact int64 L2 with ties → lowest list id, recenter to
    the floor-average, an empty list keeps its previous centroid), as a
    generator so new trained-cluster oracles share one proven form."""
    p = f"cent{i - 1}"
    return f"""dist{i} AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN {p} c USING (d) GROUP BY v.id, c.j),
        asg{i} AS (
            SELECT id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist{i}) x WHERE rn = 1),
        sums{i} AS (
            SELECT a.j, v.d, CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg{i} a JOIN comp v USING (id) GROUP BY a.j, v.d),
        cent{i} AS (
            SELECT p.j, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM {p} p LEFT JOIN sums{i} s ON s.j = p.j AND s.d = p.d)"""


#: DuckDB spelling of ksql MASK with default classes. The 'g' flag is
#: load-bearing: DuckDB regexp_replace is first-match-only by default
#: while Spark's replaces every match. Char classes are UNICODE
#: (RE2 \p{Lu}/\p{Ll}/\p{Nd}) in lockstep with the Spark spelling —
#: ksql's MaskKudf classifies via Character.isUpperCase/isLowerCase/
#: isDigit, so 'É' is upper, not 'other' (r12 ADVICE).
_DUCK_MASK = ("regexp_replace(regexp_replace(regexp_replace(regexp_replace("
              "{c}, '\\p{{Lu}}', 'X', 'g'), '\\p{{Ll}}', 'x', 'g'),"
              " '\\p{{Nd}}', 'n', 'g'),"
              " '[^\\p{{Lu}}\\p{{Ll}}\\p{{Nd}}]', '-', 'g')")


ORACLE: dict[str, str] = {
    "wordcount": """
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(coalesce(text, '')), '\\W+')) AS word
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
                     unnest(string_split_regex(lower(coalesce(text, '')), '\\W+')) AS word
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
    "cube": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "semi_anti_join": """
        WITH open_orders AS (SELECT * FROM orders WHERE o_orderstatus = 'O')
        SELECT c_custkey, 'semi' AS op FROM customer
        WHERE EXISTS (SELECT 1 FROM open_orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'anti' AS op FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM open_orders WHERE o_custkey = c_custkey)
    """,
    "string_functions": """
        SELECT c_custkey,
               trim(c_name) AS trimmed,
               lpad(c_mktsegment, 12, '_') AS lpadded,
               rpad(c_mktsegment, 12, '.') AS rpadded,
               regexp_replace(c_name, '[0-9]+', '#', 'g') AS no_digits,
               reverse(c_mktsegment) AS rev,
               CAST(strpos(c_name, 'er') AS INTEGER) AS pos_er,
               repeat(c_mktsegment, 2) AS doubled,
               substring(c_name, 1, 8) AS prefix8
        FROM customer
    """,
    "date_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS d,
               CAST(hour(o_orderdate) AS INTEGER) AS h,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                    AS INTEGER) AS days_to_1999,
               CAST(o_orderdate AS DATE) AS odate
        FROM orders
    """,
    "having": """
        SELECT o_custkey,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 3
    """,
    "pivot": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders GROUP BY o_orderpriority
    """,
    "exists_subquery": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    "distinct": """
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    "dedup_exact": """
        -- coalesce mirrors the Spark side's NULL-text policy (NULL ≡ ''):
        -- a NULL doc shares the empty-doc fingerprint, not its own group
        SELECT md5(coalesce(text, '')) AS fp, min(doc_id) AS keep_id,
               count(*) AS copies
        FROM documents GROUP BY md5(coalesce(text, ''))
    """,
    "dedup_minhash_lsh": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        sh2 AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT % 2147483647 AS h0
            FROM sh),
        sigs AS (
            SELECT doc_id, seed,
                   min((h0 * (2*seed + 1) + seed * 2654435769) % 2147483647) AS sig
            FROM sh2 CROSS JOIN seeds
            GROUP BY doc_id, seed),
        banded AS (
            SELECT doc_id, seed // 4 AS band,
                   md5(string_agg(sig::VARCHAR, ',' ORDER BY seed)) AS band_key
            FROM sigs GROUP BY doc_id, seed // 4),
        pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id),
        sim AS (
            SELECT p.id_a, p.id_b,
                   sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
            FROM pairs p
            JOIN sigs sa ON sa.doc_id = p.id_a
            JOIN sigs sb ON sb.doc_id = p.id_b AND sb.seed = sa.seed
            GROUP BY p.id_a, p.id_b)
        SELECT id_a, id_b, est_jaccard FROM sim WHERE est_jaccard >= 0.25
    """,
    "dedup_simhash": """
        WITH tok AS (
            SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(coalesce(text, '')), '\\W+')) AS token
                FROM documents) u
            WHERE length(token) > 0),
        hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(token), 1, 12))::BIGINT AS h
            FROM tok),
        bits AS (SELECT unnest(generate_series(0, 15)) AS bit),
        bitsum AS (
            SELECT doc_id, bit,
                   sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM hashed CROSS JOIN bits
            GROUP BY doc_id, bit)
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM bitsum GROUP BY doc_id
    """,
    "dedup_ngram_jaccard": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        j AS (
            SELECT id_a, id_b, n_shared,
                   CAST(n_shared AS DOUBLE)
                     / (sa.set_size + sb.set_size - n_shared) AS jaccard
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, n_shared, jaccard FROM j WHERE jaccard >= 0.05
    """,
    "ann_topk_cosine": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        cd AS (SELECT emb.id AS c_id, d,
                      CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS cx
               FROM emb CROSS JOIN dims),
        qd AS (SELECT c_id AS q_id, d, cx AS qx FROM cd WHERE c_id % 100 = 0),
        sums AS (SELECT q_id, c_id,
                        CAST(sum(qx * cx) AS BIGINT) AS dot,
                        CAST(sum(qx * qx) AS BIGINT) AS qn,
                        CAST(sum(cx * cx) AS BIGINT) AS cn
                 FROM qd JOIN cd USING (d) GROUP BY q_id, c_id),
        sim AS (SELECT q_id, c_id,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                FROM sums WHERE q_id <> c_id),
        ranked AS (SELECT q_id, c_id, cosine,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cosine DESC, c_id) AS rank
                   FROM sim)
        SELECT q_id, c_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "ann_lsh_cosine": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 5)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        pairs AS (SELECT qb.id AS q_id, cb.id AS c_id
                  FROM bucket qb JOIN bucket cb USING (bucket)
                  WHERE qb.id % 100 = 0 AND qb.id <> cb.id),
        sums AS (
            SELECT p.q_id, p.c_id,
                   CAST(sum(qd.x * cd.x) AS BIGINT) AS dot,
                   CAST(sum(qd.x * qd.x) AS BIGINT) AS qn,
                   CAST(sum(cd.x * cd.x) AS BIGINT) AS cn
            FROM pairs p
            JOIN comp qd ON qd.id = p.q_id
            JOIN comp cd ON cd.id = p.c_id AND cd.d = qd.d
            GROUP BY p.q_id, p.c_id),
        sim AS (SELECT q_id, c_id,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                FROM sums),
        ranked AS (SELECT q_id, c_id, cosine,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cosine DESC, c_id) AS rank
                   FROM sim)
        SELECT q_id, c_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "asof_join": """
        WITH clicks AS (
            SELECT user_id, ts, arg_max(value, event_id) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts),
        purchases AS (
            SELECT event_id AS purchase_id, user_id, ts,
                   value AS purchase_value
            FROM events WHERE event_type = 'purchase')
        SELECT p.purchase_id, p.user_id, p.ts, p.purchase_value,
               c.ts AS click_ts, c.click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "correlated_subquery": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               count(*) AS n_items
        FROM lineitem JOIN per_part USING (l_partkey)
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
    """,
    "topn_per_group": """
        WITH ranked AS (
            SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
                   row_number() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_acctbal DESC, s_suppkey) AS rnk
            FROM supplier)
        SELECT n_name, s_suppkey, s_name, s_acctbal, CAST(rnk AS INTEGER) AS rnk
        FROM ranked JOIN nation ON s_nationkey = n_nationkey
        WHERE rnk <= 3
    """,
    "conditional_agg": """
        WITH g AS (
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                     AS n_open,
                   sum(CASE WHEN o_orderstatus = 'O'
                            THEN CAST(o_totalprice AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS open_dec,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
            FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, n_orders,
               CAST(n_open AS BIGINT) AS n_open,
               CAST(open_dec AS DOUBLE) AS open_revenue,
               CAST((CAST(open_dec * 100 AS HUGEINT) * 1000000000)
                    // CAST(total_dec * 100 AS HUGEINT) AS BIGINT)
                 AS open_share_e9
        FROM g
    """,
    "percentile_disc": """
        WITH ranked AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY o_orderstatus) AS cnt
            FROM orders)
        SELECT o_orderstatus,
               max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                        THEN o_totalprice END) AS median_price,
               max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
                        THEN o_totalprice END) AS p75_price
        FROM ranked GROUP BY o_orderstatus
    """,
    "approx_distinct": """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               count(*) AS n,
               TRUE AS approx_ok
        FROM events GROUP BY event_type
    """,
    "approx_quantile": """
        WITH ranked AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY o_orderstatus) AS cnt
            FROM orders)
        SELECT o_orderstatus,
               max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                        THEN o_totalprice END) AS median_price,
               max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
                        THEN o_totalprice END) AS p75_price,
               max(cnt) AS n,
               TRUE AS approx_ok
        FROM ranked GROUP BY o_orderstatus
    """,
    "ann_ivf_cosine": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        cents AS (SELECT id AS cent_id FROM emb ORDER BY id LIMIT 16),
        centd AS (SELECT cent_id, d, x AS ex
                  FROM cents JOIN comp ON comp.id = cents.cent_id),
        asums AS (SELECT c.id AS c_id, e.cent_id,
                         CAST(sum(c.x * e.ex) AS BIGINT) AS dot,
                         CAST(sum(c.x * c.x) AS BIGINT) AS cn,
                         CAST(sum(e.ex * e.ex) AS BIGINT) AS en
                  FROM comp c JOIN centd e USING (d)
                  GROUP BY c.id, e.cent_id),
        asim AS (SELECT c_id, cent_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(cn AS DOUBLE) * CAST(en AS DOUBLE)) AS cosine
                 FROM asums),
        lists AS (SELECT c_id, cent_id FROM (
                    SELECT c_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim) WHERE rn = 1),
        probes AS (SELECT q_id, cent_id FROM (
                    SELECT c_id AS q_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim WHERE c_id % 100 = 0) WHERE rn <= 4),
        paired AS (SELECT q_id, c_id
                   FROM probes JOIN lists USING (cent_id)
                   WHERE q_id <> c_id),
        sums AS (SELECT p.q_id, p.c_id,
                        CAST(sum(qd.x * cd.x) AS BIGINT) AS dot,
                        CAST(sum(qd.x * qd.x) AS BIGINT) AS qn,
                        CAST(sum(cd.x * cd.x) AS BIGINT) AS cn
                 FROM paired p
                 JOIN comp qd ON qd.id = p.q_id
                 JOIN comp cd ON cd.id = p.c_id AND cd.d = qd.d
                 GROUP BY p.q_id, p.c_id),
        sim AS (SELECT q_id, c_id,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                FROM sums),
        ranked AS (SELECT q_id, c_id, cosine,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cosine DESC, c_id) AS rank
                   FROM sim)
        SELECT q_id, c_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "embedding_neardup": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 7)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b
                  FROM bucket a JOIN bucket b USING (bucket)
                  WHERE a.id < b.id),
        sums AS (
            SELECT p.id_a, p.id_b,
                   CAST(sum(da.x * db.x) AS BIGINT) AS dot,
                   CAST(sum(da.x * da.x) AS BIGINT) AS na,
                   CAST(sum(db.x * db.x) AS BIGINT) AS nb
            FROM pairs p
            JOIN comp da ON da.id = p.id_a
            JOIN comp db ON db.id = p.id_b AND db.d = da.d
            GROUP BY p.id_a, p.id_b),
        sim AS (SELECT id_a, id_b,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine
                FROM sums)
        SELECT id_a, id_b, cosine FROM sim WHERE cosine >= 0.35
    """,
    "embedding_dedup_clusters": """
        WITH RECURSIVE emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 7)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b
                  FROM bucket a JOIN bucket b USING (bucket)
                  WHERE a.id < b.id),
        sums AS (
            SELECT p.id_a, p.id_b,
                   CAST(sum(da.x * db.x) AS BIGINT) AS dot,
                   CAST(sum(da.x * da.x) AS BIGINT) AS na,
                   CAST(sum(db.x * db.x) AS BIGINT) AS nb
            FROM pairs p
            JOIN comp da ON da.id = p.id_a
            JOIN comp db ON db.id = p.id_b AND db.d = da.d
            GROUP BY p.id_a, p.id_b),
        sim AS (SELECT id_a, id_b,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine
                FROM sums),
        np AS (SELECT id_a, id_b FROM sim WHERE cosine >= 0.35),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM np
            UNION
            SELECT id_b AS src, id_a AS dst FROM np),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        minreach AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src)
        SELECT e.id,
               least(e.id, coalesce(mn, e.id)) AS cluster_id,
               e.id = least(e.id, coalesce(mn, e.id)) AS is_canonical
        FROM emb e LEFT JOIN minreach ON minreach.src = e.id
    """,
    "text_tokens": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                    t -> length(t) > 0)) AS BIGINT) AS ws_tokens,
               CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                                    t -> length(t) > 0)) AS BIGINT) AS word_tokens,
               CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
        FROM documents
    """,
    "text_quality": """
        WITH f AS (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0)) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0 AND t IN
                            ('the','a','of','and','to','in','is','that','it','for')))
                        AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct
            FROM documents),
        r AS (
            SELECT doc_id,
                   least(n_chars / 500.0, 1.0) AS len_score,
                   CASE WHEN n_tok > 0 THEN least(n_stop / n_tok * 5.0, 1.0)
                        ELSE 0.0 END AS stop_ratio,
                   CASE WHEN n_chars > 0 THEN n_punct / n_chars
                        ELSE 0.0 END AS punct_ratio
            FROM f)
        SELECT doc_id, len_score, stop_ratio, punct_ratio,
               0.4 * len_score + 0.3 * stop_ratio + 0.3 * (1.0 - punct_ratio)
                 AS quality
        FROM r
    """,
    "text_language_id": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        scored AS (
            SELECT doc_id,
                   CAST(len(list_filter(toks, t -> t IN
                     ('der','die','das','und','ist','nicht','ein','mit','auf','zu')))
                     AS INTEGER) AS score_de,
                   CAST(len(list_filter(toks, t -> t IN
                     ('the','a','of','and','to','in','is','that','it','for')))
                     AS INTEGER) AS score_en,
                   CAST(len(list_filter(toks, t -> t IN
                     ('el','la','los','de','y','es','un','una','en','por')))
                     AS INTEGER) AS score_es,
                   CAST(len(list_filter(toks, t -> t IN
                     ('le','la','les','et','est','un','une','dans','pour','que')))
                     AS INTEGER) AS score_fr
            FROM toks)
        SELECT doc_id, score_de, score_en, score_es, score_fr,
               CASE WHEN score_de >= score_en AND score_de >= score_es
                         AND score_de >= score_fr THEN 'de'
                    WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
                    WHEN score_es >= score_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM scored
    """,
    "text_fingerprint": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents)
        SELECT doc_id,
               -- coalesce: array_to_string([]) is NULL in DuckDB; Spark's
               -- array_join gives '' (a NULL/empty doc hashes md5(''))
               md5(coalesce(array_to_string(list_sort(list_distinct(toks)),
                                            ' '), '')) AS fingerprint,
               CAST(len(list_distinct(toks)) AS BIGINT) AS vocab_size
        FROM toks
    """,
    "text_repetition": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        inrow AS (
            SELECT doc_id,
                   len(generate_series(0, greatest(len(toks) - 2, 0)))
                     AS n_bigrams,
                   len(list_distinct(list_transform(
                       generate_series(0, greatest(len(toks) - 2, 0)),
                       i -> array_to_string(toks[i+1:i+2], ' '))))
                     AS n_distinct_bigrams
            FROM toks),
        tok_rows AS (SELECT doc_id, unnest(toks) AS token FROM toks),
        per_tok AS (SELECT doc_id, token, count(*) AS c
                    FROM tok_rows GROUP BY doc_id, token),
        per_doc AS (SELECT doc_id, sum(c) AS n_tokens,
                           count(*) AS n_distinct, max(c) AS top_cnt
                    FROM per_tok GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(d.n_tokens AS BIGINT) AS n_tokens,
               CAST(d.n_distinct AS BIGINT) AS n_distinct,
               CAST((d.n_distinct * 1000000000) // d.n_tokens AS BIGINT)
                 AS distinct_ratio_e9,
               CAST((d.top_cnt * 1000000000) // d.n_tokens AS BIGINT)
                 AS top_token_share_e9,
               CAST(CASE WHEN i.n_bigrams > 0 THEN
                        ((i.n_bigrams - i.n_distinct_bigrams) * 1000000000)
                        // i.n_bigrams
                    ELSE 0 END AS BIGINT) AS dup_bigram_frac_e9
        FROM per_doc d JOIN inrow i ON d.doc_id = i.doc_id
    """,
    "multimodal_decode": """
        -- coalesce(text, ''): NULL text ≡ empty payload (attach_payload)
        WITH d AS (SELECT doc_id, coalesce(text, '') AS body FROM documents)
        SELECT doc_id,
               CAST(octet_length(encode(body)) AS BIGINT) AS media_bytes,
               md5(body) AS content_hash,
               CAST(('0x' || substr(md5(body), 1, 4))::INT % 1920 AS BIGINT) AS fake_width,
               CAST(('0x' || substr(md5(body), 5, 4))::INT % 1080 AS BIGINT) AS fake_height
        FROM d
    """,
    "frame_sampling": """
        -- documents.text is ASCII in every sf (verified octet_length =
        -- length), so VARCHAR substring is byte-identical to the Python
        -- payload slice; DuckDB has no BLOB substring.
        WITH docs AS (SELECT doc_id, coalesce(text, '') AS body,
                             octet_length(encode(coalesce(text, ''))) AS size
                      FROM documents),
        idx AS (SELECT unnest(generate_series(0, 3)) AS frame_idx)
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST((size * frame_idx) // 4 AS BIGINT) AS frame_offset_bytes,
               md5(substring(body, CAST((size * frame_idx) // 4 AS BIGINT) + 1,
                             64)) AS frame_hash
        FROM docs CROSS JOIN idx
    """,
    "grouping_sets": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "moving_avg": """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS mov_avg7
        FROM orders
    """,
    "time_range_frame": """
        SELECT user_id, event_id,
               count(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW) AS n_last_hour
        FROM events
    """,
    "ntile_buckets": """
        SELECT o_orderkey,
               CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice DESC, o_orderkey)
                    AS INTEGER) AS price_quartile,
               first_value(o_orderkey)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS first_order,
               last_value(o_orderkey)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_order
        FROM orders
    """,
    "listagg": """
        SELECT user_id,
               string_agg(event_type || ':' || event_id, ','
                          ORDER BY event_type || ':' || event_id) AS history,
               count(*) AS n
        FROM events
        GROUP BY user_id
    """,
    "shipping_priority": """
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "range_join": """
        SELECT band, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM lineitem
        JOIN (VALUES (0.0, 10.0, 'XS'), (10.0, 20.0, 'S'),
                     (20.0, 35.0, 'M'), (35.0, 51.0, 'L')) AS b(lo, hi, band)
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band
    """,
    "funnel": """
        WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
             c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN v ON e.user_id = v.user_id
                   WHERE e.event_type = 'click' AND e.ts > v.t1
                   GROUP BY e.user_id),
             p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN c ON e.user_id = c.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > c.t2
                   GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS users FROM v
        UNION ALL
        SELECT '2_click' AS stage, count(*) AS users FROM c
        UNION ALL
        SELECT '3_purchase' AS stage, count(*) AS users FROM p
    """,
    "cohort_retention": """
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
            FROM events GROUP BY user_id),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events)
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
               count(*) AS users
        FROM activity JOIN first USING (user_id)
        GROUP BY cohort_day, day_offset
    """,
    "dedup_clusters": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT id_a, id_b FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_shared) >= 0.05),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        minreach AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src)
        SELECT d.doc_id,
               least(d.doc_id, coalesce(mn, d.doc_id)) AS cluster_id,
               d.doc_id = least(d.doc_id, coalesce(mn, d.doc_id)) AS is_canonical
        FROM documents d LEFT JOIN minreach ON minreach.src = d.doc_id
    """,
        "dedup_cluster_sizes": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT id_a, id_b FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_shared) >= 0.05),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        minreach AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
        labels AS (
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN minreach ON minreach.src = d.doc_id),
        per_cluster AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM labels GROUP BY cluster_id)
        SELECT cluster_size,
               count(*) AS n_clusters,
               count(*) * cluster_size AS n_docs,
               count(*) * (cluster_size - 1) AS n_dropped
        FROM per_cluster GROUP BY cluster_size
    """,
    "tfidf_topk": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(coalesce(text, '')), '\\W+')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks WHERE length(term) > 0
            GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        ranked AS (
            SELECT doc_id, term, tf, df, n_docs,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tf DESC, df ASC, term) AS rnk
            FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, CAST(rnk AS INTEGER) AS rnk, n_docs
        FROM ranked WHERE rnk <= 5
    """,
    "bm25_term_topk": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(coalesce(text, '')), '\\W+'),
                       t -> length(t) > 0)) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
               FROM toks GROUP BY doc_id),
        corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(dl) AS BIGINT) AS l_total
                   FROM dl),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS docfreq
                FROM tf GROUP BY term),
        top_terms AS (SELECT term, docfreq FROM dft
                      ORDER BY docfreq DESC, term LIMIT 5),
        cand AS (SELECT t.term, t.doc_id, t.tf, d.dl, tt.docfreq,
                        c.n_docs, c.l_total
                 FROM tf t JOIN top_terms tt USING (term)
                 JOIN dl d USING (doc_id) CROSS JOIN corpus c),
        scored AS (
            SELECT term, doc_id, tf, dl, docfreq,
                   CAST(tf * 20 * l_total AS DOUBLE)
                     / CAST(tf * 20 * l_total + 6 * l_total
                            + 18 * dl * n_docs AS DOUBLE) AS score
            FROM cand),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
                   FROM scored)
        SELECT term, doc_id, tf, dl, docfreq, score,
               CAST(rnk AS INTEGER) AS rnk
        FROM ranked WHERE rnk <= 10
    """,
    "leakage_safe_split": """
        WITH b AS (
            SELECT doc_id, md5(coalesce(text, '')) AS fingerprint
            FROM documents),
        k AS (
            SELECT doc_id, fingerprint,
                   ('0x' || substr(fingerprint, 1, 4))::INT % 100 AS bucket
            FROM b)
        SELECT doc_id, fingerprint, CAST(bucket AS INTEGER) AS bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM k
    """,
    "hash_split": """
        WITH b AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                     % 100 AS bucket
            FROM documents)
        SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM b
    """,
    "training_pipeline": """
        WITH f AS (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                     AS n_punct,
                   md5(text) AS exact_fp,
                   md5(array_to_string(list_sort(list_distinct(
                       list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                                   t -> length(t) > 0))), ' ')) AS neardup_fp,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
                     AS bpe_tokens,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                     % 100 AS bucket
            FROM documents),
        q AS (
            SELECT doc_id, exact_fp, neardup_fp, bucket, bpe_tokens,
                   CAST(len(toks) AS BIGINT) AS word_tokens,
                   0.4 * least(n_chars / 500.0, 1.0)
                   + 0.3 * (CASE WHEN len(toks) > 0
                            THEN least(CAST(len(list_filter(toks, t -> t IN
                                 ('the','a','of','and','to','in','is','that',
                                  'it','for'))) AS DOUBLE)
                                 / len(toks) * 5.0, 1.0) ELSE 0.0 END)
                   + 0.3 * (1.0 - CASE WHEN n_chars > 0
                                  THEN n_punct / n_chars ELSE 0.0 END)
                     AS quality
            FROM f),
        filtered AS (SELECT * FROM q WHERE quality >= 0.5),
        d1 AS (SELECT * FROM filtered
               QUALIFY doc_id = min(doc_id) OVER (PARTITION BY exact_fp)),
        d2 AS (SELECT * FROM d1
               QUALIFY doc_id = min(doc_id) OVER (PARTITION BY neardup_fp))
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(word_tokens) AS BIGINT) AS total_word_tokens,
               CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               min(quality) AS min_quality,
               max(quality) AS max_quality
        FROM d2
        GROUP BY 1
    """,
    "regex_functions": """
        -- coalesce(text, ''): NULL-text policy, mirrored from Spark
        WITH d AS (SELECT doc_id, coalesce(text, '') AS body FROM documents)
        SELECT doc_id,
               regexp_replace(body, '[0-9]+', '#', 'g') AS digits_masked,
               regexp_extract(body, '\\b([A-Za-z]{4})[A-Za-z]*', 1)
                 AS first_word4,
               regexp_matches(body, '[0-9]') AS has_digit,
               CAST(len(regexp_extract_all(body, '[.!?]')) AS BIGINT)
                 AS n_sentences
        FROM d
    """,
    "null_handling": """
        WITH li AS (
            SELECT l_orderkey, count(*) AS n_items
            FROM lineitem GROUP BY l_orderkey),
        j AS (
            SELECT o_orderkey,
                   coalesce(n_items, 0) AS items,
                   nullif(o_orderstatus, 'O') AS closed_status,
                   n_items IS NULL AS no_items,
                   n_items IS NOT DISTINCT FROM 1 AS exactly_one
            FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
        SELECT closed_status,
               count(*) AS n,
               CAST(sum(items) AS BIGINT) AS total_items,
               CAST(sum(CASE WHEN no_items THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_no_items,
               CAST(sum(CASE WHEN exactly_one THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_single_item
        FROM j
        GROUP BY closed_status
    """,
    "percent_rank_cume": """
        SELECT o_orderkey, o_orderstatus,
               percent_rank() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice, o_orderkey)
                 AS pct_rank,
               cume_dist() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice, o_orderkey) AS cume
        FROM orders
    """,
    "dedup_edit_distance": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT id_a, id_b,
                   CAST(n_shared AS DOUBLE)
                     / (sa.set_size + sb.set_size - n_shared) AS jaccard
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_shared) >= 0.05)
        SELECT id_a, id_b, jaccard,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
               CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
                 AS max_len
        FROM pairs
        JOIN documents da ON da.doc_id = id_a
        JOIN documents db ON db.doc_id = id_b
    """,
    "user_journeys": """
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= 600000000 THEN 0 ELSE 1 END AS new_session
            FROM events),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND CURRENT ROW)
                     AS session_id
            FROM marked),
        paths AS (
            SELECT user_id, session_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM sess GROUP BY user_id, session_id)
        SELECT path, count(*) AS n_sessions
        FROM paths
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 20
    """,
    "unpivot": """
        SELECT l_orderkey, l_linenumber, measure, val
        FROM lineitem
        UNPIVOT (val FOR measure IN (l_quantity AS quantity,
                                     l_extendedprice AS extendedprice,
                                     l_discount AS discount))
    """,
    "data_profile": """
        WITH wide AS (
            SELECT count(*) AS n,
                   count(o_custkey) AS nn_custkey,
                   count(DISTINCT o_custkey) AS nd_custkey,
                   CAST(min(o_custkey) AS VARCHAR) AS min_custkey,
                   CAST(max(o_custkey) AS VARCHAR) AS max_custkey,
                   count(o_orderstatus) AS nn_status,
                   count(DISTINCT o_orderstatus) AS nd_status,
                   min(o_orderstatus) AS min_status,
                   max(o_orderstatus) AS max_status,
                   count(o_totalprice) AS nn_price,
                   count(DISTINCT o_totalprice) AS nd_price,
                   CAST(min(o_totalprice) AS VARCHAR) AS min_price,
                   CAST(max(o_totalprice) AS VARCHAR) AS max_price
            FROM orders)
        SELECT n, 'o_custkey' AS col_name, nn_custkey AS n_nonnull,
               nd_custkey AS n_distinct, min_custkey AS min_val,
               max_custkey AS max_val FROM wide
        UNION ALL
        SELECT n, 'o_orderstatus', nn_status, nd_status, min_status,
               max_status FROM wide
        UNION ALL
        SELECT n, 'o_totalprice', nn_price, nd_price, min_price,
               max_price FROM wide
    """,
    "market_share": """
        WITH amer_cust AS (
            SELECT c_custkey
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'),
        supp_n AS (
            SELECT s_suppkey, n_name AS supp_nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        j AS (
            SELECT year(o_orderdate) AS yr, supp_nation,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN amer_cust ON o_custkey = c_custkey
            JOIN supp_n ON l_suppkey = s_suppkey)
        SELECT CAST(yr AS INTEGER) AS o_year,
               CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                   THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END)
                          * 10000 AS HUGEINT) * 1000000000)
                    // CAST(sum(vol) * 10000 AS HUGEINT) AS BIGINT)
                 AS mkt_share_e9,
               CAST(sum(vol) AS DOUBLE) AS total_volume
        FROM j GROUP BY yr
    """,
    "promo_revenue": """
        SELECT CAST((CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                          * 10000 AS HUGEINT) * 100000000000)
                    // CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2))))
                           * 10000 AS HUGEINT) AS BIGINT)
                 AS promo_share_pct_e9,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "linestatus_priority": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
    "disjunctive_predicates": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "idle_customers": """
        WITH avg_bal AS (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) AS avg_bal
            FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
        SELECT n_name,
               count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM customer, avg_bal
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY n_name
    """,
    "dedup_recall": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        exact AS (
            SELECT id_a, id_b
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                  / (sa.set_size + sb.set_size - n_shared) >= 0.5),
        seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        sh2 AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT % 2147483647 AS h0
            FROM sh),
        sigs AS (
            SELECT doc_id, seed,
                   min((h0 * (2*seed + 1) + seed * 2654435769) % 2147483647) AS sig
            FROM sh2 CROSS JOIN seeds
            GROUP BY doc_id, seed),
        banded AS (
            SELECT doc_id, seed // 4 AS band,
                   md5(string_agg(sig::VARCHAR, ',' ORDER BY seed)) AS band_key
            FROM sigs GROUP BY doc_id, seed // 4),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id),
        stats AS (
            SELECT count(*) AS n_exact,
                   sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
            FROM exact e LEFT JOIN cand c
              ON e.id_a = c.id_a AND e.id_b = c.id_b)
        SELECT CAST((n_hits * 1000000000) // n_exact AS BIGINT) AS recall_e9,
               n_exact,
               (SELECT count(*) FROM cand) AS n_candidates
        FROM stats
    """,
    "ann_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        qd AS (SELECT id AS q_id, d, x AS qx FROM comp WHERE id % 100 = 0),
        bsums AS (SELECT q_id, comp.id AS c_id,
                         CAST(sum(qx * x) AS BIGINT) AS dot,
                         CAST(sum(qx * qx) AS BIGINT) AS qn,
                         CAST(sum(x * x) AS BIGINT) AS cn
                  FROM qd JOIN comp USING (d) GROUP BY q_id, comp.id),
        bsim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM bsums WHERE q_id <> c_id),
        branked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM bsim),
        exact AS (SELECT q_id, c_id FROM branked WHERE rank <= 5),
        planes AS (SELECT unnest(generate_series(0, 5)) AS p),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        lpairs AS (SELECT qb.id AS q_id, cb.id AS c_id
                   FROM bucket qb JOIN bucket cb USING (bucket)
                   WHERE qb.id % 100 = 0 AND qb.id <> cb.id),
        lsums AS (
            SELECT p.q_id, p.c_id,
                   CAST(sum(qd2.x * cd2.x) AS BIGINT) AS dot,
                   CAST(sum(qd2.x * qd2.x) AS BIGINT) AS qn,
                   CAST(sum(cd2.x * cd2.x) AS BIGINT) AS cn
            FROM lpairs p
            JOIN comp qd2 ON qd2.id = p.q_id
            JOIN comp cd2 ON cd2.id = p.c_id AND cd2.d = qd2.d
            GROUP BY p.q_id, p.c_id),
        lsim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM lsums),
        lranked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM lsim),
        approx AS (SELECT q_id, c_id FROM lranked WHERE rank <= 5),
        cents AS (SELECT id AS cent_id FROM emb ORDER BY id LIMIT 16),
        centd AS (SELECT cent_id, d, x AS ex
                  FROM cents JOIN comp ON comp.id = cents.cent_id),
        asums AS (SELECT c.id AS c_id, e.cent_id,
                         CAST(sum(c.x * e.ex) AS BIGINT) AS dot,
                         CAST(sum(c.x * c.x) AS BIGINT) AS cn,
                         CAST(sum(e.ex * e.ex) AS BIGINT) AS en
                  FROM comp c JOIN centd e USING (d)
                  GROUP BY c.id, e.cent_id),
        asim AS (SELECT c_id, cent_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(cn AS DOUBLE) * CAST(en AS DOUBLE)) AS cosine
                 FROM asums),
        lists AS (SELECT c_id, cent_id FROM (
                    SELECT c_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim) WHERE rn = 1),
        probes AS (SELECT q_id, cent_id FROM (
                    SELECT c_id AS q_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim WHERE c_id % 100 = 0) WHERE rn <= 4),
        ipaired AS (SELECT q_id, c_id
                    FROM probes JOIN lists USING (cent_id)
                    WHERE q_id <> c_id),
        isums AS (SELECT p.q_id, p.c_id,
                         CAST(sum(qd3.x * cd3.x) AS BIGINT) AS dot,
                         CAST(sum(qd3.x * qd3.x) AS BIGINT) AS qn,
                         CAST(sum(cd3.x * cd3.x) AS BIGINT) AS cn
                  FROM ipaired p
                  JOIN comp qd3 ON qd3.id = p.q_id
                  JOIN comp cd3 ON cd3.id = p.c_id AND cd3.d = qd3.d
                  GROUP BY p.q_id, p.c_id),
        isim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM isums),
        iranked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM isim),
        iapprox AS (SELECT q_id, c_id FROM iranked WHERE rank <= 5),
        hits_l AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN approx a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        hits_i AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN iapprox a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        per_q AS (SELECT k.q_id, coalesce(hl.h, 0) AS h_lsh,
                         coalesce(hi.h, 0) AS h_ivf, k.k_actual
                  FROM (SELECT q_id, count(*) AS k_actual
                        FROM exact GROUP BY q_id) k
                  LEFT JOIN hits_l hl ON k.q_id = hl.q_id
                  LEFT JOIN hits_i hi ON k.q_id = hi.q_id)
        SELECT CAST((sum(h_lsh) * 1000000000) // sum(k_actual) AS BIGINT)
                 AS recall_lsh_e9,
               CAST((sum(h_ivf) * 1000000000) // sum(k_actual) AS BIGINT)
                 AS recall_ivf_e9,
               count(*) AS n_queries
        FROM per_q
    """,
    "ann_auto_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        params AS (SELECT
            GREATEST(4, LEAST(24, CAST(ceil(log2(GREATEST(
                count(*) / 128.0, 2.0))) AS INT))) AS n_planes,
            GREATEST(4, LEAST(4096, CAST(ceil(sqrt(
                GREATEST(count(*), 1))) AS INT))) AS n_cents
          FROM emb),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        qd AS (SELECT id AS q_id, d, x AS qx FROM comp WHERE id % 100 = 0),
        bsums AS (SELECT q_id, comp.id AS c_id,
                         CAST(sum(qx * x) AS BIGINT) AS dot,
                         CAST(sum(qx * qx) AS BIGINT) AS qn,
                         CAST(sum(x * x) AS BIGINT) AS cn
                  FROM qd JOIN comp USING (d) GROUP BY q_id, comp.id),
        bsim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM bsums WHERE q_id <> c_id),
        branked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM bsim),
        exact AS (SELECT q_id, c_id FROM branked WHERE rank <= 5),
        planes AS (SELECT unnest(generate_series(0,
                   (SELECT n_planes FROM params) - 1)) AS p),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        lpairs AS (SELECT qb.id AS q_id, cb.id AS c_id
                   FROM bucket qb JOIN bucket cb USING (bucket)
                   WHERE qb.id % 100 = 0 AND qb.id <> cb.id),
        lsums AS (
            SELECT p.q_id, p.c_id,
                   CAST(sum(qd2.x * cd2.x) AS BIGINT) AS dot,
                   CAST(sum(qd2.x * qd2.x) AS BIGINT) AS qn,
                   CAST(sum(cd2.x * cd2.x) AS BIGINT) AS cn
            FROM lpairs p
            JOIN comp qd2 ON qd2.id = p.q_id
            JOIN comp cd2 ON cd2.id = p.c_id AND cd2.d = qd2.d
            GROUP BY p.q_id, p.c_id),
        lsim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM lsums),
        lranked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM lsim),
        approx AS (SELECT q_id, c_id FROM lranked WHERE rank <= 5),
        cents AS (SELECT id AS cent_id FROM (
                    SELECT id, row_number() OVER (ORDER BY id) AS crn
                    FROM emb) WHERE crn <= (SELECT n_cents FROM params)),
        centd AS (SELECT cent_id, d, x AS ex
                  FROM cents JOIN comp ON comp.id = cents.cent_id),
        asums AS (SELECT c.id AS c_id, e.cent_id,
                         CAST(sum(c.x * e.ex) AS BIGINT) AS dot,
                         CAST(sum(c.x * c.x) AS BIGINT) AS cn,
                         CAST(sum(e.ex * e.ex) AS BIGINT) AS en
                  FROM comp c JOIN centd e USING (d)
                  GROUP BY c.id, e.cent_id),
        asim AS (SELECT c_id, cent_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(cn AS DOUBLE) * CAST(en AS DOUBLE)) AS cosine
                 FROM asums),
        lists AS (SELECT c_id, cent_id FROM (
                    SELECT c_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim) WHERE rn = 1),
        probes AS (SELECT q_id, cent_id FROM (
                    SELECT c_id AS q_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim WHERE c_id % 100 = 0) WHERE rn <= 4),
        ipaired AS (SELECT q_id, c_id
                    FROM probes JOIN lists USING (cent_id)
                    WHERE q_id <> c_id),
        isums AS (SELECT p.q_id, p.c_id,
                         CAST(sum(qd3.x * cd3.x) AS BIGINT) AS dot,
                         CAST(sum(qd3.x * qd3.x) AS BIGINT) AS qn,
                         CAST(sum(cd3.x * cd3.x) AS BIGINT) AS cn
                  FROM ipaired p
                  JOIN comp qd3 ON qd3.id = p.q_id
                  JOIN comp cd3 ON cd3.id = p.c_id AND cd3.d = qd3.d
                  GROUP BY p.q_id, p.c_id),
        isim AS (SELECT q_id, c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine
                 FROM isums),
        iranked AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id) AS rank
                    FROM isim),
        iapprox AS (SELECT q_id, c_id FROM iranked WHERE rank <= 5),
        hits_l AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN approx a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        hits_i AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN iapprox a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        per_q AS (SELECT k.q_id, coalesce(hl.h, 0) AS h_lsh,
                         coalesce(hi.h, 0) AS h_ivf, k.k_actual
                  FROM (SELECT q_id, count(*) AS k_actual
                        FROM exact GROUP BY q_id) k
                  LEFT JOIN hits_l hl ON k.q_id = hl.q_id
                  LEFT JOIN hits_i hi ON k.q_id = hi.q_id)
        SELECT CAST((sum(h_lsh) * 1000000000) // sum(k_actual) AS BIGINT)
                 AS recall_lsh_e9,
               CAST((sum(h_ivf) * 1000000000) // sum(k_actual) AS BIGINT)
                 AS recall_ivf_e9,
               count(*) AS n_queries
        FROM per_q
    """,
    "sequence_packing": """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                            x -> length(x) > 0)) AS BIGINT) AS n_tok,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                     % 32 AS bucket
            FROM documents),
        packed AS (
            SELECT doc_id, n_tok, bucket,
                   CAST(floor((sum(n_tok) OVER (PARTITION BY bucket
                                                ORDER BY doc_id) - n_tok)
                              / 2048) AS INTEGER) AS seq
            FROM toks)
        SELECT CAST(bucket AS INTEGER) AS bucket, seq,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY bucket, seq
    """,
    "skew_salted_agg": """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type
    """,
    "stratified_sample": """
        SELECT doc_id, lang, source
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100
              < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
    """,
    "pii_redaction": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\\b(key|value|secret)\\b'))
                    AS BIGINT) AS n_hits,
               md5(regexp_replace(text, '\\b(key|value|secret)\\b',
                                  '[REDACTED]', 'g')) AS redacted_md5
        FROM documents
    """,
    "bigram_topk": """
        WITH toks AS (
            SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS t
            FROM documents),
        big AS (
            SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                         i -> t[i] || ' ' || t[i + 1]))
                     AS bigram
            FROM toks WHERE len(t) >= 2)
        SELECT bigram, count(*) AS n
        FROM big GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
    "histogram": """
        SELECT CAST(floor(o_totalprice / 25000) * 25000 AS BIGINT) AS bin_lo,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
    "incremental_dedup": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                     AS fingerprint
            FROM toks)
        SELECT doc_id, fingerprint
        FROM fp b
        WHERE doc_id % 5 = 0
          AND NOT EXISTS (SELECT 1 FROM fp h
                          WHERE h.doc_id % 5 <> 0
                            AND h.fingerprint = b.fingerprint)
    """,
    "decontamination": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                     AS fingerprint
            FROM toks)
        SELECT doc_id,
               EXISTS (SELECT 1 FROM fp t
                       WHERE t.doc_id % 50 <> 0
                         AND t.fingerprint = e.fingerprint) AS contaminated
        FROM fp e WHERE doc_id % 50 = 0
    """,
    "decontamination_ngram": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        per_sh AS (
            SELECT shingle,
                   max(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END)
                     AS in_train,
                   list_filter(list(doc_id),
                               d -> d % 50 = 0) AS eval_ids
            FROM sh GROUP BY shingle),
        hits AS (
            SELECT unnest(eval_ids) AS doc_id
            FROM per_sh WHERE in_train = 1),
        hitc AS (SELECT doc_id, count(*) AS n_contaminated
                 FROM hits GROUP BY doc_id),
        eval_sh AS (
            SELECT doc_id, count(*) AS n_shingles
            FROM sh WHERE doc_id % 50 = 0 GROUP BY doc_id)
        SELECT e.doc_id, e.n_shingles,
               coalesce(h.n_contaminated, 0) AS n_contaminated,
               coalesce(h.n_contaminated, 0) > 0 AS contaminated
        FROM eval_sh e LEFT JOIN hitc h ON e.doc_id = h.doc_id
    """,
    "large_orders": """
        WITH heavy AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
        SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
        FROM orders
        JOIN heavy ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "important_parts": """
        WITH li AS (
            SELECT l_partkey,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
            FROM lineitem),
        per_part AS (
            SELECT l_partkey, sum(rev) AS part_rev FROM li GROUP BY l_partkey),
        total AS (SELECT sum(rev) AS total_rev,
                         count(DISTINCT l_partkey) AS n_parts FROM li)
        SELECT l_partkey, CAST(part_rev AS DOUBLE) AS part_revenue
        FROM per_part, total
        WHERE CAST(part_rev AS DOUBLE)
              > 1.2 * CAST(total_rev AS DOUBLE) / n_parts
    """,
    "quality_funnel": """
        WITH f AS (
            SELECT doc_id, lang,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0)) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0 AND t IN
                            ('the','a','of','and','to','in','is','that','it','for')))
                        AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                     AS n_punct
            FROM documents),
        r AS (
            SELECT doc_id, lang, n_chars,
                   0.4 * least(n_chars / 500.0, 1.0)
                   + 0.3 * (CASE WHEN n_tok > 0
                                 THEN least(n_stop / n_tok * 5.0, 1.0)
                                 ELSE 0.0 END)
                   + 0.3 * (1.0 - CASE WHEN n_chars > 0
                                       THEN n_punct / n_chars
                                       ELSE 0.0 END) AS quality
            FROM f)
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_len_ok,
               CAST(sum(CASE WHEN n_chars >= 200 AND quality >= 0.5
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
               CAST(sum(CASE WHEN n_chars >= 200 AND quality >= 0.5
                        AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_en_ok
        FROM r
    """,
    "mix_weights": """
        WITH per AS (
            SELECT lang, count(*) AS n_docs,
                   CAST(floor(sqrt(count(*))) AS BIGINT) AS w_raw
            FROM documents GROUP BY lang),
        tot AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_tot FROM per)
        SELECT lang, n_docs,
               CAST((w_raw * 1000000000) // w_tot AS BIGINT) AS weight_e9
        FROM per CROSS JOIN tot
    """,
    "training_order": """
        WITH keyed AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        ::INT % 64 AS INTEGER) AS shuffle_bucket
            FROM documents)
        SELECT doc_id, shuffle_bucket,
               CAST(row_number() OVER (PARTITION BY shuffle_bucket
                                       ORDER BY h, doc_id) AS INTEGER) AS pos
        FROM keyed
    """,
    "lsh_tuning": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        truth AS (
            SELECT id_a, id_b
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_shared) >= 0.5),
        tt AS (SELECT count(*) AS n FROM truth),
        seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        sh2 AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT % 2147483647 AS h0
            FROM sh),
        sigs AS (
            SELECT doc_id, seed,
                   min((h0 * (2*seed + 1) + seed * 2654435769) % 2147483647) AS sig
            FROM sh2 CROSS JOIN seeds
            GROUP BY doc_id, seed),
        settings AS (SELECT unnest([1, 2, 4, 8]) AS rpb),
        banded AS (
            SELECT s.rpb, doc_id, seed // s.rpb AS band,
                   md5(string_agg(sig::VARCHAR, ',' ORDER BY seed)) AS band_key
            FROM sigs CROSS JOIN settings s
            GROUP BY s.rpb, doc_id, seed // s.rpb),
        pairs AS (
            SELECT DISTINCT a.rpb, a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a
            JOIN banded b ON a.rpb = b.rpb AND a.band = b.band
                         AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id),
        stats AS (
            SELECT st.rpb,
                   CAST(count(p.id_a) AS BIGINT) AS n_candidates,
                   CAST(sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS hits
            FROM settings st
            LEFT JOIN pairs p ON p.rpb = st.rpb
            LEFT JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b
            GROUP BY st.rpb)
        SELECT CAST(16 // s.rpb AS INTEGER) AS bands,
               CAST(s.rpb AS INTEGER) AS rows_per_band,
               s.n_candidates,
               CAST(tt.n AS BIGINT) AS true_pairs,
               s.hits,
               CAST(s.hits AS DOUBLE) / greatest(tt.n, 1) AS recall,
               CAST(s.hits AS DOUBLE) / greatest(s.n_candidates, 1)
                   AS "precision"
        FROM stats s CROSS JOIN tt
        ORDER BY rows_per_band
    """,
    "global_index": """
        WITH keyed AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        ::INT % 64 AS INTEGER) AS bucket
            FROM documents)
        SELECT doc_id, bucket,
               CAST(row_number() OVER (ORDER BY bucket, h, doc_id) - 1
                    AS BIGINT) AS global_idx
        FROM keyed
    """,
    "bootstrap_ci": """
        WITH base AS (
            SELECT o_orderkey AS okey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS pc
            FROM orders),
        reps AS (
            SELECT okey, pc, b
            FROM base, (SELECT unnest(range(1, 33)) AS b)),
        h AS (
            -- r10: replicate b reads 30 bits from slice (b-1)%4 of
            -- digest md5(okey:(b-1)//4) — 8 digests/row, 4 slices each
            SELECT b, pc,
                   ('0x' || substr(md5(CAST(okey AS VARCHAR) || ':'
                                       || CAST((b - 1) // 4 AS VARCHAR)),
                                   1 + 8 * ((b - 1) % 4), 8))
                       ::BIGINT // 4 AS h30
            FROM reps),
        w AS (
            SELECT b, pc,
                   CASE WHEN h30 < 395007542 THEN 0
                        WHEN h30 < 790015084 THEN 1
                        WHEN h30 < 987518855 THEN 2
                        WHEN h30 < 1053353445 THEN 3
                        WHEN h30 < 1069812093 THEN 4
                        WHEN h30 < 1073103822 THEN 5
                        WHEN h30 < 1073652444 THEN 6
                        WHEN h30 < 1073730819 THEN 7
                        ELSE 8 END AS wt
            FROM h),
        agg AS (
            SELECT b, CAST(sum(wt) AS BIGINT) AS n_eff,
                   CAST(sum(wt * pc) AS BIGINT) AS wp
            FROM w GROUP BY b)
        SELECT b, n_eff,
               CAST(wp AS DOUBLE) / 100.0 / n_eff AS est_mean,
               CAST(row_number() OVER (
                   ORDER BY CAST(wp AS DOUBLE) / 100.0 / n_eff, b)
                   AS BIGINT) AS ci_rank
        FROM agg
    """,
    "copurchase_pairs": """
        WITH op AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
            FROM lineitem),
        pp AS (
            SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS n_pair
            FROM op a JOIN op b ON a.okey = b.okey AND a.pk < b.pk
            GROUP BY a.pk, b.pk),
        pc AS (
            SELECT pk, CAST(count(*) AS BIGINT) AS n_p
            FROM op GROUP BY pk),
        n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders
              FROM op)
        SELECT pp.p1, pp.p2, pp.n_pair,
               pa.n_p AS n_p1, pb.n_p AS n_p2,
               CAST(pp.n_pair * n.n_orders AS DOUBLE)
                   / (pa.n_p * pb.n_p) AS lift
        FROM pp JOIN pc pa ON pa.pk = pp.p1
                JOIN pc pb ON pb.pk = pp.p2, n
        ORDER BY pp.n_pair DESC, pp.p1, pp.p2
        LIMIT 100
    """,
    "sorted_neighborhood": """
        WITH d AS (
            SELECT doc_id, lower(coalesce(text, '')) AS k,
                   coalesce(text, '') AS t
            FROM documents),
        fwd AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY k, doc_id) - 1 AS r
            FROM d),
        rv AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY reverse(regexp_replace(
                           k, '[^\\x00-\\x7f]', '', 'g')), doc_id) - 1 AS r
            FROM d),
        u AS (
            SELECT least(a.doc_id, b.doc_id) AS id_a,
                   greatest(a.doc_id, b.doc_id) AS id_b
            FROM fwd a JOIN fwd b ON b.r > a.r AND b.r <= a.r + 8
            UNION ALL
            SELECT least(a.doc_id, b.doc_id),
                   greatest(a.doc_id, b.doc_id)
            FROM rv a JOIN rv b ON b.r > a.r AND b.r <= a.r + 8),
        cand AS (
            SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_passes
            FROM u GROUP BY id_a, id_b),
        scored AS (
            SELECT c.id_a, c.id_b, c.n_passes,
                   CAST(levenshtein(da.t, db.t) AS BIGINT) AS edit_distance,
                   CAST(greatest(length(da.t), length(db.t)) AS BIGINT)
                       AS max_len
            FROM cand c JOIN d da ON da.doc_id = c.id_a
                        JOIN d db ON db.doc_id = c.id_b)
        SELECT id_a, id_b, n_passes, edit_distance, max_len
        FROM scored
        WHERE edit_distance * 5 <= max_len
    """,
    "snm_multikey": """
        WITH d AS (
            SELECT doc_id, lower(coalesce(text, '')) AS k,
                   regexp_replace(lower(coalesce(text, '')),
                                  '[^\\x00-\\x7f]', '', 'g') AS fk,
                   coalesce(text, '') AS t
            FROM documents),
        fwd AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY k, doc_id) - 1 AS r
            FROM d),
        rv AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY reverse(fk), doc_id) - 1
                       AS r
            FROM d),
        il AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY substring(fk, 1, 1)
                                || lpad(cast(length(fk) AS VARCHAR),
                                        6, '0')
                                || fk,
                                doc_id) - 1 AS r
            FROM d),
        u AS (
            SELECT least(a.doc_id, b.doc_id) AS id_a,
                   greatest(a.doc_id, b.doc_id) AS id_b
            FROM fwd a JOIN fwd b ON b.r > a.r AND b.r <= a.r + 8
            UNION ALL
            SELECT least(a.doc_id, b.doc_id),
                   greatest(a.doc_id, b.doc_id)
            FROM rv a JOIN rv b ON b.r > a.r AND b.r <= a.r + 8
            UNION ALL
            SELECT least(a.doc_id, b.doc_id),
                   greatest(a.doc_id, b.doc_id)
            FROM il a JOIN il b ON b.r > a.r AND b.r <= a.r + 8),
        cand AS (
            SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_passes
            FROM u GROUP BY id_a, id_b),
        scored AS (
            SELECT c.id_a, c.id_b, c.n_passes,
                   CAST(levenshtein(da.t, db.t) AS BIGINT) AS edit_distance,
                   CAST(greatest(length(da.t), length(db.t)) AS BIGINT)
                       AS max_len
            FROM cand c JOIN d da ON da.doc_id = c.id_a
                        JOIN d db ON db.doc_id = c.id_b)
        SELECT id_a, id_b, n_passes, edit_distance, max_len
        FROM scored
        WHERE edit_distance * 5 <= max_len
    """,
    # the textbook naive form: a corpus-wide sort per group whose only
    # output is 25 rows — Spark runs the two-pass histogram selection
    "quantile_exact": """
        WITH s AS (
            SELECT o_orderpriority AS priority,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS v
            FROM orders
            WHERE o_totalprice IS NOT NULL),
        r AS (
            SELECT priority, v,
                   row_number() OVER (PARTITION BY priority
                                      ORDER BY v) AS rk,
                   count(*) OVER (PARTITION BY priority) AS n
            FROM s),
        p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
        SELECT r.priority, CAST(p.pct AS BIGINT) AS pct,
               CAST(r.v AS DOUBLE) AS value
        FROM r JOIN p ON r.rk = (r.n * p.pct + 99) // 100
    """,
    "quantile_sketch": """
        WITH s AS (
            SELECT o_orderpriority AS g,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v
            FROM orders
            WHERE o_totalprice IS NOT NULL),
        sk AS (
            SELECT g, v // 50000 AS bucket,
                   CAST(count(*) AS BIGINT) AS c
            FROM s GROUP BY 1, 2),
        cum AS (
            SELECT g, bucket, c,
                   CAST(sum(c) OVER (PARTITION BY g ORDER BY bucket)
                        AS BIGINT) AS cum,
                   CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM sk),
        p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct),
        picked AS (
            SELECT cum.g, CAST(p.pct AS BIGINT) AS pct, cum.n,
                   min(cum.bucket) AS bucket
            FROM cum JOIN p ON cum.cum >= (cum.n * p.pct + 99) // 100
            GROUP BY cum.g, p.pct, cum.n)
        SELECT g AS priority, pct, n,
               bucket * 50000 AS est_lo,
               bucket * 50000 + 49999 AS est_hi,
               CAST(49999 AS BIGINT) AS err_bound
        FROM picked
    """,
    "kcore": f"""
        WITH li AS (
            SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0),
        e0 AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey),
        {_kcore_round_sql(1)},
        {_kcore_round_sql(2)},
        {_kcore_round_sql(3)},
        {_kcore_round_sql(4)},
        {_kcore_round_sql(5)},
        {_kcore_round_sql(6)},
        {_kcore_round_sql(7)},
        {_kcore_round_sql(8)}
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e8 UNION ALL SELECT b AS node FROM e8) u
        GROUP BY node
    """,
    "rrf_fusion": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(coalesce(text, '')), '\\W+'),
                       t -> length(t) > 0)) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
               FROM toks GROUP BY doc_id),
        corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(dl) AS BIGINT) AS l_total
                   FROM dl),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS docfreq
                FROM tf GROUP BY term),
        top_term AS (SELECT term FROM dft
                     ORDER BY docfreq DESC, term LIMIT 1),
        lscored AS (
            SELECT t.doc_id,
                   CAST(t.tf * 20 * c.l_total AS DOUBLE)
                     / CAST(t.tf * 20 * c.l_total + 6 * c.l_total
                            + 18 * d.dl * c.n_docs AS DOUBLE) AS score
            FROM tf t JOIN top_term tt USING (term)
            JOIN dl d USING (doc_id) CROSS JOIN corpus c),
        lex AS (
            SELECT doc_id AS id, CAST(rnk AS BIGINT) AS lex_rank FROM (
                SELECT doc_id, row_number() OVER (
                    ORDER BY score DESC, doc_id) AS rnk
                FROM lscored) x
            WHERE rnk <= 50),
        emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                                   * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        qd AS (SELECT d, x AS qx FROM comp WHERE id = 0),
        sums AS (SELECT comp.id AS c_id,
                        CAST(sum(qx * x) AS BIGINT) AS dot,
                        CAST(sum(qx * qx) AS BIGINT) AS qn,
                        CAST(sum(x * x) AS BIGINT) AS cn
                 FROM qd JOIN comp USING (d) GROUP BY comp.id),
        sim AS (SELECT c_id,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))
                         AS cosine
                FROM sums WHERE c_id <> 0),
        sem AS (
            SELECT c_id AS id, CAST(rnk AS BIGINT) AS sem_rank FROM (
                SELECT c_id, row_number() OVER (
                    ORDER BY cosine DESC, c_id) AS rnk
                FROM sim) x
            WHERE rnk <= 50),
        f AS (
            SELECT coalesce(l.id, s.id) AS doc_id,
                   l.lex_rank, s.sem_rank,
                   CAST(coalesce(1000000000 // (60 + l.lex_rank), 0)
                        + coalesce(1000000000 // (60 + s.sem_rank), 0)
                        AS BIGINT) AS rrf_e9
            FROM lex l FULL OUTER JOIN sem s ON l.id = s.id),
        ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY rrf_e9 DESC, doc_id) AS fr
            FROM f)
        SELECT doc_id, lex_rank, sem_rank, rrf_e9,
               CAST(fr AS BIGINT) AS fused_rank
        FROM ranked WHERE fr <= 20
    """,
    "hll_distinct": """
        WITH hashed AS (
            SELECT DISTINCT CAST(l_returnflag AS VARCHAR) AS s,
                            CAST(l_orderkey AS VARCHAR) AS e
            FROM lineitem
            WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL),
        h AS (
            SELECT s, ('0x' || substr(md5(e), 1, 15))::BIGINT AS h
            FROM hashed),
        parts AS (
            SELECT s, h // 4503599627370496 AS reg,
                   h % 4503599627370496 AS low
            FROM h),
        regs AS (
            SELECT s, reg,
                   max(CASE WHEN low = 0 THEN 53
                            ELSE 53 - length(bin(low)) END) AS m_reg
            FROM parts GROUP BY s, reg),
        per_set AS (
            SELECT s, CAST(count(*) AS BIGINT) AS v_registers,
                   CAST(sum(1::BIGINT << (53 - m_reg))
                        + (256 - count(*)) * 9007199254740992
                        AS BIGINT) AS s_scaled
            FROM regs GROUP BY s),
        exact AS (
            SELECT s, CAST(count(*) AS BIGINT) AS n_true
            FROM hashed GROUP BY s)
        SELECT p.s AS set_key, x.n_true, p.v_registers, p.s_scaled,
               4.2399295229796824e+20 / CAST(p.s_scaled AS DOUBLE)
                   AS hll_est,
               abs(4.2399295229796824e+20 / CAST(p.s_scaled AS DOUBLE)
                   - CAST(x.n_true AS DOUBLE))
                   / CAST(x.n_true AS DOUBLE) <= 0.26 AS within_4rse
        FROM per_set p JOIN exact x USING (s)
    """,
    "jl_projection": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (
            SELECT id, d,
                   CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                              * 10000.0 + 0.5) AS BIGINT) AS x
            FROM emb CROSS JOIN dims),
        planes AS (SELECT unnest(generate_series(0, 15)) AS p),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR
                                || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS y
            FROM comp CROSS JOIN planes GROUP BY id, p),
        do2 AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT)
                       AS dist2_orig
            FROM comp a JOIN comp b ON b.id = a.id + 1 AND b.d = a.d
            WHERE a.id % 50 = 0 GROUP BY a.id, b.id),
        dp2 AS (
            SELECT a.id AS id_a,
                   CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT)
                       AS dist2_proj
            FROM proj a JOIN proj b ON b.id = a.id + 1 AND b.p = a.p
            WHERE a.id % 50 = 0 GROUP BY a.id, b.id)
        SELECT o.id_a, o.id_b, o.dist2_orig, p.dist2_proj,
               CASE WHEN o.dist2_orig > 0
                    THEN CAST(p.dist2_proj * 62500 // o.dist2_orig
                              AS BIGINT)
                    ELSE CAST(NULL AS BIGINT) END AS ratio_e6
        FROM do2 o JOIN dp2 p USING (id_a)
    """,
    # the embedding_neardup candidate/scoring CTEs + jl_projection's
    # 16-plane projection, composed: both decisions per candidate pair,
    # folded to one recall/precision row
    "jl_then_neardup": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (
            SELECT id, d,
                   CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                              * 10000.0 + 0.5) AS BIGINT) AS x
            FROM emb CROSS JOIN dims),
        p8 AS (SELECT unnest(generate_series(0, 7)) AS p),
        proj8 AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR
                                || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN p8 GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p)
                            ELSE 0 END) AS BIGINT) AS bucket
            FROM proj8 GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b
                  FROM bucket a JOIN bucket b USING (bucket)
                  WHERE a.id < b.id),
        p16 AS (SELECT unnest(generate_series(0, 15)) AS p),
        y AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR
                                || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS y
            FROM comp CROSS JOIN p16 GROUP BY id, p),
        s64 AS (
            SELECT p.id_a, p.id_b,
                   CAST(sum(da.x * db.x) AS BIGINT) AS dot,
                   CAST(sum(da.x * da.x) AS BIGINT) AS na,
                   CAST(sum(db.x * db.x) AS BIGINT) AS nb
            FROM pairs p
            JOIN comp da ON da.id = p.id_a
            JOIN comp db ON db.id = p.id_b AND db.d = da.d
            GROUP BY p.id_a, p.id_b),
        s16 AS (
            SELECT p.id_a, p.id_b,
                   CAST(sum(ya.y * yb.y) AS BIGINT) AS dot,
                   CAST(sum(ya.y * ya.y) AS BIGINT) AS na,
                   CAST(sum(yb.y * yb.y) AS BIGINT) AS nb
            FROM pairs p
            JOIN y ya ON ya.id = p.id_a
            JOIN y yb ON yb.id = p.id_b AND yb.p = ya.p
            GROUP BY p.id_a, p.id_b),
        flags AS (
            SELECT s64.id_a,
                   s64.na > 0 AND s64.nb > 0
                   AND CAST(s64.dot AS DOUBLE)
                       / sqrt(CAST(s64.na AS DOUBLE)
                              * CAST(s64.nb AS DOUBLE)) >= 0.35 AS t64,
                   s16.na > 0 AND s16.nb > 0
                   AND CAST(s16.dot AS DOUBLE)
                       / sqrt(CAST(s16.na AS DOUBLE)
                              * CAST(s16.nb AS DOUBLE)) >= 0.35 AS t16
            FROM s64 JOIN s16 ON s16.id_a = s64.id_a
                             AND s16.id_b = s64.id_b),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_cand,
                   CAST(sum(CASE WHEN t64 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_true,
                   CAST(sum(CASE WHEN t16 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_jl,
                   CAST(sum(CASE WHEN t64 AND t16 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hits
            FROM flags)
        SELECT n_cand, n_true, n_jl, hits,
               CASE WHEN n_true > 0
                    THEN CAST(hits * 1000000 // n_true AS BIGINT) END
                   AS recall_e6,
               CASE WHEN n_jl > 0
                    THEN CAST(hits * 1000000 // n_jl AS BIGINT) END
                   AS precision_e6
        FROM agg
    """,
    "packing_efficiency": """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                            x -> length(x) > 0)) AS BIGINT) AS n_tok,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                     % 32 AS bucket
            FROM documents),
        packed AS (
            SELECT doc_id, n_tok, bucket,
                   CAST(floor((sum(n_tok) OVER (PARTITION BY bucket
                                                ORDER BY doc_id) - n_tok)
                              / 2048) AS INTEGER) AS seq
            FROM toks),
        packs AS (
            SELECT bucket, seq, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS pack_tokens
            FROM packed GROUP BY bucket, seq)
        SELECT CAST(bucket AS INTEGER) AS bucket,
               count(*) AS n_packs,
               CAST(sum(pack_tokens) AS BIGINT) AS bucket_tokens,
               CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
               CAST((CAST(sum(pack_tokens) AS HUGEINT) * 1000000000)
                    // (count(*) * 2048) AS BIGINT) AS mean_fill_e9
        FROM packs GROUP BY bucket
    """,
    "decontamination_minhash": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        sh2 AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT % 2147483647 AS h0
            FROM sh),
        sigs AS (
            SELECT doc_id, seed,
                   min((h0 * (2*seed + 1) + seed * 2654435769) % 2147483647) AS sig
            FROM sh2 CROSS JOIN seeds
            GROUP BY doc_id, seed),
        banded AS (
            SELECT doc_id, seed // 4 AS band,
                   md5(string_agg(sig::VARCHAR, ',' ORDER BY seed)) AS band_key
            FROM sigs GROUP BY doc_id, seed // 4),
        flags AS (
            SELECT band, band_key,
                   max(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END) AS in_train
            FROM banded GROUP BY band, band_key)
        SELECT b.doc_id, max(f.in_train) = 1 AS near_contaminated
        FROM banded b JOIN flags f USING (band, band_key)
        WHERE b.doc_id % 50 = 0
        GROUP BY b.doc_id
    """,
    "doc_chunking": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS n
              FROM toks WHERE len(toks) > 0),
        c AS (
            SELECT doc_id, toks,
                   unnest(generate_series(
                       0, CAST(greatest(0, ceil((n - 16) / 12.0)) AS BIGINT)))
                     AS chunk_id
            FROM n)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(len(toks[chunk_id*12 + 1 : chunk_id*12 + 16]) AS BIGINT)
                 AS chunk_tokens,
               md5(array_to_string(toks[chunk_id*12 + 1 : chunk_id*12 + 16],
                                   ' ')) AS chunk_fp
        FROM c
    """,
    "local_supplier_volume": """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "nation_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND sn.n_name <> cn.n_name
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    "product_profit": """
        SELECT n_name,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%blue%'
        GROUP BY n_name, year(l_shipdate)
    """,
    "customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE r = (SELECT max(r) FROM rev)
    """,
    "supplier_part_counts": """
        WITH rel AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM rel
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "waiting_suppliers": """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F')
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lo l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "ann_pq_adc": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sample AS (
            SELECT id, rn - 1 AS k FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 16),
        cent AS (
            SELECT s.k, c.d, c.x
            FROM sample s JOIN comp c USING (id)),
        dist AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        codes AS (
            SELECT id AS c_id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist WHERE id % 100 <> 0) x
            WHERE rn = 1),
        qtab AS (SELECT id AS q_id, m, k, dd FROM dist WHERE id % 100 = 0),
        adc AS (
            SELECT q.q_id, c.c_id, CAST(sum(q.dd) AS BIGINT) AS adc_dist
            FROM codes c JOIN qtab q USING (m, k)
            GROUP BY q.q_id, c.c_id),
        ranked AS (
            SELECT q_id, c_id, adc_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_dist, c_id) AS rank
            FROM adc)
        SELECT q_id, c_id, adc_dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "ann_pq_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sample AS (
            SELECT id, rn - 1 AS k FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 16),
        cent AS (
            SELECT s.k, c.d, c.x
            FROM sample s JOIN comp c USING (id)),
        dist AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        codes AS (
            SELECT id AS c_id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist WHERE id % 100 <> 0) x
            WHERE rn = 1),
        qtab AS (SELECT id AS q_id, m, k, dd FROM dist WHERE id % 100 = 0),
        adc AS (
            SELECT q.q_id, c.c_id, CAST(sum(q.dd) AS BIGINT) AS adc_dist
            FROM codes c JOIN qtab q USING (m, k)
            GROUP BY q.q_id, c.c_id),
        pq AS (
            SELECT q_id, c_id FROM (
                SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY adc_dist, c_id) AS rank
                FROM adc) r
            WHERE rank <= 5),
        l2 AS (
            SELECT q.id AS q_id, c.id AS c_id,
                   CAST(sum((q.x - c.x) * (q.x - c.x)) AS BIGINT) AS l2
            FROM comp q JOIN comp c ON q.d = c.d
            WHERE q.id % 100 = 0 AND c.id % 100 <> 0
            GROUP BY q.id, c.id),
        exact AS (
            SELECT q_id, c_id FROM (
                SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY l2, c_id) AS rn
                FROM l2) e
            WHERE rn <= 5),
        hits AS (
            SELECT e.q_id, CAST(count(*) AS BIGINT) AS hits
            FROM exact e JOIN pq USING (q_id, c_id)
            GROUP BY e.q_id)
        SELECT q.q_id,
               CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
               CAST(coalesce(h.hits, 0) * 1000000000 // 5 AS BIGINT)
                 AS recall_e9
        FROM (SELECT id AS q_id FROM emb WHERE id % 100 = 0) q
        LEFT JOIN hits h USING (q_id)
    """,
    "ann_ivf_trained_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        -- hash-sampled coarse codebook: salt 'c:', j = 0..7 in (md5, id)
        -- order (similarity.py coarse_centroids)
        samp AS (
            SELECT id, rn - 1 AS j FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5('c:' || CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 8),
        cent0 AS (SELECT s.j, c.d, c.x FROM samp s JOIN comp c USING (id)),
        -- Lloyd round 1: assign ALL vectors by exact int64 L2 (ties ->
        -- lowest j), recenter to the floor-average, empty list keeps its
        -- previous centroid (kmeans_coarse_centroids, unrolled)
        dist1 AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent0 c USING (d) GROUP BY v.id, c.j),
        asg1 AS (
            SELECT id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist1) x WHERE rn = 1),
        sums1 AS (
            SELECT a.j, v.d, CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg1 a JOIN comp v USING (id) GROUP BY a.j, v.d),
        cent1 AS (
            SELECT p.j, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent0 p LEFT JOIN sums1 s ON s.j = p.j AND s.d = p.d),
        -- Lloyd round 2
        dist2 AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent1 c USING (d) GROUP BY v.id, c.j),
        asg2 AS (
            SELECT id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist2) x WHERE rn = 1),
        sums2 AS (
            SELECT a.j, v.d, CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg2 a JOIN comp v USING (id) GROUP BY a.j, v.d),
        cent2 AS (
            SELECT p.j, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent1 p LEFT JOIN sums2 s ON s.j = p.j AND s.d = p.d),
        -- Lloyd round 3
        dist3 AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent2 c USING (d) GROUP BY v.id, c.j),
        asg3 AS (
            SELECT id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist3) x WHERE rn = 1),
        sums3 AS (
            SELECT a.j, v.d, CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg3 a JOIN comp v USING (id) GROUP BY a.j, v.d),
        cent3 AS (
            SELECT p.j, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent2 p LEFT JOIN sums3 s ON s.j = p.j AND s.d = p.d),
        -- trained-codebook distances (assignment + probing both read these)
        dist4 AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent3 c USING (d) GROUP BY v.id, c.j),
        -- inverted lists (candidates only) and probes (queries, nprobe=2)
        -- for each codebook; dist1 already holds the hash-codebook L2s
        lists_h AS (
            SELECT id AS c_id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist1 WHERE id % 100 <> 0) x WHERE rn = 1),
        probes_h AS (
            SELECT id AS q_id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist1 WHERE id % 100 = 0) x WHERE rn <= 2),
        lists_t AS (
            SELECT id AS c_id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist4 WHERE id % 100 <> 0) x WHERE rn = 1),
        probes_t AS (
            SELECT id AS q_id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM dist4 WHERE id % 100 = 0) x WHERE rn <= 2),
        -- exact brute-force cosine top-5 (queries x candidates)
        qd AS (SELECT id AS q_id, d, x AS qx FROM comp WHERE id % 100 = 0),
        bsums AS (SELECT q_id, comp.id AS c_id,
                         CAST(sum(qx * x) AS BIGINT) AS dot,
                         CAST(sum(qx * qx) AS BIGINT) AS qn,
                         CAST(sum(x * x) AS BIGINT) AS cn
                  FROM qd JOIN comp USING (d)
                  WHERE comp.id % 100 <> 0
                  GROUP BY q_id, comp.id),
        branked AS (
            SELECT q_id, c_id, row_number() OVER (
                PARTITION BY q_id
                ORDER BY CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) DESC,
                         c_id) AS rank
            FROM bsums),
        exact AS (SELECT q_id, c_id FROM branked WHERE rank <= 5),
        -- probed exact-cosine top-5 per codebook
        pair_h AS (SELECT q_id, c_id FROM probes_h JOIN lists_h USING (j)),
        hsums AS (SELECT p.q_id, p.c_id,
                         CAST(sum(qd2.x * cd2.x) AS BIGINT) AS dot,
                         CAST(sum(qd2.x * qd2.x) AS BIGINT) AS qn,
                         CAST(sum(cd2.x * cd2.x) AS BIGINT) AS cn
                  FROM pair_h p
                  JOIN comp qd2 ON qd2.id = p.q_id
                  JOIN comp cd2 ON cd2.id = p.c_id AND cd2.d = qd2.d
                  GROUP BY p.q_id, p.c_id),
        hranked AS (
            SELECT q_id, c_id, row_number() OVER (
                PARTITION BY q_id
                ORDER BY CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) DESC,
                         c_id) AS rank
            FROM hsums),
        approx_h AS (SELECT q_id, c_id FROM hranked WHERE rank <= 5),
        pair_t AS (SELECT q_id, c_id FROM probes_t JOIN lists_t USING (j)),
        tsums AS (SELECT p.q_id, p.c_id,
                         CAST(sum(qd3.x * cd3.x) AS BIGINT) AS dot,
                         CAST(sum(qd3.x * qd3.x) AS BIGINT) AS qn,
                         CAST(sum(cd3.x * cd3.x) AS BIGINT) AS cn
                  FROM pair_t p
                  JOIN comp qd3 ON qd3.id = p.q_id
                  JOIN comp cd3 ON cd3.id = p.c_id AND cd3.d = qd3.d
                  GROUP BY p.q_id, p.c_id),
        tranked AS (
            SELECT q_id, c_id, row_number() OVER (
                PARTITION BY q_id
                ORDER BY CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) DESC,
                         c_id) AS rank
            FROM tsums),
        approx_t AS (SELECT q_id, c_id FROM tranked WHERE rank <= 5),
        hits_h AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN approx_h a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        hits_t AS (SELECT e.q_id, count(*) AS h
                   FROM exact e JOIN approx_t a
                     ON e.q_id = a.q_id AND e.c_id = a.c_id
                   GROUP BY e.q_id),
        per_q AS (SELECT k.q_id, coalesce(hh.h, 0) AS h_hash,
                         coalesce(ht.h, 0) AS h_trained, k.k_actual
                  FROM (SELECT q_id, count(*) AS k_actual
                        FROM exact GROUP BY q_id) k
                  LEFT JOIN hits_h hh ON k.q_id = hh.q_id
                  LEFT JOIN hits_t ht ON k.q_id = ht.q_id),
        recalls AS (
            SELECT CAST((sum(h_hash) * 1000000000) // sum(k_actual)
                        AS BIGINT) AS recall_hash_e9,
                   CAST((sum(h_trained) * 1000000000) // sum(k_actual)
                        AS BIGINT) AS recall_trained_e9,
                   count(*) AS n_queries
            FROM per_q),
        skew_h AS (
            SELECT CAST((max(n) * 8 * 1000000000) // sum(n) AS BIGINT)
                     AS skew_hash_e9
            FROM (SELECT j, count(*) AS n FROM lists_h GROUP BY j) z),
        skew_t AS (
            SELECT CAST((max(n) * 8 * 1000000000) // sum(n) AS BIGINT)
                     AS skew_trained_e9
            FROM (SELECT j, count(*) AS n FROM lists_t GROUP BY j) z)
        SELECT recall_hash_e9, recall_trained_e9, n_queries,
               skew_hash_e9, skew_trained_e9
        FROM recalls CROSS JOIN skew_h CROSS JOIN skew_t
    """,
    "ann_pq_trained_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sample AS (
            SELECT id, rn - 1 AS k FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 16),
        cent0 AS (
            SELECT s.k, c.d, c.x
            FROM sample s JOIN comp c USING (id)),
        dist1 AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent0 c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        asg1 AS (
            SELECT id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist1) x
            WHERE rn = 1),
        sums1 AS (
            SELECT a.m, a.k, v.d,
                   CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg1 a JOIN comp v ON v.id = a.id AND v.d // 8 = a.m
            GROUP BY a.m, a.k, v.d),
        cent1 AS (
            SELECT p.k, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent0 p
            LEFT JOIN sums1 s ON s.k = p.k AND s.d = p.d
                                AND s.m = p.d // 8),
        dist2 AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent1 c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        asg2 AS (
            SELECT id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist2) x
            WHERE rn = 1),
        sums2 AS (
            SELECT a.m, a.k, v.d,
                   CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg2 a JOIN comp v ON v.id = a.id AND v.d // 8 = a.m
            GROUP BY a.m, a.k, v.d),
        cent2 AS (
            SELECT p.k, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent1 p
            LEFT JOIN sums2 s ON s.k = p.k AND s.d = p.d
                                AND s.m = p.d // 8),
        dist3 AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent2 c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        asg3 AS (
            SELECT id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist3) x
            WHERE rn = 1),
        sums3 AS (
            SELECT a.m, a.k, v.d,
                   CAST(sum(v.x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM asg3 a JOIN comp v ON v.id = a.id AND v.d // 8 = a.m
            GROUP BY a.m, a.k, v.d),
        cent3 AS (
            SELECT p.k, p.d,
                   coalesce(CAST(floor(s.sx / CAST(s.n AS DOUBLE)) AS BIGINT),
                            p.x) AS x
            FROM cent2 p
            LEFT JOIN sums3 s ON s.k = p.k AND s.d = p.d
                                AND s.m = p.d // 8),
        dist AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent3 c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        codes AS (
            SELECT id AS c_id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist WHERE id % 100 <> 0) x
            WHERE rn = 1),
        qtab AS (SELECT id AS q_id, m, k, dd FROM dist WHERE id % 100 = 0),
        adc AS (
            SELECT q.q_id, c.c_id, CAST(sum(q.dd) AS BIGINT) AS adc_dist
            FROM codes c JOIN qtab q USING (m, k)
            GROUP BY q.q_id, c.c_id),
        pq AS (
            SELECT q_id, c_id FROM (
                SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY adc_dist, c_id) AS rank
                FROM adc) r
            WHERE rank <= 5),
        l2 AS (
            SELECT q.id AS q_id, c.id AS c_id,
                   CAST(sum((q.x - c.x) * (q.x - c.x)) AS BIGINT) AS l2
            FROM comp q JOIN comp c ON q.d = c.d
            WHERE q.id % 100 = 0 AND c.id % 100 <> 0
            GROUP BY q.id, c.id),
        exact AS (
            SELECT q_id, c_id FROM (
                SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY l2, c_id) AS rn
                FROM l2) e
            WHERE rn <= 5),
        hits AS (
            SELECT e.q_id, CAST(count(*) AS BIGINT) AS hits
            FROM exact e JOIN pq USING (q_id, c_id)
            GROUP BY e.q_id)
        SELECT q.id AS q_id,
               CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
               CAST(coalesce(h.hits, 0) * 1000000000 // 5 AS BIGINT) AS recall_e9
        FROM (SELECT id FROM emb WHERE id % 100 = 0) q
        LEFT JOIN hits h ON h.q_id = q.id
    """,
    "ann_ivfpq": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sample AS (
            SELECT id, rn - 1 AS k FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 16),
        cent AS (SELECT s.k, c.d, c.x FROM sample s JOIN comp c USING (id)),
        dist AS (
            SELECT v.id, c.d // 8 AS m, c.k,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent c ON v.d = c.d
            GROUP BY v.id, c.d // 8, c.k),
        codes AS (
            SELECT id AS c_id, m, k FROM (
                SELECT id, m, k,
                       row_number() OVER (PARTITION BY id, m
                                          ORDER BY dd, k) AS rn
                FROM dist WHERE id % 100 <> 0) x
            WHERE rn = 1),
        qtab AS (SELECT id AS q_id, m, k, dd FROM dist WHERE id % 100 = 0),
        csample AS (
            SELECT id, rn - 1 AS j FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5('c:' || CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 8),
        ccent AS (SELECT s.j, c.d, c.x FROM csample s JOIN comp c USING (id)),
        cdist AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS cd
            FROM comp v JOIN ccent c ON v.d = c.d
            GROUP BY v.id, c.j),
        clist AS (
            SELECT id AS c_id, j AS list FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY cd, j) AS rn
                FROM cdist WHERE id % 100 <> 0) x
            WHERE rn = 1),
        qprobe AS (
            SELECT id AS q_id, j AS list FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY cd, j) AS rn
                FROM cdist WHERE id % 100 = 0) x
            WHERE rn <= 2),
        adc AS (
            SELECT q.q_id, c.c_id, CAST(sum(q.dd) AS BIGINT) AS adc_dist
            FROM codes c
            JOIN clist cl ON cl.c_id = c.c_id
            JOIN qprobe p ON p.list = cl.list
            JOIN qtab q ON q.q_id = p.q_id AND q.m = c.m AND q.k = c.k
            GROUP BY q.q_id, c.c_id),
        ranked AS (
            SELECT q_id, c_id, adc_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_dist, c_id) AS rank
            FROM adc)
        SELECT q_id, c_id, adc_dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "ngram_lm_counts": """
        WITH base AS (
            SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        uni AS (
            SELECT unnest(toks) AS token FROM base),
        ucnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_unigram
                 FROM uni GROUP BY token),
        big AS (
            SELECT DISTINCT b.w1, b.w2 FROM (
                SELECT unnest(list_transform(
                    generate_series(1, greatest(len(toks) - 1, 0)),
                    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
                FROM base) t),
        r AS (SELECT w1 AS token, CAST(count(*) AS BIGINT) AS n_right_types
              FROM big GROUP BY w1),
        l AS (SELECT w2 AS token, CAST(count(*) AS BIGINT) AS n_left_types
              FROM big GROUP BY w2)
        SELECT u.token, u.n_unigram,
               coalesce(r.n_right_types, 0) AS n_right_types,
               coalesce(l.n_left_types, 0) AS n_left_types
        FROM ucnt u
        LEFT JOIN r USING (token)
        LEFT JOIN l USING (token)
    """,
    "join_skew_report": """
        WITH per_key AS (
            SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM per_key),
        ranked AS (
            SELECT key, n,
                   row_number() OVER (ORDER BY n DESC, key) AS rank
            FROM per_key)
        SELECT key, n,
               CAST((n * 1000000000) // n_total AS BIGINT) AS share_e9,
               CAST(rank AS INTEGER) AS rank
        FROM ranked CROSS JOIN tot
        WHERE rank <= 5
    """,
    "phrase_search": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS l
            FROM documents),
        idx AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS p, l
                FROM base),
        terms AS (SELECT doc_id, p - 1 AS pos, l[p] AS term FROM idx)
        SELECT a.doc_id,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(a.pos) AS BIGINT) AS first_pos
        FROM terms a
        JOIN terms b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term = 'the' AND b.term = 'data'
        GROUP BY a.doc_id
    """,
    "rolling_active_users": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day AS report_day FROM ud),
        expanded AS (
            SELECT user_id,
                   CAST(unnest(generate_series(
                       CAST(day AS TIMESTAMP),
                       CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                       INTERVAL 1 DAY)) AS DATE) AS report_day
            FROM ud),
        wau AS (
            SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM expanded JOIN days USING (report_day)
            GROUP BY report_day),
        dau AS (
            SELECT day AS report_day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM ud GROUP BY day)
        SELECT d.report_day, d.dau, w.wau,
               CAST((d.dau * 1000000000) // w.wau AS BIGINT) AS stickiness_e9
        FROM dau d JOIN wau w USING (report_day)
    """,
    "transition_matrix": """
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        pairs AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type),
        tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
                FROM pairs GROUP BY from_type)
        SELECT p.from_type, p.to_type, p.n,
               CAST((p.n * 1000000000) // t.row_n AS BIGINT) AS p_e9
        FROM pairs p JOIN tot t USING (from_type)
    """,
    "source_drift": """
        WITH toks AS (
            SELECT source,
                   unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                                      x -> length(x) > 0)) AS term
            FROM documents),
        per_st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
                   FROM toks GROUP BY source, term),
        gtot AS (SELECT term, CAST(sum(n_st) AS BIGINT) AS n_t
                 FROM per_st GROUP BY term),
        top AS (SELECT term, n_t FROM gtot ORDER BY n_t DESC, term LIMIT 20),
        nc AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_corpus FROM gtot),
        ns AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s
               FROM per_st GROUP BY source),
        cells AS (
            SELECT ns.source, ns.n_s, top.term, top.n_t,
                   coalesce(p.n_st, 0) AS n_st
            FROM ns CROSS JOIN top
            LEFT JOIN per_st p ON p.source = ns.source AND p.term = top.term)
        SELECT source, n_s,
               CAST(sum(abs((n_st * 1000000000) // n_s
                            - (n_t * 1000000000) // n_corpus)) AS BIGINT)
                 AS drift_e9
        FROM cells CROSS JOIN nc
        GROUP BY source, n_s
    """,
    "audio_segments": """
        -- documents.text is ASCII in every sf (octet_length = length), so
        -- VARCHAR substring is byte-identical to the Python payload slice
        WITH docs AS (SELECT doc_id, coalesce(text, '') AS body,
                             octet_length(encode(coalesce(text, ''))) AS size
                      FROM documents),
        n AS (SELECT doc_id, body, size,
                     CAST(greatest(0, ceil((size - 96) / 64.0)) AS BIGINT)
                       AS n_extra
              FROM docs),
        seg AS (SELECT doc_id, body, size,
                       unnest(generate_series(0, n_extra)) AS seg_idx
                FROM n)
        SELECT doc_id,
               CAST(seg_idx AS BIGINT) AS seg_idx,
               CAST(seg_idx * 64 AS BIGINT) AS seg_offset_bytes,
               CAST(least(96, size - seg_idx * 64) AS BIGINT) AS seg_bytes,
               md5(substring(body, CAST(seg_idx * 64 AS BIGINT) + 1, 96))
                 AS seg_hash
        FROM seg
    """,
    "curation_pipeline": """
        WITH f AS (
            SELECT doc_id, lang, source,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0)) AS DOUBLE) AS n_tok_d,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0 AND t IN
                            ('the','a','of','and','to','in','is','that','it','for')))
                        AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct
            FROM documents),
        b AS (
            SELECT doc_id, lang, source,
                   CAST(floor((0.4 * least(n_chars / 500.0, 1.0)
                   + 0.3 * (CASE WHEN n_tok_d > 0
                                 THEN least(n_stop / n_tok_d * 5.0, 1.0)
                                 ELSE 0.0 END)
                   + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                       ELSE 0.0 END)) * 1000) AS INTEGER)
                     AS qbin
            FROM f),
        pb AS (SELECT lang, qbin, count(*) AS n FROM b GROUP BY lang, qbin),
        cut AS (
            SELECT lang, qbin,
                   sum(n) OVER (PARTITION BY lang ORDER BY qbin DESC
                                ROWS UNBOUNDED PRECEDING) - n AS bef,
                   sum(n) OVER (PARTITION BY lang) AS tot
            FROM pb),
        lab AS (
            SELECT lang, qbin,
                   CASE WHEN bef * 3 < tot THEN 'head'
                        WHEN bef * 3 < 2 * tot THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM cut),
        kept AS (
            SELECT b.doc_id, b.lang, b.source, lab.bucket
            FROM b JOIN lab USING (lang, qbin)
            WHERE lab.bucket <> 'tail'),
        tokset AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                                   t -> length(t) > 0))), ' ')) AS fingerprint,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> length(x) > 0)) AS BIGINT)
                     AS n_tok
            FROM documents),
        kept2 AS (
            SELECT k.doc_id, k.lang, k.source, k.bucket,
                   t.fingerprint, t.n_tok
            FROM kept k JOIN tokset t USING (doc_id)),
        canon AS (
            SELECT doc_id, lang, source, bucket, n_tok FROM (
                SELECT *, row_number() OVER (PARTITION BY fingerprint
                                             ORDER BY doc_id) AS rn
                FROM kept2) r
            WHERE rn = 1),
        sampled AS (
            SELECT lang, bucket, n_tok FROM (
                SELECT lang, bucket, n_tok,
                       CAST(sum(n_tok) OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM canon) c
            WHERE cum <= 500)
        SELECT lang, bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM sampled GROUP BY lang, bucket
    """,
    "tokenizer_fertility": """
        WITH s AS (
            SELECT d.lang,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
                     AS bpe
            FROM documents d)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(bpe) AS BIGINT) AS total_bpe,
               CAST(CAST(sum(n_chars) AS BIGINT) * 1000000000
                    // CAST(sum(bpe) AS BIGINT) AS BIGINT)
                 AS chars_per_token_e9
        FROM s GROUP BY lang
    """,
    "cluster_best_doc": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 5, 0)),
                           i -> array_to_string(toks[i+1:i+5], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        rare AS (
            SELECT shingle FROM (
                SELECT shingle, count(DISTINCT doc_id) AS df
                FROM sh GROUP BY shingle) f
            WHERE df <= 100),
        shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM shr a JOIN shr b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT id_a, id_b FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_shared) >= 0.05),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        minreach AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
        clusters AS (
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN minreach ON minreach.src = d.doc_id),
        f AS (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0)) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0 AND t IN
                            ('the','a','of','and','to','in','is','that','it','for')))
                        AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct
            FROM documents),
        q AS (
            SELECT doc_id,
                   0.4 * least(n_chars / 500.0, 1.0)
                   + 0.3 * (CASE WHEN n_tok > 0
                                 THEN least(n_stop / n_tok * 5.0, 1.0)
                                 ELSE 0.0 END)
                   + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                       ELSE 0.0 END) AS quality
            FROM f),
        ranked AS (
            SELECT c.cluster_id, c.doc_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY q.quality DESC, c.doc_id ASC)
                     AS rn
            FROM clusters c JOIN q USING (doc_id))
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(CASE WHEN rn = 1 THEN doc_id END) AS best_doc
        FROM ranked GROUP BY cluster_id
    """,
    "chunk_dedup": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS n
              FROM toks WHERE len(toks) > 0),
        c AS (
            SELECT doc_id,
                   unnest(generate_series(
                       0, CAST(greatest(0, ceil((n - 16) / 12.0)) AS BIGINT)))
                     AS chunk_id,
                   toks
            FROM n),
        fps AS (
            SELECT doc_id,
                   md5(array_to_string(toks[chunk_id*12 + 1 : chunk_id*12 + 16],
                                       ' ')) AS chunk_fp
            FROM c)
        SELECT chunk_fp,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS first_doc
        FROM fps
        GROUP BY chunk_fp
        HAVING count(DISTINCT doc_id) > 1
    """,
    "token_budget_sample": """
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> length(x) > 0)) AS BIGINT)
                     AS n_tok,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents),
        c AS (
            SELECT doc_id, source, n_tok,
                   CAST(sum(n_tok) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
            FROM t)
        SELECT doc_id, source, n_tok, cum_tok
        FROM c WHERE cum_tok <= 700
    """,
    "ccnet_buckets": """
        WITH f AS (
            SELECT doc_id, lang,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0)) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                            t -> length(t) > 0 AND t IN
                            ('the','a','of','and','to','in','is','that','it','for')))
                        AS DOUBLE) AS n_stop,
                   CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct
            FROM documents),
        q AS (
            SELECT doc_id, lang,
                   0.4 * least(n_chars / 500.0, 1.0)
                   + 0.3 * (CASE WHEN n_tok > 0
                                 THEN least(n_stop / n_tok * 5.0, 1.0)
                                 ELSE 0.0 END)
                   + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                       ELSE 0.0 END) AS quality
            FROM f),
        b AS (SELECT doc_id, lang,
                     CAST(floor(quality * 1000) AS INTEGER) AS qbin
              FROM q),
        pb AS (SELECT lang, qbin, count(*) AS n FROM b GROUP BY lang, qbin),
        cut AS (
            SELECT lang, qbin,
                   sum(n) OVER (PARTITION BY lang ORDER BY qbin DESC
                                ROWS UNBOUNDED PRECEDING) - n AS bef,
                   sum(n) OVER (PARTITION BY lang) AS tot
            FROM pb),
        lab AS (
            SELECT lang, qbin,
                   CASE WHEN bef * 3 < tot THEN 'head'
                        WHEN bef * 3 < 2 * tot THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM cut)
        SELECT b.doc_id, b.lang, b.qbin, lab.bucket
        FROM b JOIN lab USING (lang, qbin)
    """,
    "cross_source_duplicates": """
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        fp AS (
            SELECT DISTINCT
                   md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                     AS f,
                   source
            FROM toks)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        GROUP BY a.source, b.source
    """,
    "embedding_decontamination": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 7)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id),
        cand AS (SELECT e.id AS id_e, t.id AS id_t
                 FROM bucket e JOIN bucket t USING (bucket)
                 WHERE e.id % 50 = 0 AND t.id % 50 <> 0),
        sums AS (
            SELECT c.id_e, c.id_t,
                   CAST(sum(de.x * dt.x) AS BIGINT) AS dot,
                   CAST(sum(de.x * de.x) AS BIGINT) AS ne,
                   CAST(sum(dt.x * dt.x) AS BIGINT) AS nt
            FROM cand c
            JOIN comp de ON de.id = c.id_e
            JOIN comp dt ON dt.id = c.id_t AND dt.d = de.d
            GROUP BY c.id_e, c.id_t),
        scored AS (
            SELECT id_e,
                   CAST(dot AS DOUBLE)
                     / sqrt(CAST(ne AS DOUBLE) * CAST(nt AS DOUBLE)) AS cosine
            FROM sums),
        per AS (
            SELECT id_e, CAST(count(*) AS BIGINT) AS n_candidates,
                   max(cosine >= 0.4) AS contaminated
            FROM scored GROUP BY id_e)
        SELECT e.id AS vec_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               coalesce(per.contaminated, FALSE) AS contaminated
        FROM (SELECT id FROM emb WHERE id % 50 = 0) e
        LEFT JOIN per ON per.id_e = e.id
    """,
    "semantic_dedup": """
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        cents AS (SELECT id AS cent_id FROM emb ORDER BY id LIMIT 16),
        centd AS (SELECT cent_id, d, x AS ex
                  FROM cents JOIN comp ON comp.id = cents.cent_id),
        asums AS (SELECT c.id AS c_id, e.cent_id,
                         CAST(sum(c.x * e.ex) AS BIGINT) AS dot,
                         CAST(sum(c.x * c.x) AS BIGINT) AS cn,
                         CAST(sum(e.ex * e.ex) AS BIGINT) AS en
                  FROM comp c JOIN centd e USING (d)
                  GROUP BY c.id, e.cent_id),
        asim AS (SELECT c_id, cent_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(cn AS DOUBLE) * CAST(en AS DOUBLE)) AS cosine
                 FROM asums),
        lists AS (SELECT c_id, cent_id FROM (
                    SELECT c_id, cent_id,
                           row_number() OVER (PARTITION BY c_id
                                              ORDER BY cosine DESC, cent_id) AS rn
                    FROM asim) t WHERE rn = 1),
        pairs AS (SELECT a.c_id AS id_a, b.c_id AS id_b
                  FROM lists a JOIN lists b
                    ON a.cent_id = b.cent_id AND a.c_id < b.c_id),
        psums AS (SELECT p.id_a, p.id_b,
                         CAST(sum(ca.x * cb.x) AS BIGINT) AS dot,
                         CAST(sum(ca.x * ca.x) AS BIGINT) AS an,
                         CAST(sum(cb.x * cb.x) AS BIGINT) AS bn
                  FROM pairs p
                  JOIN comp ca ON ca.id = p.id_a
                  JOIN comp cb ON cb.id = p.id_b AND cb.d = ca.d
                  GROUP BY p.id_a, p.id_b),
        dups AS (SELECT DISTINCT id_b FROM psums
                 WHERE CAST(dot AS DOUBLE)
                       / sqrt(CAST(an AS DOUBLE) * CAST(bn AS DOUBLE)) >= 0.4),
        sizes AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM lists GROUP BY cent_id)
        SELECT l.c_id AS vec_id, l.cent_id AS cluster_id, s.cluster_size,
               d.id_b IS NULL AS keep
        FROM lists l
        JOIN sizes s USING (cent_id)
        LEFT JOIN dups d ON l.c_id = d.id_b
    """,
    "exact_k_sample": """
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
        ORDER BY h, doc_id
        LIMIT 100
    """,
    "winsorize": """
        WITH ranked AS (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events),
        bounds AS (
            SELECT event_type,
                   max(CASE WHEN rn = CAST(ceil(0.05 * cnt) AS BIGINT)
                       THEN value END) AS lo,
                   max(CASE WHEN rn = CAST(ceil(0.95 * cnt) AS BIGINT)
                       THEN value END) AS hi
            FROM ranked GROUP BY event_type),
        clipped AS (
            SELECT e.event_type, e.value, b.lo, b.hi,
                   least(greatest(e.value, b.lo), b.hi) AS cv
            FROM events e JOIN bounds b USING (event_type))
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_low,
               CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_high,
               min(lo) AS lo, min(hi) AS hi,
               CAST(sum(CAST(cv AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_winsorized
        FROM clipped
        GROUP BY event_type
    """,
    "winnowing_dedup": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> ('0x' || substr(md5(array_to_string(
                            toks[i:i+2], ' ')), 1, 8))::BIGINT) AS hs
            FROM base WHERE len(toks) >= 3),
        fps AS (
            SELECT DISTINCT doc_id, unnest(list_transform(
                       generate_series(1, greatest(len(hs) - 3, 1)),
                       j -> list_min(hs[j:j+3]))) AS fingerprint
            FROM g),
        per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
            FROM fps GROUP BY doc_id),
        rare AS (
            SELECT fingerprint FROM (
                SELECT fingerprint, count(*) AS df FROM fps
                GROUP BY fingerprint) t
            WHERE df <= 50),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM fps a
            JOIN fps b ON a.fingerprint = b.fingerprint
                      AND a.doc_id < b.doc_id
            WHERE a.fingerprint IN (SELECT fingerprint FROM rare)
            GROUP BY a.doc_id, b.doc_id
            HAVING count(*) >= 2)
        SELECT s.id_a, s.id_b, s.n_shared,
               CAST((s.n_shared * 1000000000)
                    // least(na.n_fp, nb.n_fp) AS BIGINT) AS containment_e9
        FROM shared s
        JOIN per_doc na ON na.doc_id = s.id_a
        JOIN per_doc nb ON nb.doc_id = s.id_b
    """,
    "gopher_rules": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        sig AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(toks,
                       tk -> length(tk))), 0) AS BIGINT) AS chars,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                   CAST(CASE WHEN len(toks) > 0 THEN
                       list_max(list_transform(list_distinct(toks),
                           d -> len(list_filter(toks, t -> t = d))))
                       ELSE 0 END AS BIGINT) AS topc,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 1, 1)),
                       p -> array_to_string(toks[p:p+1], ' ')) AS bg
            FROM base),
        scored AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens > 0 THEN (chars * 1000) // n_tokens
                        ELSE 0 END AS avg_tok_len_e3,
                   CASE WHEN n_tokens > 0
                        THEN (n_distinct * 1000000000) // n_tokens
                        ELSE 0 END AS distinct_ratio_e9,
                   CASE WHEN n_tokens > 0
                        THEN (topc * 1000000000) // n_tokens
                        ELSE 0 END AS top_token_share_e9,
                   CASE WHEN n_tokens > 0
                        THEN ((len(bg) - len(list_distinct(bg)))
                              * 1000000000) // len(bg)
                        ELSE 0 END AS dup_bigram_frac_e9
            FROM sig),
        flagged AS (
            SELECT *,
                   concat_ws(',',
                       CASE WHEN n_tokens < 20 THEN 'too_short' END,
                       CASE WHEN n_tokens > 100000 THEN 'too_long' END,
                       CASE WHEN n_tokens > 0 AND (avg_tok_len_e3 < 1500
                            OR avg_tok_len_e3 > 12000)
                            THEN 'weird_token_length' END,
                       CASE WHEN distinct_ratio_e9 < 200000000
                            THEN 'low_diversity' END,
                       CASE WHEN top_token_share_e9 > 300000000
                            THEN 'top_heavy' END,
                       CASE WHEN dup_bigram_frac_e9 > 500000000
                            THEN 'repetitive' END) AS fail_reasons
            FROM scored)
        SELECT doc_id, n_tokens, avg_tok_len_e3, distinct_ratio_e9,
               top_token_share_e9, dup_bigram_frac_e9, fail_reasons,
               fail_reasons = '' AS keep
        FROM flagged
    """,
    "min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
            FROM lineitem GROUP BY l_partkey, l_suppkey),
        eur AS (
            SELECT n_nationkey, n_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        cand AS (
            SELECT s.s_acctbal, s.s_name, e.n_name, p.p_partkey, ps.cost,
                   min(ps.cost) OVER (PARTITION BY p.p_partkey) AS min_cost
            FROM ps
            JOIN part p ON ps.l_partkey = p.p_partkey
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            JOIN eur e ON s.s_nationkey = e.n_nationkey
            WHERE p.p_size <= 5 AND p.p_type = 'LARGE'),
        ranked AS (
            SELECT s_acctbal, s_name, n_name, p_partkey,
                   CAST(cost AS DOUBLE) AS supply_cost,
                   row_number() OVER (ORDER BY s_acctbal DESC, n_name,
                                      s_name, p_partkey) AS rnk
            FROM cand WHERE cost = min_cost)
        SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost,
               CAST(rnk AS INTEGER) AS rnk
        FROM ranked WHERE rnk <= 20
    """,
    "dominant_suppliers": """
        WITH sp AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1996-01-01'
            GROUP BY l_partkey, l_suppkey),
        pt AS (SELECT l_partkey, sum(sq) AS pq FROM sp GROUP BY l_partkey),
        dom AS (
            SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_dominated
            FROM sp JOIN pt USING (l_partkey)
            WHERE 2 * sq > pq
            GROUP BY l_suppkey),
        eur AS (
            SELECT n_nationkey, n_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        SELECT s.s_suppkey, s.s_name, e.n_name, d.n_dominated
        FROM dom d
        JOIN supplier s ON d.l_suppkey = s.s_suppkey
        JOIN eur e ON s.s_nationkey = e.n_nationkey
    """,
    "lm_doc_score": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        flat AS (
            SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
                FROM base WHERE len(toks) >= 2) t),
        bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
                 FROM flat GROUP BY w1, w2),
        wstart AS (SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1
                   FROM bcnt GROUP BY w1),
        probs AS (SELECT b.w1, b.w2, b.c_bigram,
                         (b.c_bigram * 1000000000) // w.c_w1 AS p_e9
                  FROM bcnt b JOIN wstart w USING (w1))
        SELECT f.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CASE WHEN p.c_bigram = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_singleton,
               CAST(sum(p.p_e9) // count(*) AS BIGINT) AS avg_p_e9,
               CAST(min(p.p_e9) AS BIGINT) AS min_p_e9
        FROM flat f JOIN probs p USING (w1, w2)
        GROUP BY f.doc_id
    """,
    "boilerplate_removal": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        pos AS (
            SELECT doc_id, unnest(generate_series(1, len(toks) - 2)) AS p,
                   toks
            FROM base WHERE len(toks) >= 3),
        inst AS (
            SELECT doc_id, p, array_to_string(toks[p:p+2], ' ') AS gram
            FROM pos),
        bp AS (
            SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd
                FROM inst GROUP BY gram) t
            WHERE nd >= 3),
        covpos AS (
            SELECT doc_id, unnest(generate_series(p, p + 2)) AS posn
            FROM inst WHERE gram IN (SELECT gram FROM bp)),
        covset AS (
            SELECT doc_id, list(DISTINCT posn) AS cov
            FROM covpos GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(coalesce(len(cov), 0) AS BIGINT) AS n_removed,
               CASE WHEN cov IS NULL THEN coalesce(array_to_string(toks, ' '), '')
                    ELSE coalesce(array_to_string(list_filter(list_transform(
                        generate_series(1, len(toks)),
                        i -> CASE WHEN list_contains(cov, i) THEN NULL
                             ELSE toks[i] END),
                        x -> x IS NOT NULL), ' '), '') END AS clean_text
        FROM base b LEFT JOIN covset USING (doc_id)
    """,
    "linear_quality": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
        scored AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(toks, tk ->
                       (('0x' || substr(md5(tk), 1, 4))::BIGINT % 64 + 71)
                       * 2654435761 % 2001 - 1000)), 0) AS BIGINT) AS score
            FROM base)
        SELECT doc_id, n_tokens, score,
               CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
        FROM scored
    """,
    "jaccard_prefix_join": """
        WITH t0 AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        tok AS (
            SELECT DISTINCT doc_id AS id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS token
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM t0) u
            WHERE length(shingle) > 0),
        sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS s
                  FROM tok GROUP BY id),
        dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                  FROM tok GROUP BY token),
        ranked AS (
            SELECT t.id, t.token,
                   row_number() OVER (PARTITION BY t.id
                                      ORDER BY d.df, t.token) AS pos,
                   s.s
            FROM tok t JOIN dfreq d USING (token) JOIN sizes s USING (id)
            WHERE d.df <= 1000),
        prefix AS (SELECT id, token FROM ranked
                   WHERE pos <= s - ((50 * s + 99) // 100) + 1),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM prefix a JOIN prefix b
                   ON a.token = b.token AND a.id < b.id),
        shared AS (
            SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_shared
            FROM cand c
            JOIN tok ta ON ta.id = c.id_a
            JOIN tok tb ON tb.id = c.id_b AND tb.token = ta.token
            GROUP BY c.id_a, c.id_b)
        SELECT sh.id_a, sh.id_b, sh.n_shared,
               CAST(sh.n_shared * 1000000000
                    // (sa.s + sb.s - sh.n_shared) AS BIGINT) AS jaccard_e9
        FROM shared sh
        JOIN sizes sa ON sa.id = sh.id_a
        JOIN sizes sb ON sb.id = sh.id_b
        WHERE 100 * sh.n_shared >= 50 * (sa.s + sb.s - sh.n_shared)
    """,
    "dsir_importance": """
        WITH tok AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
                   ('0x' || substr(md5(word), 1, 12))::BIGINT % 1024 AS bucket
            FROM (SELECT doc_id, lang,
                         unnest(string_split_regex(lower(coalesce(text, '')),
                                                   '\\W+')) AS word
                  FROM documents) u
            WHERE length(word) > 0),
        stats AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
                         CAST(sum(is_t) AS BIGINT) AS ct
                  FROM tok GROUP BY bucket),
        tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
                       CAST(sum(ct) AS BIGINT) AS nt FROM stats),
        ratios AS (SELECT bucket,
                          CAST((ct * 1000000000 // nt) * 1000000
                               // greatest(cr * 1000000000 // nr, 1)
                               AS BIGINT) AS ratio_e6
                   FROM stats, tot)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(r.ratio_e6) AS BIGINT) AS dsir_score_e6
        FROM tok t JOIN ratios r USING (bucket)
        GROUP BY t.doc_id
    """,
    "resample_gapfill": """
        WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day, value
                    FROM events),
        daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CAST(value AS DECIMAL(18,6)))
                              AS DOUBLE) AS total
                  FROM ev GROUP BY event_type, day),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        spine AS (SELECT et.event_type, CAST(gs.d AS DATE) AS day
                  FROM (SELECT DISTINCT event_type FROM ev) et,
                       bounds b,
                       unnest(generate_series(b.d0, b.d1,
                                              INTERVAL 1 DAY)) AS gs(d))
        SELECT s.event_type, s.day,
               coalesce(d.n, CAST(0 AS BIGINT)) AS n,
               coalesce(d.total, 0.0) AS total
        FROM spine s LEFT JOIN daily d USING (event_type, day)
    """,
    "anomaly_zscore": """
        WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                              CAST(count(*) AS BIGINT) AS x
                       FROM events GROUP BY event_type, CAST(ts AS DATE)),
        stats AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                         CAST(sum(x) AS BIGINT) AS s,
                         CAST(sum(x * x) AS BIGINT) AS q
                  FROM daily GROUP BY event_type)
        SELECT d.event_type, d.day, d.x,
               CASE WHEN (CAST(d.x AS HUGEINT) * st.nd - st.s)
                         * (CAST(d.x AS HUGEINT) * st.nd - st.s)
                         > 4 * (CAST(st.nd AS HUGEINT) * st.q
                                - CAST(st.s AS HUGEINT) * st.s)
                    THEN 1 ELSE 0 END AS is_spike
        FROM daily d JOIN stats st USING (event_type)
    """,
    "pps_sample": """
        WITH d AS (SELECT doc_id, n_chars AS w,
                          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 12))::BIGINT // 262144 AS h30
                   FROM documents),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d)
        SELECT d.doc_id, d.w
        FROM d, tot
        WHERE CAST(d.h30 AS HUGEINT) * tot.tw
              < CAST(100 AS HUGEINT) * d.w * 1073741824
    """,
    "pagerank_types": """
        WITH seq AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS dst
            FROM events),
        edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
                  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
        oe AS (SELECT e.src, e.dst, e.n, t.out_n FROM edges e
               JOIN (SELECT src, CAST(sum(n) AS BIGINT) AS out_n
                     FROM edges GROUP BY src) t USING (src)),
        nodes AS (SELECT DISTINCT event_type AS node FROM events),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
        pr0 AS (SELECT node, CAST(1000000000 // nn.nn AS BIGINT) AS pr_e9
                FROM nodes, nn),
        c1 AS (SELECT oe.dst AS node,
                      CAST(sum(p.pr_e9 * oe.n // oe.out_n) AS BIGINT) AS inc
               FROM oe JOIN pr0 p ON p.node = oe.src GROUP BY oe.dst),
        pr1 AS (SELECT n.node,
                       CAST(150000000 // nn.nn
                            + 85 * coalesce(c.inc, 0) // 100
                            AS BIGINT) AS pr_e9
                FROM nodes n CROSS JOIN nn LEFT JOIN c1 c ON c.node = n.node),
        c2 AS (SELECT oe.dst AS node,
                      CAST(sum(p.pr_e9 * oe.n // oe.out_n) AS BIGINT) AS inc
               FROM oe JOIN pr1 p ON p.node = oe.src GROUP BY oe.dst),
        pr2 AS (SELECT n.node,
                       CAST(150000000 // nn.nn
                            + 85 * coalesce(c.inc, 0) // 100
                            AS BIGINT) AS pr_e9
                FROM nodes n CROSS JOIN nn LEFT JOIN c2 c ON c.node = n.node),
        c3 AS (SELECT oe.dst AS node,
                      CAST(sum(p.pr_e9 * oe.n // oe.out_n) AS BIGINT) AS inc
               FROM oe JOIN pr2 p ON p.node = oe.src GROUP BY oe.dst),
        pr3 AS (SELECT n.node,
                       CAST(150000000 // nn.nn
                            + 85 * coalesce(c.inc, 0) // 100
                            AS BIGINT) AS pr_e9
                FROM nodes n CROSS JOIN nn LEFT JOIN c3 c ON c.node = n.node),
        c4 AS (SELECT oe.dst AS node,
                      CAST(sum(p.pr_e9 * oe.n // oe.out_n) AS BIGINT) AS inc
               FROM oe JOIN pr3 p ON p.node = oe.src GROUP BY oe.dst),
        pr4 AS (SELECT n.node,
                       CAST(150000000 // nn.nn
                            + 85 * coalesce(c.inc, 0) // 100
                            AS BIGINT) AS pr_e9
                FROM nodes n CROSS JOIN nn LEFT JOIN c4 c ON c.node = n.node),
        c5 AS (SELECT oe.dst AS node,
                      CAST(sum(p.pr_e9 * oe.n // oe.out_n) AS BIGINT) AS inc
               FROM oe JOIN pr4 p ON p.node = oe.src GROUP BY oe.dst),
        pr5 AS (SELECT n.node,
                       CAST(150000000 // nn.nn
                            + 85 * coalesce(c.inc, 0) // 100
                            AS BIGINT) AS pr_e9
                FROM nodes n CROSS JOIN nn LEFT JOIN c5 c ON c.node = n.node)
        SELECT node AS event_type, pr_e9 FROM pr5
    """,
"decayed_counts": """
        WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                              CAST(count(*) AS BIGINT) AS x
                       FROM events GROUP BY event_type, CAST(ts AS DATE)),
        cutoff AS (SELECT max(day) AS as_of FROM daily)
        SELECT d.event_type, min(a.as_of) AS as_of,
               CAST(sum(CASE WHEN a.as_of - d.day <= 20
                             THEN d.x * (CAST(1 AS BIGINT)
                                         << (20 - (a.as_of - d.day)))
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT)
                 AS decayed_x2e20,
               CAST(sum(CASE WHEN a.as_of - d.day <= 20 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_days_in_horizon
        FROM daily d, cutoff a
        GROUP BY d.event_type
    """,
    "heavy_hitters": """
        WITH w AS (
            SELECT word FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0)
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM w GROUP BY word
        HAVING count(*) * 100 > (SELECT count(*) FROM w)
        ORDER BY cnt DESC, word
    """,
    "cms_frequency": """
        WITH w AS (
            SELECT word FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0),
        h AS (SELECT word,
                     ('0x' || substr(md5(word), 1, 12))::BIGINT AS h48
              FROM w),
        cells AS (
            SELECT r,
                   ((h48 * (2 * r + 1) + 104729 * (r + 1))
                    % 2147483647) % 512 AS bucket,
                   CAST(count(*) AS BIGINT) AS counter
            FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) rs
            GROUP BY r, bucket),
        exact AS (SELECT word, CAST(count(*) AS BIGINT) AS exact
                  FROM w GROUP BY word),
        probes AS (SELECT word, exact FROM exact
                   ORDER BY exact DESC, word LIMIT 10),
        hw AS (SELECT DISTINCT word, h48 FROM h),
        est AS (
            SELECT p.word, p.exact,
                   CAST(min(c.counter) AS BIGINT) AS est
            FROM probes p
            JOIN hw ON hw.word = p.word
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) rs
            JOIN cells c
              ON c.r = rs.r
             AND c.bucket = ((hw.h48 * (2 * rs.r + 1)
                              + 104729 * (rs.r + 1))
                             % 2147483647) % 512
            GROUP BY p.word, p.exact)
        SELECT word, exact, est, est >= exact AS overcount_ok
        FROM est ORDER BY exact DESC, word
    """,
    "triangle_census": """
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                    WHERE l_orderkey % 4 = 0),
        e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM li x JOIN li y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey),
        deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
                    SELECT a AS v FROM e
                    UNION ALL SELECT b AS v FROM e)
                GROUP BY v),
        o AS (SELECT CASE WHEN da.deg < db.deg
                            OR (da.deg = db.deg AND e.a < e.b)
                          THEN e.a ELSE e.b END AS lo,
                     CASE WHEN da.deg < db.deg
                            OR (da.deg = db.deg AND e.a < e.b)
                          THEN e.b ELSE e.a END AS hi
              FROM e
              JOIN deg da ON da.v = e.a
              JOIN deg db ON db.v = e.b),
        tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM o e1
                JOIN o e2 ON e2.lo = e1.lo AND e2.hi <> e1.hi
                JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                       CAST(sum(deg * (deg - 1)) // 2 AS BIGINT)
                         AS n_wedges
                FROM deg),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        SELECT a.n_nodes, ne.n_edges, a.n_wedges, t.n_triangles,
               CASE WHEN a.n_wedges > 0
                    THEN CAST(t.n_triangles * 3 * 1000000000
                              // a.n_wedges AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS gcc_e9
        FROM agg a, ne, tri t
    """,
    "zorder_layout": f"""
        WITH pts AS (
            SELECT date_diff('day', DATE '1992-01-01',
                             CAST(l_shipdate AS DATE)) AS x,
                   l_partkey & 4095 AS y
            FROM lineitem),
        keyed AS (SELECT x, y,
                         ({zorder_sql('x', 'y', bits=12)}) >> 18 AS bucket
                  FROM pts)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y,
               CAST(max(y) AS BIGINT) AS max_y
        FROM keyed GROUP BY bucket ORDER BY bucket
    """,
    "kmv_set_ops": """
        WITH hashed AS (
            SELECT DISTINCT CAST(o_orderpriority AS VARCHAR) AS s,
                   ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                   1, 12))::BIGINT AS h
            FROM orders
            WHERE o_orderpriority IS NOT NULL AND o_custkey IS NOT NULL),
        ranked AS (SELECT s, h,
                          row_number() OVER (PARTITION BY s
                                             ORDER BY h) AS rn
                   FROM hashed),
        sk AS (SELECT s, list(h ORDER BY h) AS kmins
               FROM ranked WHERE rn <= 64 GROUP BY s),
        ex AS (SELECT s, CAST(count(*) AS BIGINT) AS exact
               FROM hashed GROUP BY s),
        inter AS (SELECT a.s AS set_a, b.s AS set_b,
                         CAST(count(*) AS BIGINT) AS exact_intersect
                  FROM hashed a JOIN hashed b
                    ON a.h = b.h AND a.s < b.s
                  GROUP BY 1, 2),
        pairs AS (SELECT a.s AS set_a, b.s AS set_b,
                         a.kmins AS ka, b.kmins AS kb
                  FROM sk a JOIN sk b ON a.s < b.s),
        c1 AS (SELECT *, list_slice(list_sort(list_distinct(
                   list_concat(ka, kb))), 1, 64) AS mu FROM pairs),
        c2 AS (SELECT *, mu[len(mu)] AS theta FROM c1),
        c3 AS (SELECT *,
                CASE WHEN len(ka) < 64 THEN CAST(len(ka) AS BIGINT)
                     ELSE CAST(17732923532771328 // ka[len(ka)]
                               AS BIGINT) END AS est_a,
                CASE WHEN len(kb) < 64 THEN CAST(len(kb) AS BIGINT)
                     ELSE CAST(17732923532771328 // kb[len(kb)]
                               AS BIGINT) END AS est_b,
                CASE WHEN len(mu) < 64 THEN CAST(len(mu) AS BIGINT)
                     ELSE CAST(17732923532771328 // mu[len(mu)]
                               AS BIGINT) END AS est_union,
                len(list_intersect(
                    list_filter(ka, x -> x <= theta),
                    list_filter(kb, x -> x <= theta))) AS inter_below
               FROM c2),
        c4 AS (SELECT *,
                CASE WHEN len(ka) < 64 AND len(kb) < 64
                     THEN CAST(len(list_intersect(ka, kb)) AS BIGINT)
                     ELSE CAST(CAST(inter_below AS BIGINT)
                               * 281474976710656 // theta AS BIGINT)
                END AS est_intersect
               FROM c3)
        SELECT p.set_a, p.set_b,
               ea.exact AS exact_a, p.est_a,
               eb.exact AS exact_b, p.est_b,
               ea.exact + eb.exact - coalesce(i.exact_intersect, 0)
                 AS exact_union,
               p.est_union,
               coalesce(i.exact_intersect, CAST(0 AS BIGINT))
                 AS exact_intersect,
               p.est_intersect,
               (abs(p.est_a - ea.exact) * 1000 <= ea.exact * 503
                AND abs(p.est_b - eb.exact) * 1000 <= eb.exact * 503
                AND abs(p.est_union - (ea.exact + eb.exact
                        - coalesce(i.exact_intersect, 0))) * 1000
                    <= (ea.exact + eb.exact
                        - coalesce(i.exact_intersect, 0)) * 503)
                 AS within_bound
        FROM c4 p
        JOIN ex ea ON ea.s = p.set_a
        JOIN ex eb ON eb.s = p.set_b
        LEFT JOIN inter i
          ON i.set_a = p.set_a AND i.set_b = p.set_b
        ORDER BY p.set_a, p.set_b
    """,
    "bloom_semijoin": """
        WITH bk AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k
                    FROM orders
                    WHERE o_orderpriority = '1-URGENT'
                      AND o_custkey IS NOT NULL),
        pos AS (SELECT DISTINCT
                    ((('0x' || substr(md5(k), 1, 12))::BIGINT
                      * (2 * r + 1) + 104729 * (r + 1))
                     % 2147483647) % 16384 AS pos
                FROM bk
                CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rs),
        pf AS (SELECT k,
                ((h48 * 1 + 104729) % 2147483647) % 16384 AS p0,
                ((h48 * 3 + 209458) % 2147483647) % 16384 AS p1,
                ((h48 * 5 + 314187) % 2147483647) % 16384 AS p2
               FROM (SELECT CAST(c_custkey AS VARCHAR) AS k,
                            ('0x' || substr(md5(CAST(c_custkey
                                AS VARCHAR)), 1, 12))::BIGINT AS h48
                     FROM customer)),
        flags AS (SELECT k,
                (p0 IN (SELECT pos FROM pos)
                 AND p1 IN (SELECT pos FROM pos)
                 AND p2 IN (SELECT pos FROM pos)) AS bloom_pass,
                k IN (SELECT k FROM bk) AS is_true
            FROM pf),
        agg AS (SELECT
            CAST(count(*) AS BIGINT) AS n_probe,
            CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_bloom_pass,
            CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_true,
            CAST(sum(CASE WHEN bloom_pass AND NOT is_true
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
            FROM flags)
        SELECT n_probe, n_bloom_pass, n_true, n_false_pos,
               CASE WHEN n_probe - n_true > 0
                    THEN CAST(n_false_pos * 1000000
                              // (n_probe - n_true) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS fp_e6,
               n_bloom_pass >= n_true AS no_false_negatives
        FROM agg
    """,
    "inverted_index": """
        WITH wd AS (
            SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0),
        per_doc AS (SELECT word, doc_id,
                           CAST(count(*) AS BIGINT) AS tf,
                           doc_id // 128 AS block
                    FROM wd GROUP BY word, doc_id),
        gaps AS (SELECT word, block, doc_id, tf,
                        doc_id - coalesce(lag(doc_id) OVER (
                            PARTITION BY word, block
                            ORDER BY doc_id), 0) AS gap
                 FROM per_doc)
        SELECT word, block,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS tf_total,
               string_agg(CAST(gap AS VARCHAR), ','
                          ORDER BY doc_id) AS postings
        FROM gaps GROUP BY word, block
        ORDER BY word, block
    """,
    "bpe_merges": f"""
        WITH wf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0 GROUP BY word),
        syms0 AS (SELECT word, cnt,
                         regexp_extract_all(word, '.') AS s
                  FROM wf),
        {bpe_round_sql(1)},
        {bpe_round_sql(2)},
        {bpe_round_sql(3)}
        SELECT * FROM stat1
        UNION ALL SELECT * FROM stat2
        UNION ALL SELECT * FROM stat3
        ORDER BY round
    """,
    # the round-3 symbol table from the unrolled training CTEs IS the
    # encoded vocabulary; documents map through it word-by-word with
    # order preserved (list(... ORDER BY wpos) + flatten)
    "bpe_encode": f"""
        WITH wf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0 GROUP BY word),
        syms0 AS (SELECT word, cnt,
                         regexp_extract_all(word, '.') AS s
                  FROM wf),
        {bpe_round_sql(1)},
        {bpe_round_sql(2)},
        {bpe_round_sql(3)},
        docs AS (
            SELECT doc_id,
                   list_filter(string_split_regex(
                       lower(coalesce(text, '')), '\\W+'),
                       w -> length(w) > 0) AS wl
            FROM documents),
        w AS (
            SELECT doc_id, wl[i] AS word, i AS wpos
            FROM docs, UNNEST(range(1, len(wl) + 1)) AS t(i)),
        enc AS (
            SELECT w.doc_id,
                   flatten(list(v.s ORDER BY w.wpos)) AS toks
            FROM w JOIN syms3 v ON v.word = w.word
            GROUP BY w.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(len(e.toks), 0) AS BIGINT) AS n_tokens,
               md5(coalesce(array_to_string(list_transform(e.toks,
                   t -> CAST(('0x' || substr(md5(t), 1, 12))::BIGINT
                             AS VARCHAR)), ','), '')) AS ids_md5
        FROM documents d LEFT JOIN enc e ON e.doc_id = d.doc_id
    """,
    # bpe_encode's CTE chain folded per language instead of emitted
    # per document
    "bpe_fertility": f"""
        WITH wf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0 GROUP BY word),
        syms0 AS (SELECT word, cnt,
                         regexp_extract_all(word, '.') AS s
                  FROM wf),
        {bpe_round_sql(1)},
        {bpe_round_sql(2)},
        {bpe_round_sql(3)},
        docs AS (
            SELECT doc_id,
                   list_filter(string_split_regex(
                       lower(coalesce(text, '')), '\\W+'),
                       w -> length(w) > 0) AS wl
            FROM documents),
        w AS (
            SELECT doc_id, wl[i] AS word
            FROM docs, UNNEST(range(1, len(wl) + 1)) AS t(i)),
        per_doc AS (
            SELECT w.doc_id,
                   CAST(sum(len(v.s)) AS BIGINT) AS n_tokens
            FROM w JOIN syms3 v ON v.word = w.word
            GROUP BY w.doc_id),
        folded AS (
            SELECT d.lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(coalesce(p.n_tokens, 0)) AS BIGINT)
                       AS total_tokens
            FROM documents d LEFT JOIN per_doc p
                ON p.doc_id = d.doc_id
            GROUP BY d.lang)
        SELECT lang, n_docs, total_chars, total_tokens,
               CASE WHEN total_tokens > 0
                    THEN CAST(total_chars * 1000000 // total_tokens
                              AS BIGINT) END AS chars_per_token_e6
        FROM folded
    """,
    # bpe_encode's per-doc token counts driving sequence_packing's
    # bucketed window
    "bpe_packing": f"""
        WITH wf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents)
            WHERE length(word) > 0 GROUP BY word),
        syms0 AS (SELECT word, cnt,
                         regexp_extract_all(word, '.') AS s
                  FROM wf),
        {bpe_round_sql(1)},
        {bpe_round_sql(2)},
        {bpe_round_sql(3)},
        docs AS (
            SELECT doc_id,
                   list_filter(string_split_regex(
                       lower(coalesce(text, '')), '\\W+'),
                       w -> length(w) > 0) AS wl
            FROM documents),
        w AS (
            SELECT doc_id, wl[i] AS word
            FROM docs, UNNEST(range(1, len(wl) + 1)) AS t(i)),
        per_doc AS (
            SELECT w.doc_id,
                   CAST(sum(len(v.s)) AS BIGINT) AS n_tokens
            FROM w JOIN syms3 v ON v.word = w.word
            GROUP BY w.doc_id),
        toks AS (
            SELECT d.doc_id,
                   CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tok,
                   ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::INT
                     % 32 AS bucket
            FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id),
        packed AS (
            SELECT doc_id, n_tok, bucket,
                   CAST(floor((sum(n_tok) OVER (PARTITION BY bucket
                                                ORDER BY doc_id) - n_tok)
                              / 4096) AS INTEGER) AS seq
            FROM toks)
        SELECT CAST(bucket AS INTEGER) AS bucket, seq,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY bucket, seq
    """,
    # merges trained on the 80% hash split (bpe_round_sql chain over
    # train-only word frequencies), applied to the FULL corpus vocab
    # via the apply-only chain, folded per split
    "bpe_generalization": f"""
        WITH wf AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(string_split_regex(
                    lower(coalesce(text, '')), '\\W+')) AS word
                FROM documents
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                      1, 4))::INT % 100 < 80)
            WHERE length(word) > 0 GROUP BY word),
        syms0 AS (SELECT word, cnt,
                         regexp_extract_all(word, '.') AS s
                  FROM wf),
        {bpe_round_sql(1)},
        {bpe_round_sql(2)},
        {bpe_round_sql(3)},
        docs AS (
            SELECT doc_id, n_chars,
                   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, 4))::INT % 100 < 80
                        THEN 'train' ELSE 'holdout' END AS split,
                   list_filter(string_split_regex(
                       lower(coalesce(text, '')), '\\W+'),
                       w -> length(w) > 0) AS wl
            FROM documents),
        vocab0 AS (
            SELECT word, regexp_extract_all(word, '.') AS s FROM (
                SELECT DISTINCT wl[i] AS word
                FROM docs, UNNEST(range(1, len(wl) + 1)) AS t(i)) v),
        {_bpe_apply_sql(1)},
        {_bpe_apply_sql(2)},
        {_bpe_apply_sql(3)},
        w AS (
            SELECT doc_id, wl[i] AS word
            FROM docs, UNNEST(range(1, len(wl) + 1)) AS t(i)),
        per_doc AS (
            SELECT w.doc_id,
                   CAST(sum(len(v.s)) AS BIGINT) AS n_tokens
            FROM w JOIN vocab3 v ON v.word = w.word
            GROUP BY w.doc_id),
        folded AS (
            SELECT d.split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(coalesce(p.n_tokens, 0)) AS BIGINT)
                       AS total_tokens
            FROM docs d LEFT JOIN per_doc p
                ON p.doc_id = d.doc_id
            GROUP BY d.split)
        SELECT split, n_docs, total_chars, total_tokens,
               CASE WHEN total_tokens > 0
                    THEN CAST(total_chars * 1000000 // total_tokens
                              AS BIGINT) END AS chars_per_token_e6
        FROM folded
    """,
    # exact-fill packing: every doc explodes into the bounded range of
    # packs it intersects; spans are pure window arithmetic
    "pack_spans": """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                            x -> length(x) > 0)) AS BIGINT) AS n_tok,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                     % 32 AS bucket
            FROM documents),
        cum AS (
            SELECT doc_id, bucket, n_tok,
                   CAST(sum(n_tok) OVER (PARTITION BY bucket
                                         ORDER BY doc_id) AS BIGINT) AS cum
            FROM toks WHERE n_tok > 0),
        spans AS (
            SELECT doc_id, bucket, n_tok, cum - n_tok AS prior, s.seq
            FROM cum, UNNEST(generate_series((cum - n_tok) // 2048,
                                             (cum - 1) // 2048)) AS s(seq))
        SELECT CAST(bucket AS INTEGER) AS bucket,
               CAST(seq AS INTEGER) AS seq, doc_id,
               CAST(greatest(0, seq * 2048 - prior) AS BIGINT) AS start_tok,
               CAST(least(n_tok, (seq + 1) * 2048 - prior)
                    - greatest(0, seq * 2048 - prior) AS BIGINT)
                   AS n_tok_in_pack
        FROM spans
    """,
    # per-label floor-average centroids (the kmeans recenter
    # convention), own-prototype cosine floored to e6 BEFORE the sum
    "embedding_prototypes": """
        WITH emb AS (SELECT vec_id AS id, CAST(label AS INTEGER) AS label,
                            embedding
                     FROM embeddings WHERE label IS NOT NULL),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, label, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sums AS (
            SELECT label, d, CAST(sum(x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM comp GROUP BY label, d),
        cent AS (
            SELECT label, d,
                   CAST(floor(sx / CAST(n AS DOUBLE)) AS BIGINT) AS cx
            FROM sums),
        pn AS (SELECT label, CAST(sum(cx * cx) AS BIGINT) AS pn
               FROM cent GROUP BY label),
        dots AS (
            SELECT v.id, v.label,
                   CAST(sum(v.x * c.cx) AS BIGINT) AS dot,
                   CAST(sum(v.x * v.x) AS BIGINT) AS nv
            FROM comp v JOIN cent c ON c.label = v.label AND c.d = v.d
            GROUP BY v.id, v.label),
        cosr AS (
            -- zero-norm guard: cos := 0 when pn=0 or nv=0 (Spark twin
            -- uses the same convention; NaN handling differs per engine)
            SELECT d.label,
                   CAST(floor(CASE WHEN d.nv > 0 AND p.pn > 0
                              THEN CAST(d.dot AS DOUBLE)
                                   / sqrt(CAST(d.nv AS DOUBLE)
                                          * CAST(p.pn AS DOUBLE))
                              ELSE 0.0 END
                              * 1000000) AS BIGINT) AS cos_e6
            FROM dots d JOIN pn p USING (label))
        SELECT label, CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(cos_e6) AS BIGINT) // CAST(count(*) AS BIGINT)
                   AS mean_cos_e6,
               CAST(min(cos_e6) AS BIGINT) AS min_cos_e6
        FROM cosr GROUP BY label
    """,
    # every member scored against ALL prototypes; argmax cosine with
    # ties -> lowest label, counted per (own, nearest)
    "label_noise": """
        WITH emb AS (SELECT vec_id AS id, CAST(label AS INTEGER) AS label,
                            embedding
                     FROM embeddings WHERE label IS NOT NULL),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, label, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        sums AS (
            SELECT label, d, CAST(sum(x) AS BIGINT) AS sx,
                   CAST(count(*) AS BIGINT) AS n
            FROM comp GROUP BY label, d),
        cent AS (
            SELECT label, d,
                   CAST(floor(sx / CAST(n AS DOUBLE)) AS BIGINT) AS cx
            FROM sums),
        pn AS (SELECT label, CAST(sum(cx * cx) AS BIGINT) AS pn
               FROM cent GROUP BY label),
        nv AS (SELECT id, CAST(sum(x * x) AS BIGINT) AS nv
               FROM comp GROUP BY id),
        alldots AS (
            SELECT v.id, v.label AS own, c.label AS plabel,
                   CAST(sum(v.x * c.cx) AS BIGINT) AS dot
            FROM comp v JOIN cent c ON c.d = v.d
            GROUP BY v.id, v.label, c.label),
        coss AS (
            -- zero-norm guard: cos := 0 when pn=0 or nv=0 (Spark twin
            -- uses the same convention; NaN ordering differs per engine)
            SELECT a.id, a.own, a.plabel,
                   CASE WHEN n.nv > 0 AND p.pn > 0
                        THEN CAST(a.dot AS DOUBLE)
                             / sqrt(CAST(n.nv AS DOUBLE)
                                    * CAST(p.pn AS DOUBLE))
                        ELSE 0.0 END AS cosv
            FROM alldots a JOIN nv n ON n.id = a.id
            JOIN pn p ON p.label = a.plabel),
        arg AS (
            SELECT id, own, plabel FROM (
                SELECT id, own, plabel,
                       row_number() OVER (PARTITION BY id
                                          ORDER BY cosv DESC, plabel) AS rn
                FROM coss) x WHERE rn = 1)
        SELECT own AS label, plabel AS nearest_label,
               CAST(count(*) AS BIGINT) AS n_members
        FROM arg GROUP BY own, plabel
    """,
    # naive per-cluster window over the same unrolled Lloyd rounds the
    # ann_ivf_trained_recall oracle runs
    "cluster_balanced_sample": f"""
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        samp AS (
            SELECT id, rn - 1 AS j FROM (
                SELECT id, row_number() OVER (
                    ORDER BY md5('c:' || CAST(id AS VARCHAR)), id) AS rn
                FROM emb) s
            WHERE rn <= 8),
        cent0 AS (SELECT s.j, c.d, c.x FROM samp s JOIN comp c USING (id)),
        {_lloyd_round_sql(1)},
        {_lloyd_round_sql(2)},
        {_lloyd_round_sql(3)},
        distf AS (
            SELECT v.id, c.j,
                   CAST(sum((v.x - c.x) * (v.x - c.x)) AS BIGINT) AS dd
            FROM comp v JOIN cent3 c USING (d) GROUP BY v.id, c.j),
        asgf AS (
            SELECT id, j FROM (
                SELECT id, j, row_number() OVER (PARTITION BY id
                                                 ORDER BY dd, j) AS rn
                FROM distf) x WHERE rn = 1),
        ranked AS (
            SELECT j, id,
                   row_number() OVER (PARTITION BY j
                       ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
            FROM asgf)
        SELECT CAST(j AS INTEGER) AS list, id AS vec_id,
               CAST(rn AS INTEGER) AS rank_in_list
        FROM ranked WHERE rn <= 8
    """,
    # exact percentile_disc decile bounds (quantile_exact's rank/count
    # convention, single group) + the training_order shard idiom
    "curriculum_order": """
        WITH s AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS v
            FROM documents WHERE n_chars IS NOT NULL),
        r AS (
            SELECT v, row_number() OVER (ORDER BY v) AS rk,
                   count(*) OVER () AS n
            FROM s),
        p AS (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS pct),
        bounds AS (
            SELECT p.pct, r.v AS b
            FROM r JOIN p ON r.rk = (r.n * p.pct + 99) // 100),
        keyed AS (
            SELECT s.doc_id,
                   (SELECT CAST(count(*) AS INTEGER) FROM bounds
                    WHERE s.v > bounds.b) AS difficulty,
                   md5(CAST(s.doc_id AS VARCHAR)) AS h,
                   ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2))::INT
                     % 32 AS shard
            FROM s)
        SELECT doc_id, difficulty, CAST(shard AS INTEGER) AS shard,
               CAST(row_number() OVER (PARTITION BY difficulty, shard
                                       ORDER BY h, doc_id) AS INTEGER) AS pos
        FROM keyed
    """,
    "constraint_report": """
        SELECT * FROM (
            SELECT 'pk_unique_orders' AS check_name,
                   CAST(count(*) AS BIGINT) AS n_checked,
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                     AS n_violations,
                   count(*) - count(DISTINCT o_orderkey) = 0 AS pass
            FROM orders
            UNION ALL
            SELECT 'pk_unique_customer',
                   CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
                   count(*) - count(DISTINCT c_custkey) = 0
            FROM customer
            UNION ALL
            SELECT 'fk_orders_customer',
                   (SELECT CAST(count(*) AS BIGINT) FROM orders),
                   CAST(count(*) AS BIGINT),
                   count(*) = 0
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'fk_lineitem_part',
                   (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
                   CAST(count(*) AS BIGINT),
                   count(*) = 0
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)
            UNION ALL
            SELECT 'domain_discount_0_1',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN l_discount < 0 OR l_discount > 1
                       THEN 1 ELSE 0 END) = 0
            FROM lineitem
            UNION ALL
            SELECT 'domain_quantity_pos',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                        AS BIGINT),
                   sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) = 0
            FROM lineitem
            UNION ALL
            SELECT 'not_null_orderdate',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN o_orderdate IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN o_orderdate IS NULL
                       THEN 1 ELSE 0 END) = 0
            FROM orders)
        ORDER BY check_name
    """,
    "block_dedup": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '\\W+'),
                               x -> length(x) > 0) AS tk
            FROM documents),
        nb AS (
            SELECT doc_id, tk,
                   CAST(ceil(len(tk) / 8.0) AS BIGINT) AS n_blocks
            FROM toks WHERE len(tk) > 0),
        ids AS (
            SELECT doc_id, tk, n_blocks,
                   unnest(range(n_blocks)) AS block_id
            FROM nb),
        blocks AS (
            SELECT doc_id, CAST(block_id AS BIGINT) AS block_id, n_blocks,
                   array_to_string(
                       tk[CAST(block_id * 8 + 1 AS BIGINT)
                          : CAST(least((block_id + 1) * 8,
                                       len(tk)) AS BIGINT)],
                       ' ') AS btext
            FROM ids),
        kept AS (
            SELECT doc_id, block_id, n_blocks, btext,
                   row_number() OVER (PARTITION BY md5(btext)
                                      ORDER BY doc_id, block_id) AS rn
            FROM blocks),
        rebuilt AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS kept_blocks,
                   string_agg(btext, ' ' ORDER BY block_id) AS ktext
            FROM kept WHERE rn = 1 GROUP BY doc_id)
        SELECT n.doc_id, n.n_blocks,
               CAST(coalesce(r.kept_blocks, 0) AS BIGINT) AS kept_blocks,
               CAST(len(list_filter(
                   string_split_regex(coalesce(r.ktext, ''), '\\s+'),
                   x -> length(x) > 0)) AS BIGINT) AS kept_tokens,
               md5(coalesce(r.ktext, '')) AS kept_fp
        FROM nb n LEFT JOIN rebuilt r ON n.doc_id = r.doc_id
    """,
    # naive relational twin of the in-row interval-merge rebuild: a
    # token survives iff NO duplicate window position covers it
    "block_dedup_rolling": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '\\W+'),
                               x -> length(x) > 0) AS tk
            FROM documents),
        d AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
              FROM toks WHERE len(tk) > 0),
        wins AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   md5(array_to_string(
                       tk[CAST(i + 1 AS BIGINT)
                          : CAST(i + 8 AS BIGINT)], ' ')) AS wfp
            FROM d, UNNEST(range(n - 8 + 1)) AS t(i)
            WHERE n >= 8),
        rk AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY wfp
                                      ORDER BY doc_id, pos) AS rn
            FROM wins),
        stats AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_windows
            FROM rk GROUP BY doc_id),
        dup AS (SELECT doc_id, pos FROM rk WHERE rn > 1),
        tokens AS (
            SELECT doc_id, CAST(i AS BIGINT) AS ti,
                   tk[CAST(i + 1 AS BIGINT)] AS tok
            FROM d, UNNEST(range(n)) AS t(i)),
        kept AS (
            SELECT t.doc_id, t.ti, t.tok
            FROM tokens t
            WHERE NOT EXISTS (
                SELECT 1 FROM dup u
                WHERE u.doc_id = t.doc_id
                  AND u.pos BETWEEN t.ti - 7 AND t.ti)),
        ktext AS (
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY ti) AS kt
            FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(s.n_windows, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(s.dup_windows, 0) AS BIGINT) AS dup_windows,
               CAST(len(list_filter(
                   string_split_regex(coalesce(k.kt, ''), '\\s+'),
                   x -> length(x) > 0)) AS BIGINT) AS kept_tokens,
               md5(coalesce(k.kt, '')) AS kept_fp
        FROM d LEFT JOIN stats s ON s.doc_id = d.doc_id
        LEFT JOIN ktext k ON k.doc_id = d.doc_id
    """,
    # BIGINT fixed-point Σ idf_e6·tfsat_e9 over the broadcast 4-term
    # query — the float ops are one division + one multiply on
    # identical int64-derived doubles (correctly rounded everywhere)
    # plus ln on 4 distinct per-TERM inputs, floored at e6
    "bm25_multiterm": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(coalesce(text, '')),
                                          '\\W+'),
                       x -> length(x) > 0)) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
               FROM toks GROUP BY doc_id),
        corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(dl) AS BIGINT) AS l_total
                   FROM dl),
        docfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS docfreq
                    FROM tf GROUP BY term),
        qterms AS (
            SELECT term,
                   CAST(floor(1e6 * ln((2 * n_docs + 2)
                       / CAST(2 * docfreq + 1 AS DOUBLE))) AS BIGINT)
                       AS idf_e6
            FROM (SELECT term, docfreq FROM docfreq
                  ORDER BY docfreq DESC, term LIMIT 4)
            CROSS JOIN corpus),
        scored AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_terms_hit,
                   CAST(max(d.dl) AS BIGINT) AS dl,
                   CAST(sum(q.idf_e6 * CAST(floor(
                       CAST(t.tf * 20 * c.l_total AS DOUBLE)
                       / CAST(t.tf * 20 * c.l_total + 6 * c.l_total
                              + 18 * d.dl * c.n_docs AS DOUBLE)
                       * 1000000000.0) AS BIGINT)) AS BIGINT)
                       AS score_fp
            FROM tf t JOIN qterms q USING (term)
            JOIN dl d USING (doc_id)
            CROSS JOIN corpus c
            GROUP BY t.doc_id)
        SELECT doc_id, n_terms_hit, dl, score_fp
        FROM scored ORDER BY score_fp DESC, doc_id LIMIT 25
    """,
    # the 4 greedy rounds unrolled relationally (_mmr_round_sql);
    # candidate + pairwise-sim tables are bounded (25/query)
    "mmr_diversify": f"""
        WITH emb AS (SELECT vec_id AS id, embedding FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                             * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        nrm AS (SELECT id, CAST(sum(x * x) AS BIGINT) AS n2
                FROM comp GROUP BY id),
        qd AS (
            SELECT q.id AS q_id, c.id AS c_id,
                   CAST(sum(q.x * c.x) AS BIGINT) AS dot
            FROM comp q JOIN comp c ON q.d = c.d
            WHERE q.id % 100 = 0 AND c.id % 100 <> 0
            GROUP BY q.id, c.id),
        rel AS (
            SELECT q_id, c_id,
                   CASE WHEN nq.n2 > 0 AND nc.n2 > 0
                        THEN CAST(floor(CAST(dot AS DOUBLE)
                             / sqrt(CAST(nq.n2 AS DOUBLE)
                                    * CAST(nc.n2 AS DOUBLE))
                             * 1e6) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS rel_e6
            FROM qd JOIN nrm nq ON nq.id = qd.q_id
            JOIN nrm nc ON nc.id = qd.c_id),
        cand AS MATERIALIZED (
            SELECT q_id, c_id, rel_e6, rn FROM (
                SELECT q_id, c_id, rel_e6,
                       row_number() OVER (PARTITION BY q_id
                           ORDER BY rel_e6 DESC, c_id) AS rn
                FROM rel) z WHERE rn <= 25),
        cd AS (SELECT cand.q_id, cand.c_id, comp.d, comp.x
               FROM cand JOIN comp ON comp.id = cand.c_id),
        sdot AS (
            SELECT a.q_id, a.c_id AS ca, b.c_id AS cb,
                   CAST(sum(a.x * b.x) AS BIGINT) AS dot
            FROM cd a JOIN cd b
              ON a.q_id = b.q_id AND a.d = b.d AND a.c_id <> b.c_id
            GROUP BY a.q_id, a.c_id, b.c_id),
        simt AS MATERIALIZED (
            SELECT s.q_id, s.ca, s.cb,
                   CASE WHEN na.n2 > 0 AND nb.n2 > 0
                        THEN CAST(floor(CAST(s.dot AS DOUBLE)
                             / sqrt(CAST(na.n2 AS DOUBLE)
                                    * CAST(nb.n2 AS DOUBLE))
                             * 1e6) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS sim_e6
            FROM sdot s JOIN nrm na ON na.id = s.ca
            JOIN nrm nb ON nb.id = s.cb),
        sel1 AS MATERIALIZED (
            SELECT q_id, c_id, 1 AS round FROM cand WHERE rn = 1),
        {_mmr_round_sql(2)},
        {_mmr_round_sql(3)},
        {_mmr_round_sql(4)},
        {_mmr_round_sql(5)}
        SELECT s.q_id, CAST(s.round AS INTEGER) AS round, s.c_id,
               r.rel_e6
        FROM sel5 s JOIN cand r
          ON r.q_id = s.q_id AND r.c_id = s.c_id
    """,
    # first-occurrence attribution by lowest doc_id over md5'd 3-grams
    "ngram_novelty": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, md5(shingle) AS gfp FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' ')))
                           AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        firsts AS (SELECT gfp, min(doc_id) AS first_doc
                   FROM sh GROUP BY gfp)
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(sum(CASE WHEN f.first_doc = s.doc_id
                        THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
               CAST(CAST(sum(CASE WHEN f.first_doc = s.doc_id
                        THEN 1 ELSE 0 END) AS BIGINT) * 1000000
                    // CAST(count(*) AS BIGINT) AS BIGINT) AS novelty_e6
        FROM sh s JOIN firsts f USING (gfp)
        GROUP BY s.doc_id
    """,
    # byte-level SimHash over hexed payloads (the dedup_simhash vote
    # SQL, grams = 4-byte windows every 2 bytes), 4 × 12-bit bands,
    # stop-bucket cap, exact Hamming verify via bit_count(xor)
    "media_neardup": """
        WITH pay AS (
            SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx
            FROM documents),
        grams AS (
            SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1,
                               greatest((length(hx) - 8) // 4 + 1, 1)),
                           i -> substring(hx, (i - 1) * 4 + 1, 8))) AS g
                FROM pay) u
            WHERE length(g) = 8),
        hashed AS (
            SELECT doc_id, ('0x' || substr(md5(g), 1, 12))::BIGINT AS h
            FROM grams),
        bits AS (SELECT unnest(generate_series(0, 47)) AS bit),
        bitsum AS (
            SELECT p.doc_id, b.bit,
                   coalesce(sum(CASE WHEN (h.h >> b.bit) & 1 = 1
                                     THEN 1 ELSE -1 END), 0) AS s
            FROM pay p CROSS JOIN bits b
            LEFT JOIN hashed h ON h.doc_id = p.doc_id
            GROUP BY p.doc_id, b.bit),
        fp AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bitsum GROUP BY doc_id),
        banded AS (
            SELECT f.doc_id, f.simhash, b.band,
                   (f.simhash >> (b.band * 12)) & 4095 AS band_key
            FROM fp f CROSS JOIN
                 (SELECT unnest(generate_series(0, 3)) AS band) b),
        ok AS (SELECT band, band_key FROM banded
               GROUP BY band, band_key HAVING count(*) <= 50),
        kept AS (SELECT banded.* FROM banded
                 JOIN ok USING (band, band_key)),
        pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS fa, b.simhash AS fb
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
        FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
    """,
    # rolling dedup + Lee-et-al. min match length: duplicate positions
    # merge via gaps-and-islands (same-width k intervals: island break
    # when pos > prev_pos + k), only islands spanning >= 16 tokens
    # remove text
    "block_dedup_minspan": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '\\W+'),
                               x -> length(x) > 0) AS tk
            FROM documents),
        d AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
              FROM toks WHERE len(tk) > 0),
        wins AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   md5(array_to_string(
                       tk[CAST(i + 1 AS BIGINT)
                          : CAST(i + 8 AS BIGINT)], ' ')) AS wfp
            FROM d, UNNEST(range(n - 8 + 1)) AS t(i)
            WHERE n >= 8),
        rk AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY wfp
                                      ORDER BY doc_id, pos) AS rn
            FROM wins),
        stats AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_windows
            FROM rk GROUP BY doc_id),
        dup AS (SELECT doc_id, pos FROM rk WHERE rn > 1),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > lag(pos) OVER w + 8
                        OR lag(pos) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_break
            FROM dup
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        isl AS (
            SELECT doc_id, pos,
                   sum(is_break) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING)
                       AS island
            FROM brk),
        merged AS (
            SELECT doc_id, min(pos) AS lo, max(pos) + 8 AS hi
            FROM isl GROUP BY doc_id, island),
        cut AS (SELECT doc_id, lo, hi FROM merged WHERE hi - lo >= 16),
        tokens AS (
            SELECT doc_id, CAST(i AS BIGINT) AS ti,
                   tk[CAST(i + 1 AS BIGINT)] AS tok
            FROM d, UNNEST(range(n)) AS t(i)),
        kept AS (
            SELECT t.doc_id, t.ti, t.tok
            FROM tokens t
            WHERE NOT EXISTS (
                SELECT 1 FROM cut u
                WHERE u.doc_id = t.doc_id
                  AND t.ti >= u.lo AND t.ti < u.hi)),
        ktext AS (
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY ti) AS kt
            FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(s.n_windows, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(s.dup_windows, 0) AS BIGINT) AS dup_windows,
               CAST(len(list_filter(
                   string_split_regex(coalesce(k.kt, ''), '\\s+'),
                   x -> length(x) > 0)) AS BIGINT) AS kept_tokens,
               md5(coalesce(k.kt, '')) AS kept_fp
        FROM d LEFT JOIN stats s ON s.doc_id = d.doc_id
        LEFT JOIN ktext k ON k.doc_id = d.doc_id
    """,
    # the ksql MASK char classes in DuckDB spelling ('g' flag: DuckDB
    # regexp_replace is first-match-only by default, Spark's is global)
    "ksql_functions": f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
            FROM orders WHERE o_orderkey % 29 = 0),
        r AS (
            SELECT o_orderkey AS id,
                   o_orderpriority AS grp,
                   {_DUCK_MASK.format(
                       c="(o_orderpriority || '#' || o_orderstatus)")}
                       AS masked,
                   substring(o_orderpriority, 1, 3) ||
                       {_DUCK_MASK.format(
                           c="substring(o_orderpriority, 4)")} AS mkl,
                   {_DUCK_MASK.format(
                       c="substring(o_orderpriority, 1,"
                         " greatest(length(o_orderpriority) - 4, 0))")}
                       || substring(o_orderpriority,
                           greatest(length(o_orderpriority) - 4, 0) + 1)
                       AS mkr,
                   {_DUCK_MASK.format(
                       c="substring(o_orderpriority, 1, 2)")}
                       || substring(o_orderpriority, 3) AS ml,
                   substring(o_orderpriority, 1,
                       greatest(length(o_orderpriority) - 2, 0)) ||
                       {_DUCK_MASK.format(
                           c="substring(o_orderpriority,"
                             " greatest(length(o_orderpriority)"
                             " - 2, 0) + 1)")} AS mr,
                   upper(lower(o_orderstatus)) AS status_u,
                   CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
                   substring(o_orderpriority, 3, 6) AS prio_word,
                   strftime(DATE '1970-01-01'
                            + CAST(o_orderkey % 20000 AS INT),
                            '%Y-%m-%d') AS dstr,
                   CAST(date_diff('day', DATE '1970-01-01',
                       CAST(strptime(strftime(DATE '1970-01-01'
                               + CAST(o_orderkey % 20000 AS INT),
                               '%Y-%m-%d'), '%Y-%m-%d') AS DATE))
                       AS BIGINT) AS days_rt,
                   CAST(FLOOR((6371.0 * 2 * asin(sqrt(
                       pow(sin((radians(CAST(o_orderkey % 67 AS DOUBLE))
                           - radians(CAST(o_orderkey % 89 AS DOUBLE)))
                           / 2), 2)
                       + cos(radians(CAST(o_orderkey % 89 AS DOUBLE)))
                       * cos(radians(CAST(o_orderkey % 67 AS DOUBLE)))
                       * pow(sin((radians(CAST(o_custkey % 131 AS DOUBLE))
                           - radians(CAST(o_custkey % 179 AS DOUBLE)))
                           / 2), 2)))) * 10) AS BIGINT) AS geo_dm,
                   coalesce(nullif(o_orderstatus, 'O'), 'open')
                       AS status_or_open
            FROM base),
        g0 AS (
            SELECT o_orderpriority AS grp, lower(o_orderstatus) AS st,
                   count(*) AS c
            FROM base GROUP BY 1, 2),
        gh AS (
            SELECT grp, CAST(sum(c) AS BIGINT) AS n_rows,
                   string_agg(st || '=' || CAST(c AS VARCHAR),
                              ',' ORDER BY st) AS hist_csv
            FROM g0 GROUP BY grp),
        gt AS (
            SELECT o_orderpriority AS grp,
                   array_to_string(list_transform(list_slice(
                       list_sort(list(o_orderkey % 97), 'DESC'), 1, 3),
                       x -> CAST(x AS VARCHAR)), ',') AS top_mod_csv
            FROM base GROUP BY o_orderpriority)
        SELECT r.id, r.grp, r.masked, r.mkl, r.mkr, r.ml, r.mr,
               r.status_u, r.prio_len, r.prio_word, r.dstr, r.days_rt,
               r.geo_dm, r.status_or_open,
               gh.n_rows, gt.top_mod_csv, gh.hist_csv
        FROM r JOIN gh ON gh.grp = r.grp JOIN gt ON gt.grp = r.grp
    """,
    "vocab_concentration": """
        WITH per_tok AS (
            SELECT source AS stratum, tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source,
                         unnest(string_split_regex(
                             lower(coalesce(text, '')), '\\W+')) AS tok
                  FROM documents) t
            WHERE length(tok) > 0
            GROUP BY source, tok),
        ranked AS (
            SELECT stratum, tok, c,
                   row_number() OVER (PARTITION BY stratum
                                      ORDER BY c DESC, tok) AS rk
            FROM per_tok),
        agg AS (
            SELECT stratum,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hapax,
                   CAST(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END)
                        AS BIGINT) AS top_mass
            FROM ranked GROUP BY stratum)
        SELECT stratum, n_tokens, vocab, hapax, top_mass,
               CAST((vocab * 1000000000) // n_tokens AS BIGINT) AS ttr_e9,
               CAST((hapax * 1000000000) // vocab AS BIGINT)
                   AS hapax_ratio_e9,
               CAST((top_mass * 1000000000) // n_tokens AS BIGINT)
                   AS top_share_e9
        FROM agg
    """,
    "cosine_pair_topk": """
        WITH tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                         unnest(string_split_regex(
                             lower(coalesce(text, '')), '\\W+')) AS term
                  FROM documents) t
            WHERE length(term) > 0
            GROUP BY doc_id, term),
        rare AS (
            SELECT term FROM tf GROUP BY term HAVING count(*) <= 50),
        pruned AS (
            SELECT tf.* FROM tf JOIN rare USING (term)),
        norms AS (
            SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm_sq
            FROM pruned GROUP BY doc_id),
        dots AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
            FROM pruned a JOIN pruned b
              ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b, dot, na.norm_sq AS na, nb.norm_sq AS nb,
               CAST((CAST(dot AS HUGEINT) * dot * 1000000000)
                    // (CAST(na.norm_sq AS HUGEINT) * nb.norm_sq)
                    AS BIGINT) AS cos_sq_e9
        FROM dots
        JOIN norms na ON na.doc_id = id_a
        JOIN norms nb ON nb.doc_id = id_b
        ORDER BY cos_sq_e9 DESC, id_a, id_b
        LIMIT 20
    """,
    "hard_negatives": """
        WITH emb AS (SELECT vec_id AS id, embedding, label
                     FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 31)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                                   * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id, p // 8 AS tbl,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id, p // 8),
        probes AS (
            SELECT b.id AS q_id, b.tbl,
                   CASE WHEN pp.p = -1 THEN b.bucket
                        ELSE xor(b.bucket, (1::BIGINT << pp.p)) END AS bucket
            FROM bucket b
            CROSS JOIN (SELECT unnest(generate_series(-1, 7)) AS p) pp
            WHERE b.id % 100 = 0),
        cand AS (SELECT DISTINCT p.q_id, c.id AS c_id
                 FROM probes p JOIN bucket c USING (tbl, bucket)
                 WHERE p.q_id <> c.id),
        sums AS (SELECT cd.q_id, cd.c_id,
                        CAST(sum(dq.x * dc.x) AS BIGINT) AS dot,
                        CAST(sum(dq.x * dq.x) AS BIGINT) AS qn,
                        CAST(sum(dc.x * dc.x) AS BIGINT) AS cn
                 FROM cand cd
                 JOIN comp dq ON dq.id = cd.q_id
                 JOIN comp dc ON dc.id = cd.c_id AND dc.d = dq.d
                 GROUP BY cd.q_id, cd.c_id),
        sim AS (SELECT s.q_id, a.label AS q_label, s.c_id,
                       b.label AS c_label,
                       CAST(dot AS DOUBLE)
                         / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))
                         AS cosine
                FROM sums s
                JOIN emb a ON a.id = s.q_id
                JOIN emb b ON b.id = s.c_id
                WHERE a.label <> b.label),
        ranked AS (SELECT *,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cosine DESC, c_id)
                              AS rank
                   FROM sim)
        SELECT q_id, q_label, c_id, c_label, cosine,
               CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "hard_negatives_recall": """
        WITH emb AS (SELECT vec_id AS id, embedding, label
                     FROM embeddings),
        dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        planes AS (SELECT unnest(generate_series(0, 31)) AS p),
        comp AS (SELECT id, d,
                        CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                                   * 10000.0 + 0.5) AS BIGINT) AS x
                 FROM emb CROSS JOIN dims),
        qd AS (SELECT id AS q_id, d, x AS qx
               FROM comp WHERE id % 100 = 0),
        esums AS (SELECT q_id, cd.id AS c_id,
                         CAST(sum(qx * cd.x) AS BIGINT) AS dot,
                         CAST(sum(qx * qx) AS BIGINT) AS qn,
                         CAST(sum(cd.x * cd.x) AS BIGINT) AS cn
                  FROM qd JOIN comp cd USING (d)
                  WHERE q_id <> cd.id
                  GROUP BY q_id, cd.id),
        esim AS (SELECT s.q_id, s.c_id,
                        CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))
                          AS cosine
                 FROM esums s
                 JOIN emb a ON a.id = s.q_id
                 JOIN emb b ON b.id = s.c_id
                 WHERE a.label <> b.label),
        exact AS (SELECT q_id, c_id FROM (
                    SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id
                                              ORDER BY cosine DESC, c_id)
                               AS rank
                    FROM esim) t WHERE rank <= 3),
        proj AS (
            SELECT id, p,
                   CAST(sum(CASE WHEN ('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 1))::INT % 2 = 1
                            THEN x ELSE -x END) AS BIGINT) AS proj
            FROM comp CROSS JOIN planes
            GROUP BY id, p),
        bucket AS (
            SELECT id, p // 8 AS tbl,
                   CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS BIGINT)
                     AS bucket
            FROM proj GROUP BY id, p // 8),
        probes AS (
            SELECT b.id AS q_id, b.tbl,
                   CASE WHEN pp.p = -1 THEN b.bucket
                        ELSE xor(b.bucket, (1::BIGINT << pp.p)) END AS bucket
            FROM bucket b
            CROSS JOIN (SELECT unnest(generate_series(-1, 7)) AS p) pp
            WHERE b.id % 100 = 0),
        cand AS (SELECT DISTINCT p.q_id, c.id AS c_id
                 FROM probes p JOIN bucket c USING (tbl, bucket)
                 WHERE p.q_id <> c.id),
        asim AS (SELECT e.q_id, e.c_id, e.cosine
                 FROM esim e JOIN cand USING (q_id, c_id)),
        approx AS (SELECT q_id, c_id FROM (
                     SELECT q_id, c_id,
                            row_number() OVER (PARTITION BY q_id
                                               ORDER BY cosine DESC, c_id)
                                AS rank
                     FROM asim) t WHERE rank <= 3)
        SELECT CAST(count(DISTINCT e.q_id) AS BIGINT) AS n_anchors,
               CAST(count(*) AS BIGINT) AS exact_pairs,
               CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS hits,
               CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS recall
        FROM exact e
        LEFT JOIN approx a ON a.q_id = e.q_id AND a.c_id = e.c_id
    """,
    "cdc_materialize": """
        WITH log AS (
            SELECT user_id, event_id, ts, event_type,
                   CASE WHEN event_type = 'error' THEN 'delete'
                        ELSE 'upsert' END AS op
            FROM events),
        latest AS (
            SELECT user_id, event_type, ts, op,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM log),
        n_ops AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes,
                   CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_deletes
            FROM log GROUP BY user_id)
        SELECT l.user_id, l.event_type AS last_value, l.ts AS updated_at,
               n.n_changes, n.n_deletes
        FROM latest l JOIN n_ops n ON l.user_id = n.user_id
        WHERE l.rn = 1 AND l.op = 'upsert'
        ORDER BY l.user_id
    """,
    "scd2_asof": """
        WITH runs AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR event_type <> lag(event_type) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        v AS (SELECT *,
                     sum(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS version
              FROM runs),
        hist AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                        min(event_type) AS event_type,
                        min(ts) AS valid_from,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM v GROUP BY user_id, version),
        spans AS (
            SELECT user_id, version, event_type, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY version) AS valid_to,
                   n_events
            FROM hist)
        SELECT user_id, version, event_type, valid_from, valid_to,
               n_events
        FROM spans
        WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          AND (valid_to IS NULL
               OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        ORDER BY user_id
    """,
    "rollup_merge": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS max_cents,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    // count(*) AS BIGINT) AS avg_cents
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "attribution": """
        WITH ev AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS us
            FROM events),
        framed AS (
            SELECT event_id, user_id, event_type, us,
                   min(CASE WHEN event_type IN ('click', 'view')
                            THEN us END) OVER w AS first_touch_us,
                   max(CASE WHEN event_type IN ('click', 'view')
                            THEN us END) OVER w AS last_touch_us,
                   CAST(count(CASE WHEN event_type IN ('click', 'view')
                              THEN us END) OVER w AS BIGINT)
                       AS n_touches
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 604800000000 PRECEDING
                         AND CURRENT ROW))
        SELECT event_id, user_id, us AS conv_us,
               first_touch_us, last_touch_us, n_touches
        FROM framed WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "zonemap_prune": f"""
        WITH pts AS (
            SELECT date_diff('day', DATE '1992-01-01',
                             CAST(l_shipdate AS DATE)) AS x,
                   l_partkey & 4095 AS y
            FROM lineitem),
        lin AS (
            SELECT x // 40 AS bucket, count(*) AS n_rows,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y,
                   sum(CASE WHEN x BETWEEN 1100 AND 3500
                             AND y BETWEEN 256 AND 287
                            THEN 1 ELSE 0 END) AS n_selected
            FROM pts GROUP BY 1),
        zed AS (
            SELECT ({zorder_sql('x', 'y', bits=12)}) >> 18 AS bucket,
                   count(*) AS n_rows,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y,
                   sum(CASE WHEN x BETWEEN 1100 AND 3500
                             AND y BETWEEN 256 AND 287
                            THEN 1 ELSE 0 END) AS n_selected
            FROM pts GROUP BY 1),
        rep AS (
            SELECT 'linear_x' AS layout,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS buckets_pruned,
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN n_rows ELSE 0 END) AS BIGINT)
                       AS rows_skipped,
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN 0 ELSE n_rows END) AS BIGINT)
                       AS rows_scanned,
                   CAST(sum(n_selected) AS BIGINT) AS rows_selected
            FROM lin
            UNION ALL
            SELECT 'zorder',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN n_rows ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN max_x < 1100 OR min_x > 3500
                                  OR max_y < 256 OR min_y > 287
                                 THEN 0 ELSE n_rows END) AS BIGINT),
                   CAST(sum(n_selected) AS BIGINT)
            FROM zed)
        SELECT * FROM rep ORDER BY layout
    """,
    "scd2_history": """
        WITH runs AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR event_type <> lag(event_type) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        v AS (SELECT *,
                     sum(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS version
              FROM runs),
        hist AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                        min(event_type) AS event_type,
                        min(ts) AS valid_from,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM v GROUP BY user_id, version)
        SELECT user_id, version, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY version) AS valid_to,
               n_events,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY version) IS NULL
                 AS is_current
        FROM hist ORDER BY user_id, version
    """,
    "skyline": """
        WITH p AS (SELECT p_partkey AS pid,
                          CAST(round(p_retailprice * 100) AS BIGINT) AS x,
                          -CAST(p_size AS BIGINT) AS y
                   FROM part)
        SELECT pid, x AS cents, -y AS size FROM p q
        WHERE NOT EXISTS (
            SELECT 1 FROM p d
            WHERE d.x <= q.x AND d.y <= q.y
              AND (d.x < q.x OR d.y < q.y))
        ORDER BY cents, size, pid
    """,
}

# block_dedup's two physical shapes are output-identical by contract —
# the fp-rejoin variant is verified against the SAME oracle text, which
# IS the round-8 equality proof at driver level.
ORACLE["block_dedup_fp"] = ORACLE["block_dedup"]


# media_phash's oracle hashes the md5 luma bytes DIRECTLY (no BMP
# container), so a driver match proves the Spark side's
# encode_bmp_gray→decode_bmp leg is the identity on luma. Registered
# below (next to the video leg) on the RELATIONAL pHash spelling —
# _phash_relational_sql — which is pinned bit-identical to the
# multimodal.phash_duckdb_sql lambda chain by the media decode battery.

# media cluster resolution: the media_neardup oracle (nested CTE) feeds
# the same WITH RECURSIVE reach/min-label closure the embedding clusters
# oracle uses; docs with no near-dup pair are their own canonical cluster
ORACLE["media_dedup_clusters"] = f"""
    WITH RECURSIVE np AS ({ORACLE["media_neardup"]}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM np
        UNION
        SELECT id_b AS src, id_a AS dst FROM np),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    minreach AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src)
    SELECT d.doc_id,
           least(d.doc_id, coalesce(mn, d.doc_id)) AS cluster_id,
           d.doc_id = least(d.doc_id, coalesce(mn, d.doc_id))
             AS is_canonical
    FROM documents d LEFT JOIN minreach ON minreach.src = d.doc_id
"""

# the audio twin: energy-delta fingerprint over md5 digests 16..47 (the
# same per-document digest stream media_phash's 0..15 feed), NO container
# leg — the Spark side's WAV encode→decode must be the identity on
# samples for the hash to match. int16 decode: lo + 256*hi − 65536·[hi≥128]
ORACLE["media_audiofp"] = """
    WITH d AS (
      SELECT doc_id,
             list_transform(generate_series(16, 47),
                            i -> md5(coalesce(text, '') || ':' || i))
               AS _digs
      FROM documents),
    s AS (
      SELECT doc_id,
             list_transform(generate_series(0, 255), j ->
               CAST((('0x' || substr(_digs[(j // 8) + 1],
                                     (j % 8) * 4 + 1, 2))::BIGINT
                     + 256 * ('0x' || substr(_digs[(j // 8) + 1],
                                             (j % 8) * 4 + 3, 2))::BIGINT
                     + CASE WHEN ('0x' || substr(_digs[(j // 8) + 1],
                                                 (j % 8) * 4 + 3,
                                                 2))::BIGINT >= 128
                            THEN -65536 ELSE 0 END) AS BIGINT)) AS _smp
      FROM d),
    e AS (
      SELECT doc_id,
             list_transform(generate_series(0, 63), f ->
               CAST(list_sum(list_transform(generate_series(1, 4),
                 i -> _smp[4 * f + i] * _smp[4 * f + i])) AS BIGINT))
               AS _e
      FROM s)
    SELECT doc_id,
           CAST(list_sum(list_transform(generate_series(0, 62), f ->
             CASE WHEN _e[f + 1] > _e[f + 2] THEN (1::BIGINT << f)
                  ELSE 0::BIGINT END)) AS BIGINT) AS audiofp
    FROM e
"""


def _phash_relational_sql(n_frames: int, digest_base: int) -> str:
    """RELATIONAL DuckDB pHash — the vectorized twin of the
    phash_duckdb_sql lambda chain (same hardcoded PHASH_DCT_T integers,
    same lower-median convention, pinned bit-identical by the media
    decode battery). The lambda chain interprets ~16k list-lambda calls
    per row (~100 ms/row measured); this spelling unnests luma to
    (doc, frame, x, y) rows and runs the two DCT matmuls as
    join+group-by over the 128-row DCT table — DuckDB's columnar
    engine executes it ~100× faster, which is what keeps the video
    oracle (4 frames/doc) inside the driver gate's budget. The lower
    median of the 63 AC coefficients is the rn=32 row of a per-frame
    sort — a 63-row bounded partition."""
    from kafka_connect_streams_spark.operators.multimodal import (
        PHASH_DCT_T)
    tvals = ", ".join(f"({u}, {x}, {t})" for u, row in enumerate(PHASH_DCT_T)
                      for x, t in enumerate(row))
    frame_sel = ", frame_idx" if n_frames > 1 else ""
    return f"""
    WITH dt(u, x, t) AS (SELECT * FROM (VALUES {tvals})),
    dig AS (
      SELECT doc_id, CAST(fr.frame_idx AS BIGINT) AS frame_idx, i.i AS i,
             md5(coalesce(text, '') || ':' ||
                 ({digest_base} + 16 * fr.frame_idx + i.i)) AS dg
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, {n_frames - 1}))
                  AS frame_idx) fr
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) i),
    lum AS (
      SELECT doc_id, frame_idx, i AS x, b.b AS y,
             ('0x' || substr(dg, b.b * 2 + 1, 2))::BIGINT AS lv
      FROM dig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b),
    m AS (
      SELECT doc_id, frame_idx, dt.u, lum.y, sum(dt.t * lum.lv) AS mv
      FROM lum JOIN dt ON dt.x = lum.x
      GROUP BY doc_id, frame_idx, dt.u, lum.y),
    d AS (
      SELECT doc_id, frame_idx, m.u, dt.u AS v, sum(m.mv * dt.t) AS dv
      FROM m JOIN dt ON dt.x = m.y
      GROUP BY doc_id, frame_idx, m.u, dt.u),
    ac AS (
      SELECT doc_id, frame_idx, CAST(u * 8 + v - 1 AS BIGINT) AS i,
             CAST(dv AS BIGINT) AS dv,
             row_number() OVER (PARTITION BY doc_id, frame_idx
                                ORDER BY dv, u, v) AS rn
      FROM d WHERE NOT (u = 0 AND v = 0)),
    med AS (SELECT doc_id, frame_idx, dv AS md FROM ac WHERE rn = 32)
    SELECT ac.doc_id{frame_sel},
           CAST(coalesce(sum(CASE WHEN ac.dv > med.md
                                  THEN (1::BIGINT << ac.i) END), 0)
                AS BIGINT) AS phash
    FROM ac JOIN med USING (doc_id, frame_idx)
    GROUP BY ac.doc_id, frame_idx
    """


#: the image leg re-registered on the relational spelling (same values,
#: driver-gate cost ~100× lower); the lambda-chain spelling stays pinned
#: bit-identical in tests/test_media_decode.py so the two forms can
#: never drift
ORACLE["media_phash"] = _phash_relational_sql(1, 0)

ORACLE["media_videofp"] = _phash_relational_sql(4, 48)


def _phash_robustness_sql(qs: tuple[int, ...] = (2, 8, 32)) -> str:
    """RELATIONAL DuckDB twin of queries.q_phash_robustness — the
    _phash_relational_sql spelling with the frame dimension replaced by
    a quantization-severity dimension: luma value lv becomes
    ``(lv // q) * q`` per severity (q = 1 is the untouched baseline,
    since floor-div-then-multiply by 1 is the identity), one pHash per
    (doc, q) via the same join+group-by DCT, then per-severity Hamming
    vs the q = 1 hash and the bounded aggregate report. NO container
    leg anywhere — the Spark side routes every quantized grid through
    encode_bmp_gray→decode_bmp, so the driver hash match proves that
    round trip is the identity on quantized luma at every severity, on
    top of the DCT arithmetic (the media_phash gate's trick, extended
    to perturbed inputs)."""
    from kafka_connect_streams_spark.operators.multimodal import (
        PHASH_DCT_T)
    tvals = ", ".join(f"({u}, {x}, {t})" for u, row in enumerate(PHASH_DCT_T)
                      for x, t in enumerate(row))
    qvals = ", ".join(f"({q})" for q in (1,) + tuple(qs))
    return f"""
    WITH dt(u, x, t) AS (SELECT * FROM (VALUES {tvals})),
    qv(q) AS (SELECT * FROM (VALUES {qvals})),
    dig AS (
      SELECT doc_id, i.i AS i,
             md5(coalesce(text, '') || ':' || i.i) AS dg
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) i),
    lum AS (
      SELECT doc_id, qv.q, i AS x, b.b AS y,
             (('0x' || substr(dg, b.b * 2 + 1, 2))::BIGINT // qv.q)
               * qv.q AS lv
      FROM dig
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
      CROSS JOIN qv),
    m AS (
      SELECT doc_id, q, dt.u, lum.y, sum(dt.t * lum.lv) AS mv
      FROM lum JOIN dt ON dt.x = lum.x
      GROUP BY doc_id, q, dt.u, lum.y),
    d AS (
      SELECT doc_id, q, m.u, dt.u AS v, sum(m.mv * dt.t) AS dv
      FROM m JOIN dt ON dt.x = m.y
      GROUP BY doc_id, q, m.u, dt.u),
    ac AS (
      SELECT doc_id, q, CAST(u * 8 + v - 1 AS BIGINT) AS i,
             CAST(dv AS BIGINT) AS dv,
             row_number() OVER (PARTITION BY doc_id, q
                                ORDER BY dv, u, v) AS rn
      FROM d WHERE NOT (u = 0 AND v = 0)),
    med AS (SELECT doc_id, q, dv AS md FROM ac WHERE rn = 32),
    ph AS (
      SELECT ac.doc_id, ac.q,
             CAST(coalesce(sum(CASE WHEN ac.dv > med.md
                                    THEN (1::BIGINT << ac.i) END), 0)
                  AS BIGINT) AS phash
      FROM ac JOIN med USING (doc_id, q)
      GROUP BY ac.doc_id, ac.q),
    hm AS (
      SELECT p.q, CAST(bit_count(xor(b.phash, p.phash)) AS BIGINT)
               AS hamming
      FROM ph b JOIN ph p ON b.doc_id = p.doc_id
      WHERE b.q = 1 AND p.q <> 1)
    SELECT CAST(q AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(hamming) AS BIGINT) AS sum_hamming,
           CAST(max(hamming) AS BIGINT) AS max_hamming,
           CAST(sum(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_fp,
           CAST(sum(CASE WHEN hamming <= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_video
    FROM hm GROUP BY q ORDER BY q
    """


ORACLE["phash_robustness"] = _phash_robustness_sql((2, 8, 32))


def _audiofp_robustness_sql(qs: tuple[int, ...] = (4, 64, 1024)) -> str:
    """DuckDB twin of queries.q_audiofp_robustness — the media_audiofp
    chain with a requantization-severity dimension: every decoded int16
    sample becomes ``((s + 32768) // q) * q − 32768`` (q = 1 is the
    untouched baseline; the dividend is nonnegative so floor == truncate
    in every engine), one fingerprint per (doc, q), per-severity Hamming
    vs q = 1, then the bounded aggregate report. NO container leg —
    the Spark side routes every quantized waveform through
    encode_wav_pcm16→decode_wav, so the driver hash match proves that
    round trip is the identity on requantized samples at every
    severity. The fingerprint table is MATERIALIZED: the baseline/
    severity self-join would otherwise re-run the whole md5→sample→
    energy chain per reference (the r13 CTE-inlining gotcha)."""
    qvals = ", ".join(f"({q})" for q in (1,) + tuple(qs))
    return f"""
    WITH qv(q) AS (SELECT * FROM (VALUES {qvals})),
    d AS (
      SELECT doc_id,
             list_transform(generate_series(16, 47),
                            i -> md5(coalesce(text, '') || ':' || i))
               AS _digs
      FROM documents),
    s AS (
      SELECT doc_id,
             list_transform(generate_series(0, 255), j ->
               CAST((('0x' || substr(_digs[(j // 8) + 1],
                                     (j % 8) * 4 + 1, 2))::BIGINT
                     + 256 * ('0x' || substr(_digs[(j // 8) + 1],
                                             (j % 8) * 4 + 3, 2))::BIGINT
                     + CASE WHEN ('0x' || substr(_digs[(j // 8) + 1],
                                                 (j % 8) * 4 + 3,
                                                 2))::BIGINT >= 128
                            THEN -65536 ELSE 0 END) AS BIGINT)) AS _smp
      FROM d),
    sq AS (
      SELECT doc_id, qv.q,
             list_transform(_smp, v ->
               ((v + 32768) // qv.q) * qv.q - 32768) AS _smp
      FROM s CROSS JOIN qv),
    e AS (
      SELECT doc_id, q,
             list_transform(generate_series(0, 63), f ->
               CAST(list_sum(list_transform(generate_series(1, 4),
                 i -> _smp[4 * f + i] * _smp[4 * f + i])) AS BIGINT))
               AS _e
      FROM sq),
    fp AS MATERIALIZED (
      SELECT doc_id, q,
             CAST(list_sum(list_transform(generate_series(0, 62), f ->
               CASE WHEN _e[f + 1] > _e[f + 2] THEN (1::BIGINT << f)
                    ELSE 0::BIGINT END)) AS BIGINT) AS audiofp
      FROM e),
    hm AS (
      SELECT p.q, CAST(bit_count(xor(b.audiofp, p.audiofp)) AS BIGINT)
               AS hamming
      FROM fp b JOIN fp p ON b.doc_id = p.doc_id
      WHERE b.q = 1 AND p.q <> 1)
    SELECT CAST(q AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(hamming) AS BIGINT) AS sum_hamming,
           CAST(max(hamming) AS BIGINT) AS max_hamming,
           CAST(sum(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_fp,
           CAST(sum(CASE WHEN hamming = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_matches
    FROM hm GROUP BY q ORDER BY q
    """


ORACLE["audiofp_robustness"] = _audiofp_robustness_sql((4, 64, 1024))


def _pii_enrich_sql() -> str:
    """DuckDB twin of operators/pii.attach_contacts — the deterministic
    contact synthesizer as one SELECT (byte i of md5 is
    ``('0x' || substr(h, 2i+1, 2))::BIGINT``, the repo's standard
    spelling). Pinned byte-for-byte against the Spark column expression
    by tests/test_pii.py."""
    def b(i: int) -> str:
        return f"('0x' || substr(h, {2 * i + 1}, 2))::BIGINT"
    return f"""
      SELECT doc_id,
             t
             || CASE WHEN {b(0)} % 3 = 0
                     THEN ' Contact user' || ({b(1)} % 100)::VARCHAR
                          || '@example' || ({b(2)} % 10)::VARCHAR
                          || '.com'
                     ELSE '' END
             || CASE WHEN {b(3)} % 3 = 0
                     THEN ' Call 555-'
                          || lpad(({b(4)} % 1000)::VARCHAR, 3, '0')
                          || '-'
                          || lpad((({b(5)} * 256 + {b(6)}) % 10000)
                                  ::VARCHAR, 4, '0')
                     ELSE '' END
             || CASE WHEN {b(7)} % 3 = 0
                     THEN ' Host 10.' || ({b(8)})::VARCHAR
                          || '.' || ({b(9)})::VARCHAR
                          || '.' || ({b(10)})::VARCHAR
                     ELSE '' END AS text
      FROM (SELECT doc_id, coalesce(text, '') AS t,
                   md5(coalesce(text, '')) AS h
            FROM documents)
    """


def _pii_report_sql() -> str:
    from kafka_connect_streams_spark.operators.pii import PII_PATTERNS
    em, ip, ph = (PII_PATTERNS["email"], PII_PATTERNS["ipv4"],
                  PII_PATTERNS["phone"])
    return f"""
    WITH enr AS ({_pii_enrich_sql()}),
    c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{em}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT)
               AS n_ipv4,
             CAST(len(regexp_extract_all(text, '{ph}')) AS BIGINT)
               AS n_phone
      FROM enr)
    SELECT doc_id, n_email, n_ipv4, n_phone,
           (n_email + n_ipv4 + n_phone) > 0 AS has_pii
    FROM c ORDER BY doc_id
    """


def _pii_mask_sql() -> str:
    from kafka_connect_streams_spark.operators.pii import PII_PATTERNS
    em, ip, ph = (PII_PATTERNS["email"], PII_PATTERNS["ipv4"],
                  PII_PATTERNS["phone"])
    return f"""
    WITH enr AS ({_pii_enrich_sql()}),
    m AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{em}', '[EMAIL]', 'g'),
                 '{ip}', '[IPV4]', 'g'),
               '{ph}', '[PHONE]', 'g') AS masked
      FROM enr)
    SELECT doc_id, masked,
           CAST(len(regexp_extract_all(masked, '{em}'))
                + len(regexp_extract_all(masked, '{ip}'))
                + len(regexp_extract_all(masked, '{ph}'))
                AS BIGINT) AS residual
    FROM m ORDER BY doc_id
    """


ORACLE["pii_report"] = _pii_report_sql()
ORACLE["pii_mask"] = _pii_mask_sql()


def _oph_sql(k: int = 16, bands: int = 4, rows: int = 4,
             threshold: str = "0.25") -> str:
    """DuckDB twin of dedup.oph_lsh_dedup — the classic minhash oracle's
    shingle chain, then: residue-bin conditional mins (one per slot),
    the k²-term rotation-densification coalesce with the SAME
    OPH_DENSE_C integer offsets, wide banding (md5 over the
    comma-joined slot slice — the _banded_wide spelling), bucket
    self-join, in-row slot-agreement estimate."""
    from kafka_connect_streams_spark.operators.dedup import OPH_DENSE_C
    mins = ",\n                   ".join(
        f"min(CASE WHEN h0 % {k} = {j} THEN h0 END) AS s{j}"
        for j in range(k))
    dense = ",\n                   ".join(
        "coalesce(" + ", ".join(
            f"s{(j + d) % k} + {d * OPH_DENSE_C}" for d in range(k))
        + f") AS d{j}" for j in range(k))
    band_legs = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || ',' || ".join(f"d{b * rows + r}::VARCHAR"
                             for r in range(rows))
        + ") AS band_key FROM dn" for b in range(bands))
    agree = " + ".join(
        f"CASE WHEN a.d{j} = b.d{j} THEN 1 ELSE 0 END" for j in range(k))
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')), '\\W+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(0, greatest(len(toks) - 3, 0)),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
                FROM toks) u
            WHERE length(shingle) > 0),
        sh2 AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT % 2147483647 AS h0
            FROM sh),
        sp AS (
            SELECT doc_id,
                   {mins}
            FROM sh2 GROUP BY doc_id),
        dn AS MATERIALIZED (
            SELECT doc_id,
                   {dense}
            FROM sp),
        banded AS (
            {band_legs}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
            WHERE a.doc_id < b.doc_id)
        SELECT p.id_a, p.id_b, ({agree}) / {k}.0 AS est_jaccard
        FROM pairs p
        JOIN dn a ON a.doc_id = p.id_a
        JOIN dn b ON b.doc_id = p.id_b
        WHERE ({agree}) / {k}.0 >= {threshold}
    """


#: the layout oracles' shared point set — the zorder_layout spelling
_LAYOUT_PTS_SQL = """
        SELECT date_diff('day', DATE '1992-01-01',
                         CAST(l_shipdate AS DATE)) AS x,
               l_partkey & 4095 AS y
        FROM lineitem"""


def _hilbert_keyed_sql(bits: int = 12) -> str:
    """The unrolled Hilbert walk as a nested-SELECT chain over a
    relation named ``pts(x, y)`` — generated from the SAME
    _hilbert_rounds loop the Spark projections and hilbert_py unroll,
    so the three spellings cannot drift. Each round is one projection
    level (hx/hy/hd rebound simultaneously from the inner level, the
    withColumns semantics); a single flat expression would grow ~3^12
    nodes."""
    from kafka_connect_streams_spark.operators.layout import (
        _hilbert_rounds)
    n = 1 << bits
    q = ("SELECT x, y, CAST(x AS BIGINT) AS hx, CAST(y AS BIGINT) AS hy,"
         " CAST(0 AS BIGINT) AS hd FROM pts")
    for s in _hilbert_rounds(bits):
        b = s.bit_length() - 1
        rx = f"((hx >> {b}) & 1)"
        ry = f"((hy >> {b}) & 1)"
        nd = f"hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
        nx = (f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 "
              f"THEN {n - 1} - hy ELSE hy END")
        ny = (f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 "
              f"THEN {n - 1} - hx ELSE hx END")
        q = (f"SELECT x, y, {nx} AS hx, {ny} AS hy, {nd} AS hd "
             f"FROM ({q})")
    return q


def _hilbert_layout_sql() -> str:
    return f"""
        WITH pts AS ({_LAYOUT_PTS_SQL})
        SELECT hd >> 18 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y,
               CAST(max(y) AS BIGINT) AS max_y
        FROM ({_hilbert_keyed_sql(12)})
        GROUP BY bucket ORDER BY bucket"""


ORACLE["hilbert_layout"] = _hilbert_layout_sql()


def _layout_prune_ab_sql() -> str:
    """The A/B twin: equal-frequency file assignment is the global
    ``row_number() OVER (ORDER BY key, x, y)`` — the semantic contract
    layout_file_spans' two-pass ranking equals exactly (the
    global_index oracle precedent)."""
    from kafka_connect_streams_spark.operators.layout import zorder_sql
    rects = ", ".join(
        f"({qx * 1024}, {qx * 1024 + 1023}, {qy * 1024}, "
        f"{qy * 1024 + 1023})"
        for qx in range(4) for qy in range(4))
    zkey = zorder_sql("x", "y", 12)
    return f"""
    WITH pts AS ({_LAYOUT_PTS_SQL}),
    zf AS (
        SELECT x, y, (row_number() OVER (ORDER BY ({zkey}), x, y) - 1)
                     * 64 // count(*) OVER () AS f
        FROM pts),
    hf AS (
        SELECT x, y, (row_number() OVER (ORDER BY hd, x, y) - 1)
                     * 64 // count(*) OVER () AS f
        FROM ({_hilbert_keyed_sql(12)})),
    z AS (
        SELECT f, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM zf GROUP BY f),
    h AS (
        SELECT f, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM hf GROUP BY f),
    stats AS (
        SELECT 'zorder' AS layout, * FROM z
        UNION ALL SELECT 'hilbert' AS layout, * FROM h),
    rects(qx0, qx1, qy0, qy1) AS (SELECT * FROM (VALUES {rects}))
    SELECT layout,
           CAST(count(DISTINCT f) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN min_x <= qx1 AND max_x >= qx0
                          AND min_y <= qy1 AND max_y >= qy0
                         THEN 1 ELSE 0 END) AS BIGINT) AS touched_pairs,
           CAST(count(*) AS BIGINT) AS total_pairs
    FROM stats CROSS JOIN rects
    GROUP BY layout ORDER BY layout
    """


ORACLE["layout_prune_ab"] = _layout_prune_ab_sql()

ORACLE["dedup_oph"] = _oph_sql(16, 4, 4, "0.25")

ORACLE["oph_recall"] = f"""
    WITH c AS ({ORACLE["dedup_minhash_lsh"]}),
    o AS ({_oph_sql(16, 4, 4, "0.25")}),
    j AS (
      SELECT coalesce(c.id_a, o.id_a) AS id_a,
             (c.id_a IS NOT NULL) AS in_c, (o.id_a IS NOT NULL) AS in_o
      FROM c FULL JOIN o ON c.id_a = o.id_a AND c.id_b = o.id_b)
    SELECT CAST(sum(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_minhash,
           CAST(sum(CASE WHEN in_o THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oph,
           CAST(sum(CASE WHEN in_c AND in_o THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common
    FROM j
"""


def _dp_sql(eps_e3: int = 1000, bound: int = 16,
            seed: str = "dp-seed") -> tuple[str, str]:
    """DuckDB twins of q_dp_counts / q_dp_utility: the SAME integer
    inverse-CDF thresholds (dp_noise_cdf runs once; both engines get
    the literals), the same md5-keyed 48-bit uniform, the same
    zero-clamp. Returns (counts CTE prelude, noise CASE expression) —
    the two oracles below compose them."""
    from kafka_connect_streams_spark.operators.aggregations import (
        dp_noise_cdf)
    cum = dp_noise_cdf(eps_e3, bound)
    case = ("CASE " + " ".join(
        f"WHEN u < {cum[i]} THEN {i - bound}"
        for i in range(len(cum) - 1)) + f" ELSE {bound} END")
    prelude = f"""
    WITH cnt AS (
      SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey),
    u AS (
      SELECT *,
             ('0x' || substr(md5('{seed}' || ':'
                 || coalesce(c_mktsegment::VARCHAR, '') || ':'
                 || coalesce(c_nationkey::VARCHAR, '')), 1, 12))::BIGINT
               AS u
      FROM cnt)
    """
    return prelude, case


_DP_PRELUDE, _DP_CASE = _dp_sql(1000, 16)

ORACLE["dp_counts"] = f"""
    {_DP_PRELUDE}
    SELECT c_mktsegment, c_nationkey,
           CAST(greatest(0, n + {_DP_CASE}) AS BIGINT) AS released
    FROM u ORDER BY c_mktsegment, c_nationkey
"""

ORACLE["dp_utility"] = f"""
    {_DP_PRELUDE},
    rel AS (
      SELECT n, CAST(greatest(0, n + {_DP_CASE}) AS BIGINT) AS released
      FROM u)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(abs(released - n)) AS BIGINT) AS sum_abs_err,
           CAST(max(abs(released - n)) AS BIGINT) AS max_abs_err,
           CAST(sum(CASE WHEN released = n THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact
    FROM rel
"""

# k-anonymity: the same two-level local recoding in SQL — full-QI
# counts, the < k remainder re-counted on the coarse QI, the rest a
# single suppressed group
ORACLE["k_anonymize"] = """
    WITH base AS (
      SELECT c_custkey,
             CAST(c_mktsegment AS VARCHAR) AS c_mktsegment,
             CAST(c_nationkey AS VARCHAR) AS c_nationkey,
             CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)
               AS bal_bucket
      FROM customer),
    g0 AS (SELECT c_mktsegment, c_nationkey, bal_bucket,
                  count(*) AS n0
           FROM base GROUP BY 1, 2, 3),
    j0 AS (SELECT b.*, g0.n0 FROM base b
           JOIN g0 ON b.c_mktsegment IS NOT DISTINCT FROM g0.c_mktsegment
                  AND b.c_nationkey IS NOT DISTINCT FROM g0.c_nationkey
                  AND b.bal_bucket IS NOT DISTINCT FROM g0.bal_bucket),
    lvl0 AS (SELECT c_custkey, c_mktsegment, c_nationkey, bal_bucket,
                    CAST(0 AS BIGINT) AS anon_level,
                    CAST(n0 AS BIGINT) AS group_size
             FROM j0 WHERE n0 >= 5),
    rest AS (SELECT c_custkey, c_mktsegment FROM j0 WHERE n0 < 5),
    g1 AS (SELECT c_mktsegment, count(*) AS n1 FROM rest GROUP BY 1),
    j1 AS (SELECT r.*, g1.n1 FROM rest r
           JOIN g1 ON r.c_mktsegment IS NOT DISTINCT FROM g1.c_mktsegment),
    lvl1 AS (SELECT c_custkey, c_mktsegment,
                    '*' AS c_nationkey, '*' AS bal_bucket,
                    CAST(1 AS BIGINT) AS anon_level,
                    CAST(n1 AS BIGINT) AS group_size
             FROM j1 WHERE n1 >= 5),
    rest2 AS (SELECT c_custkey FROM j1 WHERE n1 < 5),
    n2 AS (SELECT count(*) AS gs FROM rest2)
    SELECT * FROM lvl0
    UNION ALL SELECT * FROM lvl1
    UNION ALL
    SELECT c_custkey, '*' AS c_mktsegment, '*' AS c_nationkey,
           '*' AS bal_bucket, CAST(2 AS BIGINT) AS anon_level,
           CAST(gs AS BIGINT) AS group_size
    FROM rest2 CROSS JOIN n2
"""

# l-diversity: the k-anonymity release (nested, MATERIALIZED — two
# consumers below) joined back on the row id, distinct sensitive values
# per released group
ORACLE["l_diversity"] = f"""
    WITH rel AS MATERIALIZED ({ORACLE["k_anonymize"]}),
    j AS (SELECT rel.anon_level, rel.c_mktsegment, rel.c_nationkey,
                 rel.bal_bucket, c.c_acctbal
          FROM rel JOIN customer c USING (c_custkey))
    SELECT anon_level, c_mktsegment, c_nationkey, bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sensitive,
           count(DISTINCT c_acctbal) >= 3 AS l_diverse
    FROM j GROUP BY 1, 2, 3, 4
"""

# scene cuts: lag window over the frame pHash table; the first frame of
# each video has no predecessor (NULL ham_prev, never a cut)
ORACLE["video_scene_cuts"] = f"""
    WITH fr AS ({ORACLE["media_videofp"]}),
    d AS (SELECT doc_id, frame_idx, phash,
                 lag(phash) OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) AS pf
          FROM fr)
    SELECT doc_id, frame_idx, phash,
           CAST(bit_count(xor(phash, pf)) AS BIGINT) AS ham_prev,
           coalesce(bit_count(xor(phash, pf)) >= 16, false) AS is_cut
    FROM d
"""

# video near-dup: the frame pHash table (the media_videofp oracle)
# under the synthetic doc*64+frame id, the SAME 3×21-bit banding +
# hot-bucket cap + exact bit_count verify the Spark side rides via
# fingerprint_neardup, collapsed to doc pairs voting >= 2 frame matches
ORACLE["video_neardup"] = f"""
    WITH fr AS MATERIALIZED ({ORACLE["media_videofp"]}),
    fid AS (SELECT doc_id, phash, doc_id * 64 + frame_idx AS fid
            FROM fr),
    banded AS (
        SELECT f.fid, f.doc_id, f.phash, b.band,
               (f.phash >> (b.band * 21)) & 2097151 AS band_key
        FROM fid f CROSS JOIN
             (SELECT unnest(generate_series(0, 2)) AS band) b),
    ok AS (SELECT band, band_key FROM banded
           GROUP BY band, band_key HAVING count(*) <= 50),
    kept AS (SELECT banded.* FROM banded JOIN ok USING (band, band_key)),
    pairs AS (
        SELECT DISTINCT a.fid AS fa_id, b.fid AS fb_id,
               a.doc_id AS da, b.doc_id AS db,
               a.phash AS fa, b.phash AS fb
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.fid < b.fid),
    m AS (SELECT da AS id_a, db AS id_b FROM pairs
          WHERE da <> db AND bit_count(xor(fa, fb)) <= 2)
    SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_matched
    FROM m GROUP BY id_a, id_b HAVING count(*) >= 2
"""

# t-closeness: the k-anonymity release (MATERIALIZED — the cells CTE
# is consumed by the group totals AND the zero-filled spine join),
# per-group sensitive distribution vs the corpus distribution as an
# exact e9 L1; all QI/sensitive joins IS NOT DISTINCT FROM
ORACLE["t_closeness"] = f"""
    WITH rel AS MATERIALIZED ({ORACLE["k_anonymize"]}),
    sv_tbl AS (SELECT c_custkey,
                      ((CAST(round(c_acctbal * 100) AS BIGINT) % 10)
                       + 10) % 10 AS sv
               FROM customer),
    j AS (SELECT rel.anon_level, rel.c_mktsegment, rel.c_nationkey,
                 rel.bal_bucket, b.sv
          FROM rel JOIN sv_tbl b USING (c_custkey)),
    cells AS MATERIALIZED (
      SELECT anon_level, c_mktsegment, c_nationkey, bal_bucket, sv,
             CAST(count(*) AS BIGINT) AS n_gs
      FROM j GROUP BY 1, 2, 3, 4, 5),
    grp AS (SELECT anon_level, c_mktsegment, c_nationkey, bal_bucket,
                   CAST(sum(n_gs) AS BIGINT) AS n_g
            FROM cells GROUP BY 1, 2, 3, 4),
    corpus AS (SELECT sv, CAST(count(*) AS BIGINT) AS n_s
               FROM sv_tbl GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM sv_tbl),
    zf AS (
      SELECT s.anon_level, s.c_mktsegment, s.c_nationkey, s.bal_bucket,
             s.n_g, s.n_s, s.n_tot, coalesce(cl.n_gs, 0) AS n_gs
      FROM (SELECT g.*, c.sv, c.n_s, t.n_tot
            FROM grp g CROSS JOIN corpus c CROSS JOIN tot t) s
      LEFT JOIN cells cl
        ON s.anon_level = cl.anon_level
       AND s.c_mktsegment IS NOT DISTINCT FROM cl.c_mktsegment
       AND s.c_nationkey IS NOT DISTINCT FROM cl.c_nationkey
       AND s.bal_bucket IS NOT DISTINCT FROM cl.bal_bucket
       AND s.sv IS NOT DISTINCT FROM cl.sv)
    SELECT anon_level, c_mktsegment, c_nationkey, bal_bucket,
           n_g AS group_size,
           CAST(sum(abs(n_gs * 1000000000 // n_g
                        - n_s * 1000000000 // n_tot)) AS BIGINT)
             AS l1_e9,
           CAST(sum(abs(n_gs * 1000000000 // n_g
                        - n_s * 1000000000 // n_tot)) AS BIGINT)
             <= 400000000 AS t_close
    FROM zf GROUP BY 1, 2, 3, 4, 5
"""

# trained langid: char-trigram buckets, per-language e9 rates learned
# from the corpus's own lang labels, argmax as max-score + min-language
# (the deterministic tie-break spelling both engines share). The gram
# table is MATERIALIZED — two consumers (doc counts and the model)
_LANGID_BASE = """
    g AS MATERIALIZED (
      SELECT doc_id, lang,
             ('0x' || substr(md5(gram), 1, 12))::BIGINT % 1024 AS bucket
      FROM (SELECT doc_id, lang,
                   unnest(CASE WHEN length(lower(coalesce(text, ''))) >= 3
                          THEN list_transform(
                              generate_series(
                                  1, length(lower(coalesce(text, ''))) - 2),
                              i -> substr(lower(coalesce(text, '')), i, 3))
                          ELSE [] END) AS gram
            FROM documents) u),
    db AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM g GROUP BY 1, 2),
    bl AS (SELECT bucket, lang AS cand, CAST(count(*) AS BIGINT) AS n_bl
           FROM g GROUP BY 1, 2),
    lt AS (SELECT cand, CAST(sum(n_bl) AS BIGINT) AS n_l FROM bl
           GROUP BY 1),
    rates AS (SELECT bucket, cand,
                     CAST(n_bl * 1000000000 // n_l AS BIGINT) AS rate_e9
              FROM bl JOIN lt USING (cand)),
    sc AS (SELECT db.doc_id, r.cand,
                  CAST(sum(db.cnt * r.rate_e9) AS BIGINT) AS score
           FROM db JOIN rates r USING (bucket) GROUP BY 1, 2),
    mx AS (SELECT doc_id, max(score) AS m FROM sc GROUP BY 1),
    pred AS (SELECT sc.doc_id, min(sc.cand) AS p, max(mx.m) AS best
             FROM sc JOIN mx ON sc.doc_id = mx.doc_id
                            AND sc.score = mx.m
             GROUP BY 1),
    out AS (
      SELECT d.doc_id, d.lang,
             coalesce(p.p, '??') AS pred_lang,
             CAST(coalesce(p.best, 0) AS BIGINT) AS score_e9
      FROM documents d LEFT JOIN pred p USING (doc_id))
"""

ORACLE["langid"] = f"""
    WITH {_LANGID_BASE}
    SELECT doc_id, lang, pred_lang, score_e9 FROM out
"""

ORACLE["langid_confusion"] = f"""
    WITH {_LANGID_BASE}
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           lang = pred_lang AS is_correct
    FROM out GROUP BY 1, 2
"""
