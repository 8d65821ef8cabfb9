"""Physical-layout and dominance operators: Z-order clustering keys and
a distributive Pareto-front (skyline).

``zorder_key`` is the data-layout half of the 100 TB story: min-max
pruning on parquet/Delta files only works if rows that are close in the
filter dimensions land in the same files. Interleaving the bits of two
bounded dimensions (Morton '66; the same trick behind Delta Lake's
OPTIMIZE ZORDER BY) gives a single sort key whose ranges are small
hyper-rectangles in both dimensions at once — the per-bucket min/max
spans it produces ARE the file-skipping statistics a scan would prune
with. Pure bit arithmetic (shift/and/or), so codegen-friendly in Spark
and bit-identical in any SQL oracle.

``skyline`` (Börzsönyi, Kossmann & Stocker, ICDE'01) returns the
maximal vectors under Pareto dominance. The naive form is a quadratic
NOT EXISTS self-join; the distributive form used here exploits that the
global skyline is a subset of the union of per-partition skylines:

  pass 1 — a streaming Arrow scan emits each record batch's skyline
  with ZERO wide exchange (the corpus is touched once, no global sort,
  no partition-sized buffering);
  pass 2 — the candidate union (≈ batches × skyline size, tiny) is
  broadcast and the exact dominance filter runs candidates-vs-candidates.

The result is the exact skyline regardless of partitioning, so a plain
NOT EXISTS oracle checks it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1),
                                 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The same interleave as ANSI SQL text, for oracle twins."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout_stats(df: DataFrame, x: Column, y: Column,
                        bits: int = 16, bucket_shift: int = 26) -> DataFrame:
    """Assign each row to a Z-order bucket (zkey's top bits) and report
    the per-bucket min-max spans of BOTH dimensions — the file-skipping
    stats a z-ordered write would give a scan. One groupBy over ≤
    2^(2·bits − bucket_shift) bucket keys; map-side combine makes the
    shuffle independent of row count."""
    z = zorder_key(x, y, bits)
    return (df.select(x.alias("x"), y.alias("y"),
                      F.shiftright(z, bucket_shift).alias("bucket"))
              .groupBy("bucket")
              .agg(F.count("*").alias("n_rows"),
                   F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                   F.min("y").alias("min_y"), F.max("y").alias("max_y"))
              .orderBy("bucket"))


def skyline2d(df: DataFrame, x_col: str, y_col: str,
              id_col: str) -> DataFrame:
    """Exact 2-D Pareto front, both dimensions minimized.

    Dominance: p ≤ q on both dims with < on at least one. Points that
    tie on both dims are mutually non-dominating and all kept. ``x``
    must be integer-typed (cents, days, …) so the cross-engine compare
    has no float ulps.
    """
    pts = df.select(F.col(id_col).alias("pid"),
                    F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def batch_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-BATCH skyline is enough: the exact pass-2 filter only
        # needs candidates ⊇ global skyline (dominance is transitive,
        # so anything a batch prunes is dominated by a surviving
        # candidate). That keeps pass 1 a true streaming scan — no
        # partition-sized buffering, no sort, no shuffle.
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["x", "y"], ignore_index=True)
            same_x_min = pdf.groupby("x")["y"].transform("min")
            # min y over strictly-smaller x: cummin over per-x minima,
            # shifted one unique-x back (groupby output is x-ascending)
            cheaper = pdf.groupby("x")["y"].min().cummin().shift()
            cheaper_y = pdf["x"].map(cheaper)
            keep = ((cheaper_y.isna() | (pdf["y"] < cheaper_y))
                    & (pdf["y"] == same_x_min))
            yield pdf[keep]

    local = pts.mapInPandas(batch_skyline, "pid long, x long, y long")
    cand = F.broadcast(local.select(F.col("x").alias("cx"),
                                    F.col("y").alias("cy")).distinct())
    dominated = ((F.col("cx") <= F.col("x")) & (F.col("cy") <= F.col("y"))
                 & ((F.col("cx") < F.col("x")) | (F.col("cy") < F.col("y"))))
    return (local.join(cand, dominated, "left_anti")
                 .select("pid", "x", "y")
                 .orderBy("x", "y", "pid"))


def global_index(df: DataFrame, id_col: str, buckets: int = 64) -> DataFrame:
    """Contiguous global sample indices 0..N-1 in a deterministic
    pseudo-random order — the "assign every training example a slot"
    pass — WITHOUT a single-partition sort.

    The naive ``row_number() OVER (ORDER BY hash)`` plans a global sort
    whose final rank stage is ONE partition — the canonical 100 TB
    anti-pattern. This is the textbook two-pass distributed ranking
    instead (TeraSort's rank assignment): (1) key each row by an md5
    prefix bucket — the permutation's coarse order — and rank within
    each bucket: ``buckets`` parallel sorts of ~N/buckets rows; (2)
    prefix-sum the O(buckets) bucket counts into start offsets on a
    bucket-count aggregate (a window over ``buckets`` rows, not N),
    broadcast them, and add. The result equals
    ``row_number() OVER (ORDER BY bucket, h, id) - 1`` exactly — which
    is the DuckDB oracle — while every corpus-sized stage stays
    bucket-parallel. Deterministic under repartitioning, retries, and
    engine choice: the order is a pure function of the ids (same md5
    permutation family as training_order, queries.py q_training_order).
    """
    h = F.md5(F.col(id_col).cast("string"))
    keyed = df.select(F.col(id_col), h.alias("_h"),
                      (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
                       % buckets).alias("_b"))
    wb = Window.partitionBy("_b").orderBy("_h", id_col)
    ranked = keyed.withColumn("_pos", F.row_number().over(wb))
    # offsets: exclusive prefix sum over the bucket counts — `buckets`
    # rows total, so the single-partition window here is O(buckets)
    wo = (Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (keyed.groupBy("_b")
               .agg(F.count("*").alias("_n"))
               .withColumn("_off", F.coalesce(F.sum("_n").over(wo),
                                              F.lit(0).cast("bigint"))))
    return (ranked.join(F.broadcast(offsets.select("_b", "_off")), "_b")
            .select(F.col(id_col),
                    F.col("_b").alias("bucket"),
                    (F.col("_off") + F.col("_pos") - 1)
                    .alias("global_idx")))


def grouped_exact_quantiles(df: DataFrame, group_col: str, value_col: str,
                            pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
                            bucket_width: int = 64) -> DataFrame:
    """EXACT per-group percentiles — ``percentile_disc`` semantics, the
    element at rank ``ceil(pct·N/100)`` — without ever sorting the
    corpus.

    The naive form (what the DuckDB oracle runs) is a full window sort
    per group: ``row_number() OVER (PARTITION BY grp ORDER BY v)`` over
    every row — at 100 TB that is a corpus-wide sort whose only output
    is a handful of rows. This is the classic two-pass distributed
    selection instead (the histogram refinement of quickselect;
    same family as TeraSort's sampled range partitioning):

    1. **Histogram pass**: one map-side-combined shuffle of
       ``(group, floor(v / bucket_width))`` counts. The count table is
       O(groups · value_range / bucket_width) rows — KBs, not the
       corpus — and a per-group running sum (window PARTITIONED by
       group: parallel across groups, never a single global partition)
       turns it into exclusive offsets. Integer target ranks
       ``(N·pct + 99) div 100`` (= ceil, no floats) then locate, for
       every (group, pct), the ONE bucket whose offset interval
       contains the rank.
    2. **Selection pass**: rescan filtered to the ≤ groups·|pcts|
       needed buckets (broadcast join on the tiny located set — the
       filter reaches the scan side of the shuffle, so only the needed
       sliver is ranked), sort WITHIN each needed bucket (row_number
       partitioned by (group, bucket) — each a ~bucket_width-dense
       sliver of one group), and pick the row whose local rank matches
       ``rank − offset``. Duplicate values make row_number's tie order
       arbitrary but the VALUE at a given rank is unique, so the
       output is deterministic.

    Exactly equals the naive global-sort selection bit-for-bit; only
    the plan differs (two scans + two small shuffles vs one corpus
    sort). Values should be pre-cast to an exact type (DECIMAL) by the
    caller — the returned ``value`` is whatever type came in.
    """
    base = df.select(F.col(group_col).alias("grp"),
                     F.col(value_col).alias("_v"))
    b = base.withColumn(
        "_bkt", F.floor(F.col("_v") / F.lit(bucket_width)).cast("bigint"))
    # the count table has four consumers (offsets, totals, locate,
    # and the located set joined twice) — pin it so the corpus-sized
    # histogram pass runs ONCE, not per consumer; the table itself is
    # O(groups · range/width) rows, KBs at any SF
    counts = (b.groupBy("grp", "_bkt").agg(F.count("*").alias("_n"))
              .localCheckpoint(eager=False))
    wg = (Window.partitionBy("grp").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(wg), F.lit(0).cast("bigint")))
    tot = counts.groupBy("grp").agg(F.sum("_n").alias("_tot"))
    pcts_df = (df.sparkSession.range(1)
               .select(F.explode(F.array(
                   *[F.lit(p).cast("bigint") for p in pcts])).alias("pct")))
    targets = (tot.crossJoin(F.broadcast(pcts_df))
               .withColumn("_rank",
                           F.expr("(_tot * pct + 99) div 100"))
               .drop("_tot"))
    located = (off.join(F.broadcast(targets), "grp")
               .filter((F.col("_off") < F.col("_rank"))
                       & (F.col("_rank") <= F.col("_off") + F.col("_n")))
               .select("grp", "_bkt", "pct",
                       (F.col("_rank") - F.col("_off")).alias("_want")))
    needed = located.select("grp", "_bkt").distinct()
    wv = Window.partitionBy("grp", "_bkt").orderBy("_v")
    picked = (b.join(F.broadcast(needed), ["grp", "_bkt"])
              .withColumn("_lr", F.row_number().over(wv).cast("bigint"))
              .join(F.broadcast(located), ["grp", "_bkt"])
              .filter(F.col("_lr") == F.col("_want")))
    return (picked.select(F.col("grp").alias(group_col),
                          F.col("pct"),
                          F.col("_v").alias("value"))
            .orderBy(group_col, "pct"))
