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


def _hilbert_rounds(bits: int) -> list[int]:
    """The unrolled quadrant sizes s = 2^(bits−1) … 1 of the standard
    Hilbert xy→d walk (the public-domain iterative algorithm: quadrant
    digit + conditional flip-and-swap per round)."""
    return [1 << i for i in range(bits - 1, -1, -1)]


def hilbert_py(x: int, y: int, bits: int = 12) -> int:
    """Pure-Python Hilbert index — the reference both engine spellings
    are generated from and pinned against. Per round over quadrant
    size s: digit = (3·rx) xor ry (spelled arithmetically as
    ``3·rx + ry − 2·rx·ry`` so no engine needs a bitwise xor), then
    the ry=0 rotation (flip both coordinates by n−1 when rx=1, always
    swap)."""
    n = 1 << bits
    d = 0
    for s in _hilbert_rounds(bits):
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
    return d


def with_hilbert(df: DataFrame, x: Column, y: Column,
                 bits: int = 12, out: str = "hkey") -> DataFrame:
    """Attach the Hilbert-curve index of two bounded non-negative ints
    — the locality-better sibling of :func:`zorder_key` (Hilbert 1891;
    the iterative xy→d mapping is public domain): consecutive d values
    are always ADJACENT cells, so bucket ranges of d are tighter
    rectangles than Morton ranges — smaller per-file min-max spans,
    more pruning (the measured number is queries.q_layout_prune_ab).

    DOMAIN CONTRACT: both coordinates must lie in [0, 2^bits) —
    unlike :func:`zorder_key`, which reads only low bits and truncates
    out-of-range values harmlessly, the Hilbert rotation's ``n−1−x``
    flip produces garbage (not truncation) for out-of-range input, so
    callers mask/bucket first (q_hilbert_layout's ``& 4095`` / day
    offsets do).

    Spelled as ONE PROJECTION PER ROUND over named intermediate
    columns, never one nested expression: each round reads the
    previous round's coordinates several times, so a single expression
    tree would grow ~3^bits nodes (Catalyst's CollapseProject keeps
    the per-round projections separate exactly because the rebound
    CASEs are non-cheap and multiply-referenced). Pure integer
    CASE/shift arithmetic, whole-stage codegen, bit-identical to
    :func:`hilbert_py` and the SQL twin (queries._hilbert_keyed_sql)
    by construction — all three unroll the same walk."""
    n = 1 << bits
    cur = df.select("*", x.cast("long").alias("_hx"),
                    y.cast("long").alias("_hy"),
                    F.lit(0).cast("long").alias("_hd"))
    for s in _hilbert_rounds(bits):
        b = s.bit_length() - 1
        rx = F.shiftright(F.col("_hx"), b).bitwiseAND(1)
        ry = F.shiftright(F.col("_hy"), b).bitwiseAND(1)
        flip = (ry == 0) & (rx == 1)
        keep = ry == 1
        cur = cur.withColumns({
            "_hd": F.col("_hd") + F.lit(s * s) * (3 * rx + ry
                                                  - 2 * rx * ry),
            "_hx": (F.when(keep, F.col("_hx"))
                    .when(flip, F.lit(n - 1) - F.col("_hy"))
                    .otherwise(F.col("_hy"))),
            "_hy": (F.when(keep, F.col("_hy"))
                    .when(flip, F.lit(n - 1) - F.col("_hx"))
                    .otherwise(F.col("_hx"))),
        })
    return (cur.withColumn(out, F.col("_hd"))
            .drop("_hx", "_hy", "_hd"))


def hilbert_layout_stats(df: DataFrame, x: Column, y: Column,
                         bits: int = 12,
                         bucket_shift: int = 18) -> DataFrame:
    """:func:`zorder_layout_stats` with the Hilbert key — identical
    bucketing and span report, so the two layouts' file-skipping
    statistics compare row-for-row (queries.q_layout_prune_ab turns
    the comparison into a measured pruning number)."""
    keyed = with_hilbert(
        df.select(x.alias("x"), y.alias("y")),
        F.col("x"), F.col("y"), bits)
    return (keyed.select("x", "y",
                         F.shiftright(F.col("hkey"), bucket_shift)
                         .alias("bucket"))
              .groupBy("bucket")
              .agg(F.count("*").alias("n_rows"),
                   F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                   F.min("y").alias("min_y"), F.max("y").alias("max_y"))
              .orderBy("bucket"))


def layout_file_spans(df: DataFrame, key_col: str, n_files: int = 64,
                      range_shift: int = 18,
                      tiebreak: tuple[str, ...] = ("x", "y")) -> DataFrame:
    """EQUAL-FREQUENCY "files" along a clustering key, with per-file
    min-max spans of both dimensions — what a layout write actually
    produces (files hold a fixed row count along the sort order, not a
    fixed key range). This is the spelling under which curve choice
    becomes measurable: aligned power-of-two KEY-RANGE buckets give
    BOTH curves identical square tiles (no discrimination — measured
    before this existed), while equal-row files cut the curve at
    arbitrary positions, where Hilbert's every-step-adjacent walk
    keeps bounding boxes tight and Morton's long jumps inflate them.

    Ranking is the :func:`global_index` two-pass pattern with
    KEY-RANGE coarse buckets (the TeraSort range partition, the
    pattern a real OPTIMIZE-style layout write runs): rank within each
    top-bits key range (≤ 2^(24−range_shift) parallel sorts of ~N/64
    rows), exclusive-prefix-sum the range counts (a window over the
    range count table, never N), broadcast the offsets and the total,
    and assign ``file = global_rank · n_files div N``. Ties order by
    ``tiebreak`` then split arbitrarily across a file boundary —
    harmless for spans: every tied row shares one (x, y) cell, so
    membership, not order, decides the min-max. Equals the oracle's
    ``row_number() OVER (ORDER BY key, x, y)`` assignment exactly."""
    kb = F.shiftright(F.col(key_col), range_shift)
    # three consumers below (rank, range counts, total) — pin the keyed
    # table so the upstream key derivation (12 projection rounds for
    # the Hilbert chain) is planned and evaluated ONCE, not replayed
    # per consumer (the media_neardup/k_anonymize localCheckpoint
    # discipline; the table is (x, y, key, _kb) — skinny)
    keyed = df.withColumn("_kb", kb).localCheckpoint(eager=False)
    wb = Window.partitionBy("_kb").orderBy(key_col, *tiebreak)
    ranked = keyed.withColumn("_pos", F.row_number().over(wb))
    wo = (Window.orderBy("_kb")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (keyed.groupBy("_kb")
               .agg(F.count("*").alias("_n"))
               .withColumn("_off", F.coalesce(F.sum("_n").over(wo),
                                              F.lit(0).cast("bigint"))))
    tot = keyed.agg(F.count("*").alias("_N"))
    return (ranked.join(F.broadcast(offsets.select("_kb", "_off")), "_kb")
            .crossJoin(F.broadcast(tot))
            .withColumn("file", F.expr(
                f"((_off + _pos - 1) * {n_files}) div _N"))
            .groupBy("file")
            .agg(F.count("*").alias("n_rows"),
                 F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y"))
            .orderBy("file"))


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


def write_clustered(df: DataFrame, path: str, key_col: str,
                    n_files: int = 64) -> None:
    """Materialize a clustered layout as REAL parquet files: range-
    partition by the clustering key into ``n_files`` partitions and
    sort within each — exactly what an OPTIMIZE ZORDER/CLUSTER BY
    write does, so the resulting files carry the min-max footer stats
    a zonemap scan prunes with. ``repartitionByRange`` samples the key
    to place boundaries (Spark's built-in range exchange — reservoir
    sample, never a global sort), so file row counts are approximately
    equal rather than exact; :func:`layout_file_spans` is the exact
    deterministic twin the oracle checks, this is the physical writer
    the tests verify against it (tests/test_operators_batch.py
    TestClusteredWrite reads the written files back by
    input_file_name and confirms the measured pruning advantage
    survives real file placement)."""
    (df.repartitionByRange(n_files, F.col(key_col))
       .sortWithinPartitions(key_col)
       .write.mode("overwrite").parquet(path))


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
