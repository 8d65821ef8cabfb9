"""Frequency estimation at corpus scale: exact heavy hitters via mergeable
Misra-Gries summaries, and a deterministic count-min sketch.

Why these two, when ``wordcount`` already exists: a full groupBy over a
100 TB corpus shuffles the whole vocabulary — billions of distinct keys.
The operators here bound the shuffle by the *answer size* instead:

- ``heavy_hitters_exact`` shuffles at most ``partitions × k`` candidate
  words (pass 1) plus the exact counts of that candidate set (pass 2).
  The output is provably EXACT — the Misra-Gries merge guarantee
  (Agarwal et al., "Mergeable Summaries", PODS'12) says any word with
  global frequency > N/k survives in some partition summary, and pass 2
  re-counts candidates exactly — so the result is independent of
  partitioning and has a plain-SQL oracle.
- ``count_min_sketch`` builds the d×w counter matrix of Cormode &
  Muthukrishnan (J. Algorithms '05) with md5-derived hash rows, so the
  sketch itself is bit-reproducible in any engine (same cells, same
  counts) and the one-sided error guarantee (est ≥ true) can be asserted
  per probe in-plan.

The reference engine has no sketch operators (SURVEY §0: its 3.4k Java
lines are Connect client machinery); these extend the analytics surface
the way Kafka Streams users lean on interactive state stores for
frequency queries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_48(col: Column) -> Column:
    """48-bit integer from the md5 hex prefix — identical in Spark and
    DuckDB (``('0x' || substr(md5(x),1,12))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def words_of(df: DataFrame, text_col: str) -> DataFrame:
    """Tokenize to one word per row. NULL text ≡ empty document (the
    repo-wide NULL-text policy)."""
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+")
    return (df.select(F.explode(toks).alias("word"))
              .where(F.length("word") > 0))


def heavy_hitters_exact(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Exact words with frequency > N/k in two corpus passes.

    Pass 1 (zero shuffle): each partition streams its Arrow batches
    through a Misra-Gries summary with k counters — merge the batch's
    ``value_counts`` into the counter dict, then decrement all counters
    by the (k+1)-th largest and drop the non-positive (the mergeable-
    summaries rule), which keeps ≤ k counters with per-partition error
    < n_p/k. Each partition emits its ≤ k candidate words plus one
    marker row carrying the partition's word count n_p.

    Pass 2 (one bounded shuffle): the candidate union (≤ partitions × k
    words, independent of vocabulary size) is broadcast back against the
    token stream and counted exactly; ``cnt · k > N`` keeps the true
    heavy hitters. Any word that IS one must be a candidate (averaging:
    global > N/k ⇒ > n_p/k in some partition), so the output is exact
    and partitioning-independent — hence oracle-checkable.
    """
    words = words_of(df, text_col)

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {w: c - cut for w, c in counters.items()
                            if c > cut}
        yield pd.DataFrame({
            "word": list(counters) + [None],
            "n_p": [None] * len(counters) + [n_p],
        })

    summary = words.mapInPandas(mg, "word string, n_p long")
    summary = summary.localCheckpoint(eager=True)  # one pass-1 scan, reused
    total = summary.agg(F.sum("n_p")).collect()[0][0] or 0  # O(1) scalar
    cands = summary.where(F.col("word").isNotNull()).select("word").distinct()
    return (words.join(F.broadcast(cands), "word")
                 .groupBy("word").agg(F.count("*").alias("cnt"))
                 .where(F.col("cnt") * k > F.lit(total))
                 .orderBy(F.desc("cnt"), "word"))


def cms_hash(col: Column, row: int, width: int) -> Column:
    """Row-``row`` CMS bucket for a word: affine transform of the word's
    48-bit md5 integer modulo a Mersenne prime, then modulo the width.
    Plain integer arithmetic — reproducible in any SQL engine."""
    a, b = 2 * row + 1, 104729 * (row + 1)
    return ((_md5_48(col) * a + b) % 2147483647) % width


def count_min_sketch(df: DataFrame, text_col: str,
                     depth: int = 4, width: int = 512) -> DataFrame:
    """The CMS counter matrix: one row per non-empty (row, bucket) cell.

    One corpus scan; ``posexplode`` fans each word to its ``depth``
    buckets in-row, and the single groupBy shuffles at most
    ``depth × width`` keys after map-side partial aggregation — sketch
    size is independent of both corpus and vocabulary size, which is the
    whole point at 100 TB.
    """
    words = words_of(df, text_col)
    cells = F.array(*[cms_hash(F.col("word"), r, width)
                      for r in range(depth)])
    return (words.select(F.posexplode(cells).alias("row", "bucket"))
                 .groupBy("row", "bucket")
                 .agg(F.count("*").alias("counter")))


def cms_estimate(df: DataFrame, text_col: str,
                 probes: DataFrame | None = None,
                 depth: int = 4, width: int = 512,
                 probe_top: int = 10) -> DataFrame:
    """Point-query the sketch for each probe word and assert the CMS
    guarantee in-plan.

    Returns (word, exact, est, overcount_ok) where ``est`` is the min
    over the word's ``depth`` counters and ``overcount_ok`` checks the
    one-sided bound est ≥ exact. ``probes=None`` probes the
    ``probe_top`` most frequent words.

    r14 (guide §2.3 — aggregate before you shuffle, derive once): ONE
    corpus tokenize pass builds the word-count table; the sketch, the
    exact counts and the default probe set all derive from that
    vocabulary-sized pinned table. The counter for a cell is the SUM of
    the counts of the words hashing there — identical to fanning out
    every occurrence (the previous spelling tokenized the corpus once
    for the sketch and again for the exact counts, and the caller a
    third time for the probes; measured 2.0 → 1.3 s at sf0.1).
    """
    wc = (words_of(df, text_col).groupBy("word")
          .agg(F.count("*").alias("_c"))
          .localCheckpoint(eager=True))
    cells = F.array(*[cms_hash(F.col("word"), r, width)
                      for r in range(depth)])
    # ≤ depth×width rows, consumed once per hash row below — pin it so
    # the vocab explode+aggregate runs once, not ``depth`` times
    sketch = (wc.select(F.col("_c"), F.posexplode(cells)
                        .alias("row", "bucket"))
              .groupBy("row", "bucket")
              .agg(F.sum("_c").alias("counter"))
              .localCheckpoint(eager=True))
    exact = wc.select("word", F.col("_c").alias("exact"))
    if probes is None:
        probes = (wc.orderBy(F.desc("_c"), "word").limit(probe_top)
                  .select("word"))
    probed = probes.select("word", *[
        cms_hash(F.col("word"), r, width).alias(f"h{r}")
        for r in range(depth)])
    est = None
    joined = probed
    for r in range(depth):
        s_r = (sketch.where(F.col("row") == r)
               .select(F.col("bucket").alias(f"h{r}"),
                       F.col("counter").alias(f"c{r}")))
        joined = joined.join(F.broadcast(s_r), f"h{r}", "left")
        c_r = F.coalesce(F.col(f"c{r}"), F.lit(0))
        est = c_r if est is None else F.least(est, c_r)
    return (joined.withColumn("est", est)
                  .join(exact, "word", "left")
                  .select("word",
                          F.coalesce("exact", F.lit(0)).alias("exact"),
                          F.col("est"),
                          (F.col("est") >= F.coalesce("exact", F.lit(0))
                           ).alias("overcount_ok"))
                  .orderBy(F.desc("exact"), "word"))


def _kmin_distinct(df: DataFrame, set_col: str, h_col: str,
                   k: int) -> DataFrame:
    """Per set, the k smallest DISTINCT hash values, as a sorted array.

    Same mergeable-summary shape as heavy_hitters_exact: pass 1 streams
    each partition through a bounded dict-of-k-mins per set (Arrow
    batches, state ≤ sets × k), pass 2 merges the ≤ partitions × k
    candidates with one tiny shuffle. Never a vocabulary-sized
    collect_list, never a per-set sort of the raw stream.
    """
    def kmins(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, list] = {}
        import heapq
        for pdf in batches:
            for s, grp in pdf.groupby(set_col, sort=False):
                heap = state.setdefault(s, [])   # max-heap via negation
                for h in grp[h_col].unique():
                    h = int(h)
                    if len(heap) < k:
                        if -h not in heap:
                            heapq.heappush(heap, -h)
                    elif h < -heap[0] and -h not in heap:
                        heapq.heapreplace(heap, -h)
        for s, heap in state.items():
            yield pd.DataFrame({set_col: s, h_col: [-x for x in heap]})

    cand = df.select(set_col, h_col).mapInPandas(
        kmins, f"{set_col} string, {h_col} long")
    return (cand.groupBy(set_col)
            .agg(F.slice(F.array_sort(F.collect_set(h_col)), 1, k)
                 .alias("kmins")))


def kmv_report(df: DataFrame, set_col: str, elem_col: str,
               k: int = 64) -> DataFrame:
    """KMV/theta-sketch set algebra with an exact side-by-side check
    (Beyer et al. SIGMOD'07; theta sketches per Dasgupta et al.).

    For each pair of sets (A, B): estimate |A|, |B|, |A∪B|, |A∩B| from
    k-min sketches of the md5-48 element hash —

    - cardinality: (k−1)·M `div` h_k with M = 2^48 (exact when the set
      has < k distinct members: the sketch then holds the whole set),
    - union: the k-min of the merged sketches (sketches are mergeable —
      the property that lets 1000 executors sketch independently),
    - intersection: the theta filter — members of BOTH sketches below
      θ = the union sketch's h_k, scaled by M `div` θ.

    All integer arithmetic on deterministic hashes, so the estimates —
    not just the exact counts — hash-match a SQL oracle, and
    ``within_bound`` asserts |est−exact| ≤ 4·exact/√(k−1) (≈4·RSE) for
    the three KMV estimates in-plan.

    Scale shape: sketches build in the heavy_hitters two-pass pattern
    (bounded per-partition state, candidate merge ≤ partitions × k);
    the pairwise algebra runs on ≤ |sets|² sketch rows. The exact
    counts are the EVAL side (one distinct pass + one per-hash
    groupBy); production use drops them and keeps the sketch-only plan.
    """
    M = 1 << 48
    hashed = (df.select(F.col(set_col).cast("string").alias("s"),
                        _md5_48(F.col(elem_col).cast("string")).alias("h"))
              .where(F.col("s").isNotNull() & F.col("h").isNotNull())
              .distinct()
              .localCheckpoint(eager=True))
    sk = _kmin_distinct(hashed, "s", "h", k)
    ex = hashed.groupBy("s").agg(F.count("*").alias("exact"))
    # exact pair intersections via the side-flag shape: group each hash's
    # member-set list, expand ordered pairs in-row — no raw A⋈B join
    from kafka_connect_streams_spark.operators.graph import pairs_in_row
    inter = (hashed.groupBy("h")
             .agg(F.collect_set("s").alias("ss"))
             .select(F.explode(pairs_in_row(F.col("ss"))).alias("p"))
             .groupBy(F.col("p.a").alias("set_a"),
                      F.col("p.b").alias("set_b"))
             .agg(F.count("*").alias("exact_intersect")))
    pairs = (sk.alias("a").crossJoin(sk.alias("b"))
             .where(F.expr("a.s < b.s"))
             .select(F.expr("a.s").alias("set_a"),
                     F.expr("b.s").alias("set_b"),
                     F.expr("a.kmins").alias("ka"),
                     F.expr("b.kmins").alias("kb")))
    est = (f"CASE WHEN size({{a}}) < {k} THEN cast(size({{a}}) as bigint) "
           f"ELSE ({k} - 1) * cast({M} as bigint)"
           f" div element_at({{a}}, size({{a}})) END")
    p = (pairs
         .withColumn("mu", F.slice(
             F.array_sort(F.array_union("ka", "kb")), 1, k))
         .withColumn("theta", F.element_at("mu", F.size("mu")))
         .withColumn("est_a", F.expr(est.format(a="ka")))
         .withColumn("est_b", F.expr(est.format(a="kb")))
         .withColumn("est_union", F.expr(est.format(a="mu")))
         .withColumn("inter_below", F.size(F.array_intersect(
             F.filter("ka", lambda x: x <= F.col("theta")),
             F.filter("kb", lambda x: x <= F.col("theta")))))
         .withColumn("est_intersect", F.expr(
             f"CASE WHEN size(ka) < {k} AND size(kb) < {k} "
             f"THEN cast(size(array_intersect(ka, kb)) as bigint) "
             f"ELSE cast(inter_below as bigint) * cast({M} as bigint)"
             f" div theta END")))
    rse4 = int(4000 / (k - 1) ** 0.5)  # 4·RSE in e3 fixed point
    ok = " AND ".join(
        f"abs(est_{c} - exact_{c}) * 1000 <= exact_{c} * {rse4}"
        for c in ("a", "b", "union"))
    return (p
            .join(ex.select(F.col("s").alias("set_a"),
                            F.col("exact").alias("exact_a")), "set_a")
            .join(ex.select(F.col("s").alias("set_b"),
                            F.col("exact").alias("exact_b")), "set_b")
            .join(inter, ["set_a", "set_b"], "left")
            .withColumn("exact_intersect",
                        F.coalesce("exact_intersect", F.lit(0)))
            .withColumn("exact_union",
                        F.col("exact_a") + F.col("exact_b")
                        - F.col("exact_intersect"))
            .select("set_a", "set_b",
                    "exact_a", "est_a", "exact_b", "est_b",
                    "exact_union", "est_union",
                    "exact_intersect", "est_intersect",
                    F.expr(ok).alias("within_bound"))
            .orderBy("set_a", "set_b"))


#: alpha_256 · 256² · 2^53 / 1e6 with alpha_256 = 0.718272 (the e6
#: truncation of Flajolet's 0.7213/(1+1.079/m) bias constant at m=256),
#: correctly rounded ONCE to double (Fraction → float) so both engines
#: divide the identical literal — no cross-engine constant folding.
_HLL_NUM_256 = 4.2399295229796824e+20


def _hll_hash60(e: Column) -> Column:
    """60-bit md5 of a string column: top 8 bits index the register,
    the low 52 bits are the rank window."""
    return F.conv(F.substring(F.md5(e), 1, 15), 16, 10).cast("bigint")


def hll_registers_from_hashed(hashed: DataFrame) -> DataFrame:
    """(s, reg, m_reg) register table from (s, h) 60-bit hashes — the
    max-fold shared by the batch report and the streaming form (a max
    is algebraic, order-insensitive and retraction-free, so the same
    expression is a native streaming aggregation)."""
    return (hashed
            .select("s",
                    F.expr("h div 4503599627370496").alias("reg"),
                    F.expr("h % 4503599627370496").alias("low"))
            .withColumn("rho", F.expr(
                "CASE WHEN low = 0 THEN 53"
                " ELSE 53 - length(bin(low)) END"))
            .groupBy("s", "reg").agg(F.max("rho").alias("m_reg")))


def hll_report(df: DataFrame, set_col: str, elem_col: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al., AofA'07)
    with an exact side-by-side check — the third mergeable-sketch
    family next to KMV (set algebra) and CMS (frequency): 256 registers
    of 6 bits answer COUNT DISTINCT within ~1.04/√256 ≈ 6.5% RSE, and
    registers merge by max() — the property that lets 1000 executors
    sketch independently and a coordinator fold the results.

    Deterministic end-to-end: the element hash is md5-60 (top 8 bits →
    register index, low 52 bits → rank window); the rank ρ = position
    of the first 1-bit is pure integer arithmetic (53 − length(bin(v)),
    v=0 → 53 — ``bin`` renders identically on both engines, verified);
    the harmonic denominator Σ 2^(−M_j) is carried EXACTLY as the
    integer S = Σ 2^(53−M_j) (+ 2^53 per empty register; terms ∈
    [2^0, 2^53], 256 registers → < 2^62, no overflow), and the only
    float is the single IEEE division of the pre-folded numerator
    literal by S — bit-identical on any engine (the cosine-operator
    discipline). Raw estimate only (no small-range linear-counting
    branch — that needs ln; callers below ~2.5·m distincts should read
    ``within_4rse`` before trusting it).

    Scale shape: the SKETCH path never deduplicates and never
    materializes — max() absorbs duplicates, so the register build is
    one map-side-combined (set, register) aggregate over the raw scan
    (≤ 256 rows per set regardless of corpus size; no corpus-wide
    distinct shuffle, no checkpoint — exactly the streaming_hll shape).
    Only the EVAL side pays for a distinct pass to get the true count;
    production drops it and keeps the sketch-only plan.
    """
    m = 256
    base = (df.select(F.col(set_col).cast("string").alias("s"),
                      F.col(elem_col).cast("string").alias("e"))
            .where(F.col("s").isNotNull() & F.col("e").isNotNull()))
    regs = hll_registers_from_hashed(
        base.withColumn("h", _hll_hash60(F.col("e"))).drop("e"))
    per_set = (regs.groupBy("s")
               .agg(F.count("*").alias("v_registers"),
                    F.sum(F.expr(
                        "shiftleft(cast(1 as bigint), 53 - m_reg)"))
                    .alias("_sp"))
               .withColumn("s_scaled", F.expr(
                   f"_sp + ({m} - v_registers)"
                   " * cast(9007199254740992 as bigint)")))
    exact = (base.distinct()
             .groupBy("s").agg(F.count("*").alias("n_true")))
    return (per_set.join(exact, "s")
            .withColumn("hll_est", F.lit(_HLL_NUM_256)
                        / F.col("s_scaled").cast("double"))
            .withColumn("within_4rse",
                        F.abs(F.col("hll_est")
                              - F.col("n_true").cast("double"))
                        / F.col("n_true").cast("double") <= F.lit(0.26))
            .select(F.col("s").alias("set_key"), "n_true", "v_registers",
                    "s_scaled", "hll_est", "within_4rse")
            .orderBy("set_key"))


# -- mergeable quantile sketch ----------------------------------------------


def quantile_sketch(df: DataFrame, group_col: str, value_col,
                    width: int) -> DataFrame:
    """The MERGEABLE quantile sketch the family was missing next to
    MG/CMS/KMV/HLL: a deterministic fixed-width histogram
    ``(g, bucket, c)`` with ``bucket = value div width`` over integer
    value units. Counts form a commutative monoid — 1000 executors
    sketch their shards independently and a coordinator ADDS the
    tables (exactly HLL's register-max story, with + instead of max) —
    and the same expression is a native streaming aggregation
    (streaming/state.py streaming_quantile_sketch). Deterministic by
    construction (no KLL coin flips), so the DuckDB oracle matches
    bit-for-bit and merge order can never change an answer.

    The price of determinism is a VALUE-domain error bound instead of
    KLL's rank bound: any quantile lands inside one bucket, so the
    estimate interval is the bucket's ``[lo, hi]`` and the error is at
    most ``width - 1`` units — carried in-plan by
    :func:`quantile_from_sketch` (the hll_report within_4rse
    precedent). State is bounded by |groups| × (domain / width);
    size ``width`` to the precision the consumer needs, not to the
    data volume — the sketch never grows with row count.

    ``value_col`` must already be NON-NEGATIVE integer units (e.g.
    cents): bucketing uses truncating ``div``, so a negative value
    would land in a bucket whose ``[lo, hi] = [bucket·width,
    bucket·width + width − 1]`` interval does not contain it (bucket 0
    would span ``(−width, width)``) and :func:`quantile_from_sketch`'s
    ``err_bound`` contract would not hold. For signed domains, shift
    by a known lower bound before sketching (exact, reversible) rather
    than floor-dividing — a floor-div variant would also change the
    DuckDB twin. Rows with NULL value are excluded on both engines
    (repo NULL policy)."""
    v = F.col(value_col).cast("bigint") if isinstance(value_col, str) \
        else value_col.cast("bigint")
    return (df.where(v.isNotNull())
            .select(F.col(group_col).alias("g"), v.alias("_v"))
            .select("g", F.expr(f"_v div {int(width)}").alias("bucket"))
            .groupBy("g", "bucket").agg(F.count("*").alias("c")))


def quantile_from_sketch(sketch: DataFrame, width: int,
                         pcts: "tuple[int, ...]" = (25, 50, 75, 90, 99),
                         ) -> DataFrame:
    """Fold quantile estimates out of a histogram sketch: per group,
    the rank ``ceil(n·pct/100)`` (integer ``(n·pct + 99) div 100`` —
    the quantile_exact arithmetic) lands in the first bucket whose
    cumulative count reaches it; the answer is that bucket's value
    interval ``[est_lo, est_hi]`` plus the in-plan ``err_bound``
    (``width − 1`` — the worst case, attained when the true value sits
    at the far end of the bucket). Everything here runs on the
    |groups|×|buckets|-row sketch, never the corpus; the per-group
    cumulative window is over bucket counts only (the accepted
    global_index offsets shape)."""
    from pyspark.sql.window import Window
    w = int(width)
    cum = (sketch.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("g").orderBy("bucket")
                               .rowsBetween(Window.unboundedPreceding,
                                            0)))
        .withColumn("n", F.sum("c").over(Window.partitionBy("g"))))
    pct = F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct")
    picked = (cum.select("g", "bucket", "cum", "n", pct)
              .where(F.col("cum")
                     >= F.expr("(n * pct + 99) div 100"))
              .groupBy("g", "pct", "n")
              .agg(F.min("bucket").alias("bucket")))
    return picked.select(
        "g", F.col("pct").cast("bigint").alias("pct"), "n",
        (F.col("bucket") * w).alias("est_lo"),
        (F.col("bucket") * w + w - 1).alias("est_hi"),
        F.lit(w - 1).cast("bigint").alias("err_bound"))
