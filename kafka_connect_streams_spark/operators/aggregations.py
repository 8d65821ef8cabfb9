"""Keyed and windowed aggregation — the KTable layer.

Reference surface (SURVEY.md §2.4): ``groupBy((k,word) -> word).count()``
(examples/KafkaWordCount.java:63-64, examples/DatabaseWordCount.java:122-124)
producing a continuously-updated KTable. In batch this is a plain hash
aggregate; in streaming, the same expression in ``update`` output mode emits
the changed (word, count) rows per micro-batch, which matches the KTable
changelog contract (A2/A3).

Scale notes (100 TB):
- Spark always does partial (map-side) aggregation before the shuffle, so a
  high-cardinality groupBy moves only one row per (partition, key) — the
  reference shipped every record through a broker repartition topic instead.
- Double sums are computed over ``DECIMAL``-cast inputs. That makes the
  aggregate exact and ORDER-INDEPENDENT, which matters on a cluster: a plain
  double sum is nondeterministic across retries/partitionings at scale (and
  unverifiable against an oracle). Final results are cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.projections import flat_map_values

#: decimal type wide enough for TPC-H-ish money/quantity with exact sums
DEC = "decimal(18,2)"


def word_count(df: DataFrame, text_col: str) -> DataFrame:
    """The flagship pipeline: lower → split \\W+ → drop empty → count per word.

    Structural twin of KafkaWordCount.countWords (examples/KafkaWordCount.java:56-67):
    source → flatMapValues → groupBy → count, minus the repartition topic
    (Spark's exchange does map-side partial counts first).
    """
    words = flat_map_values(df, text_col, out_col="word")
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def dec(col: str | Column) -> Column:
    """Cast a double measure to exact decimal for order-independent sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def sum_money(col: str | Column, alias: str) -> Column:
    """Exact decimal sum of a money column, emitted as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def avg_money(col: str | Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = dec(col)
    return (F.sum(c).cast("double") / F.count(c)).alias(alias)


def tumbling(df: DataFrame, ts_col: str, width: str, *keys: str,
             aggs: list[Column]) -> DataFrame:
    """Tumbling event-time window aggregation (ST7 — native in Spark).

    Emits ``window_start`` as a plain timestamp column so batch and streaming
    results share one schema.
    """
    w = F.window(F.col(ts_col), width)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("window_start", F.col("window.start"))
              .drop("window"))


def sliding(df: DataFrame, ts_col: str, width: str, slide: str, *keys: str,
            aggs: list[Column]) -> DataFrame:
    """Sliding event-time window aggregation (each record lands in width/slide windows)."""
    w = F.window(F.col(ts_col), width, slide)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("window_start", F.col("window.start"))
              .drop("window"))


def session(df: DataFrame, ts_col: str, gap: str, *keys: str,
            aggs: list[Column]) -> DataFrame:
    """Session windows with a fixed inactivity gap (native ``session_window``).

    Emits ``session_start`` (= min event time in the session) so results are
    comparable to a gaps-and-islands SQL formulation.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (df.groupBy(w, *keys)
              .agg(*aggs)
              .withColumn("session_start", F.col("session_window.start"))
              .drop("session_window"))


def k_anonymize(df: DataFrame, id_col: str, qi_cols: list[str],
                coarse_n: int, k: int = 5) -> DataFrame:
    """k-anonymity by two-level local recoding (Sweeney's model, public
    knowledge): every released row must share its quasi-identifier (QI)
    combination with at least ``k-1`` others. Level 0 keeps all
    ``qi_cols``; rows whose full-QI group is smaller than ``k`` are
    generalized to level 1 (only the first ``coarse_n`` QI columns
    kept, the rest released as ``'*'``) and re-counted AMONG the
    generalized rows; rows still under ``k`` are fully suppressed
    (level 2, every QI ``'*'`` — one global group, trivially
    anonymous). Output: the id, every QI as a string (possibly
    ``'*'``), the anonymity level, and the size of the group the row
    is released in. ``id_col`` MUST be a pseudonymous surrogate key
    (it exists so audits like :func:`l_diversity_report` can join the
    release back to the sensitive column) — releasing a real-world
    identifier alongside the generalized QIs would defeat the recoding
    entirely; drop or re-key it before any external release.

    The release-group property this guarantees (and the tests pin):
    every (level, released-QI) group in the OUTPUT has size ≥ k or is
    the level-2 remainder group. Scale shape: two partial-aggregatable
    groupBy counts over the QI columns (count tables bounded by the
    number of QI combinations, not corpus size), joined back on the
    same keys — AQE-skew-splittable; the level-2 size is one scalar
    broadcast. Deterministic: a pure function of the data, no
    sampling, no tie-breaks needed."""
    if not 0 < coarse_n < len(qi_cols):
        raise ValueError("coarse_n must keep a strict prefix of qi_cols")
    base = df.select(
        F.col(id_col),
        *[F.col(c).cast("string").alias(c) for c in qi_cols])
    # base feeds a count and a join; each count-joined table feeds a
    # released level AND the next level's remainder — without pins the
    # union's three legs replay the whole lineage (14 scans measured).
    # Pin the SKINNY tables only (id + QI strings + a count), the
    # bm25_multiterm localCheckpoint discipline: one corpus scan, each
    # count join computed once. eager=False keeps construction lazy.
    base = base.localCheckpoint(eager=False)
    full, coarse = list(qi_cols), list(qi_cols[:coarse_n])

    def _count_join(rows: DataFrame, keys: list[str],
                    n_col: str) -> DataFrame:
        # NULL is a legitimate QI value: groupBy buckets NULLs together,
        # so the join back must be null-safe (<=>) or every NULL-QI row
        # silently vanishes from the release — the count table rejoins
        # on IS NOT DISTINCT FROM, same as the DuckDB oracle
        g = (rows.groupBy(*keys).agg(F.count("*").alias(n_col))
             .select(*[F.col(c).alias(f"_g_{c}") for c in keys], n_col))
        cond = [rows[c].eqNullSafe(g[f"_g_{c}"]) for c in keys]
        return (rows.join(g, cond)
                .drop(*[f"_g_{c}" for c in keys])
                .localCheckpoint(eager=False))

    j0 = _count_join(base, full, "_n0")
    lvl0 = (j0.filter(F.col("_n0") >= k)
            .select(id_col, *full,
                    F.lit(0).cast("bigint").alias("anon_level"),
                    F.col("_n0").alias("group_size")))
    rest = j0.filter(F.col("_n0") < k).drop("_n0")
    j1 = _count_join(rest, coarse, "_n1")
    star = [F.lit("*").alias(c) for c in qi_cols[coarse_n:]]
    lvl1 = (j1.filter(F.col("_n1") >= k)
            .select(id_col, *coarse, *star,
                    F.lit(1).cast("bigint").alias("anon_level"),
                    F.col("_n1").alias("group_size")))
    rest2 = j1.filter(F.col("_n1") < k).select(id_col)
    n2 = rest2.groupBy().agg(F.count("*").alias("group_size"))
    lvl2 = (rest2.crossJoin(F.broadcast(n2))  # one scalar row
            .select(id_col,
                    *[F.lit("*").alias(c) for c in qi_cols],
                    F.lit(2).cast("bigint").alias("anon_level"),
                    "group_size"))
    return lvl0.unionByName(lvl1).unionByName(lvl2)


def l_diversity_report(df: DataFrame, id_col: str, qi_cols: list[str],
                       sensitive_col: str, coarse_n: int, k: int = 5,
                       l_threshold: int = 3) -> DataFrame:
    """l-diversity audit of a :func:`k_anonymize` release
    (Machanavajjhala et al., public knowledge): k-anonymity alone
    fails when everyone in a released group shares the SAME sensitive
    value (the homogeneity attack) — an attacker who locates the group
    learns the secret without identifying the row. This reports, per
    released (level, QI) group, the count of DISTINCT sensitive values
    and whether it meets ``l_threshold``. Scale shape: the release's
    joins plus one join back on the row id and one partial-aggregatable
    group count — distinct-count runs as the standard two-phase
    (group, value) expansion, never a driver collect."""
    rel = k_anonymize(df, id_col, qi_cols, coarse_n, k)
    joined = rel.join(df.select(id_col, sensitive_col), id_col)
    return (joined.groupBy("anon_level", *qi_cols)
            .agg(F.count("*").alias("group_size"),
                 F.countDistinct(sensitive_col).alias("n_sensitive"),
                 (F.countDistinct(sensitive_col) >= l_threshold)
                 .alias("l_diverse")))


def t_closeness_report(df: DataFrame, id_col: str, qi_cols: list[str],
                       sensitive_col: str, coarse_n: int, k: int = 5,
                       t_l1_e9: int = 400_000_000) -> DataFrame:
    """t-closeness audit of a :func:`k_anonymize` release (Li, Li &
    Venkatasubramanian, ICDE'07 — public knowledge): l-diversity counts
    DISTINCT sensitive values, so a group with l distinct values that
    is 98% one value still passes while leaking the secret with high
    probability (the skewness attack). This reports, per released
    (level, QI) group, the L1 distance between the group's
    sensitive-value DISTRIBUTION and the whole-corpus distribution —
    exact e9 fixed point (``n_gs·10⁹ div n_g − n_s·10⁹ div N`` summed
    as absolute values over the value domain, the source_drift shape),
    so the oracle twin is bit-identical. ``t_close`` flags
    ``l1_e9 ≤ t_l1_e9``; L1 is twice the total-variation distance (the
    categorical EMD of the original paper), so a TV threshold t maps
    to ``t_l1_e9 = 2·t·10⁹`` — the 0.4 default is TV 0.2.

    ``sensitive_col`` must have a BOUNDED value domain (a band/bucket,
    not a raw continuous value): the corpus distribution and the
    group×domain spine are |domain|-sized broadcasts. Scale shape: one
    partial-aggregatable count per (group, value) cell — bounded by
    released-group count × |domain|, never corpus size — pinned once
    (localCheckpoint) because it feeds both the group totals and the
    zero-filled spine join; QI and sensitive joins are NULL-SAFE
    (the k_anonymize NULL-QI discipline). One scalar broadcast for N.
    """
    rel = k_anonymize(df, id_col, qi_cols, coarse_n, k)
    joined = rel.join(df.select(id_col, sensitive_col), id_col)
    # skinny (level, QIs, value, count) cells — two consumers below
    cells = (joined.groupBy("anon_level", *qi_cols, sensitive_col)
             .agg(F.count("*").alias("_n_gs"))
             .localCheckpoint(eager=False))
    groups = (cells.groupBy("anon_level", *qi_cols)
              .agg(F.sum("_n_gs").alias("_n_g")))
    corpus = (df.groupBy(F.col(sensitive_col).alias("_sv"))
              .agg(F.count("*").alias("_n_s")))
    total = df.agg(F.count("*").alias("_n_tot"))
    spine = (groups.crossJoin(F.broadcast(
        corpus.crossJoin(F.broadcast(total)))))
    # alias the cells' key columns before joining back — spine derives
    # from cells, so unaliased keys trip Spark's ambiguous-self-join
    # detection (the k_anonymize _count_join discipline)
    keys = ["anon_level", *qi_cols]
    cjoin = cells.select(
        *[F.col(c).alias(f"_c_{i}") for i, c in enumerate(keys)],
        F.col(sensitive_col).alias("_c_sv"), "_n_gs")
    cond = [F.col(c).eqNullSafe(F.col(f"_c_{i}"))
            for i, c in enumerate(keys)]
    cond.append(F.col("_sv").eqNullSafe(F.col("_c_sv")))
    zf = (spine.join(cjoin, cond, "left")
          .select(*keys, "_n_g", "_n_s", "_n_tot",
                  F.coalesce("_n_gs", F.lit(0)).alias("_n_gs")))
    return (zf.groupBy("anon_level", *qi_cols, "_n_g")
            .agg(F.sum(F.abs(
                F.expr("_n_gs * 1000000000 div _n_g")
                - F.expr("_n_s * 1000000000 div _n_tot")))
                .alias("l1_e9"))
            .select("anon_level", *qi_cols,
                    F.col("_n_g").alias("group_size"),
                    F.col("l1_e9").cast("bigint").alias("l1_e9"),
                    (F.col("l1_e9") <= t_l1_e9).alias("t_close")))


#: fixed-point scale of the DP noise inverse-CDF table (48 bits — the
#: md5-derived uniform draws 12 hex chars, exactly this range).
DP_NOISE_SCALE = 1 << 48


def dp_noise_cdf(eps_e3: int = 1000, bound: int = 16) -> list[int]:
    """Cumulative inverse-CDF table of the truncated two-sided geometric
    ("discrete Laplace") distribution — the geometric mechanism of
    Ghosh–Roughgarden–Sundararajan (STOC'09; Dwork et al.'s Laplace
    mechanism discretized), the standard ε-DP noise for counting
    queries with sensitivity 1. P(k) ∝ α^|k| with α = exp(−ε),
    truncated at |k| ≤ bound (tail mass at the default ε=1, bound=16
    is ~1e-7 — folded into the end buckets by the cumulative spelling).

    Returned as 2^48 fixed-point thresholds for k = −bound..bound:
    noise(u) = the first k whose threshold exceeds the 48-bit uniform
    draw. The float exp/normalization here runs ONCE, in Python, and
    the resulting INTEGER literals are embedded in both the Spark plan
    and the DuckDB oracle twin — cross-engine parity never touches
    floating point (the fixed-probability-table discipline; ε is
    passed as an exact integer ε·10³ for the same reason)."""
    import math
    alpha = math.exp(-eps_e3 / 1000.0)
    ws = [alpha ** abs(k) for k in range(-bound, bound + 1)]
    tot = sum(ws)
    cum, acc = [], 0.0
    out = []
    for w in ws:
        acc += w
        out.append(min(DP_NOISE_SCALE, int(acc / tot * DP_NOISE_SCALE)))
    out[-1] = DP_NOISE_SCALE
    return out


def dp_counts(df: DataFrame, key_cols: list[str], eps_e3: int = 1000,
              bound: int = 16, seed: str = "dp-seed",
              keep_true: bool = False) -> DataFrame:
    """ε-differentially-private release of a group-count histogram via
    the geometric mechanism: exact counts per key, plus two-sided
    geometric noise (:func:`dp_noise_cdf`), clamped at zero
    (post-processing — does not affect the privacy guarantee). The
    noise draw is a keyed PRNG: a 48-bit uniform from
    ``md5(seed || ':' || key…)`` pushed through the inverse-CDF table
    in-row. DP implementations draw from seeded PRNGs as a matter of
    course — the guarantee holds when ``seed`` is secret and fresh per
    release; the registered query pins a PUBLIC seed so the DuckDB
    twin is exact (the bootstrap_ci md5-replicate-weights precedent) —
    a production release supplies its own secret seed through the same
    argument.

    ``key_cols`` must have BOUNDED cardinality (a histogram domain,
    not raw ids — also a DP requirement: the released key set itself
    must be data-independent). Scale shape: one map-side-partial
    groupBy; the noise is a bounded CASE chain over the count table
    (2·bound+1 integer comparisons per group, no joins, no Python).
    ``keep_true=True`` additionally emits the exact count — for the
    utility EVAL only (:func:`queries.q_dp_utility`), never a release.
    """
    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    parts: list[Column] = [F.lit(seed)]
    for c in key_cols:
        parts.append(F.lit(":"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    u = (F.conv(F.substring(F.md5(F.concat(*parts)), 1, 12), 16, 10)
         .cast("bigint"))
    cum = dp_noise_cdf(eps_e3, bound)
    noise = F.when(u < cum[0], -bound)
    for i in range(1, len(cum) - 1):
        noise = noise.when(u < cum[i], i - bound)
    noise = noise.otherwise(bound)
    released = (F.greatest(F.lit(0), F.col("_n") + noise)
                .cast("bigint").alias("released"))
    cols = [*key_cols, released]
    if keep_true:
        cols.append(F.col("_n").cast("bigint").alias("true_count"))
    return cnt.select(*cols)
