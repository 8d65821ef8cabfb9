"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as shuffled DataFrame plans (no driver-side
loops, no per-row Python):

- **exact**      — hash-groupBy on a content fingerprint (one shuffle)
- **MinHash+LSH** — shingle → k min-hashes → band buckets → candidate pairs
- **SimHash**    — per-token hash bit votes → b-bit signature per doc
- **n-gram Jaccard** — exact Jaccard on candidate pairs sharing a shingle

Determinism/scale design:
- md5 is the hash primitive (same hex in Spark and DuckDB → oracle-checkable;
  stable across executors/retries, unlike ``F.hash`` seeds across engines).
- Every pipeline is shuffle-bounded: explode-shingles → one groupBy per stage.
  At 100 TB the shingle explosion dominates; the stop-shingle cap (drop
  shingles appearing in > max_doc_freq docs) bounds the candidate-pair
  blowup that otherwise makes hot shingles quadratic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.parallel import fan_out

# -- shared helpers ---------------------------------------------------------


def _h64(col) -> F.Column:
    """Deterministic 48-bit hash from md5 hex — identical in Spark & DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) rows: lowercase \\W+ split, empties dropped.

    NULL text ≡ empty document (the repo-wide policy): coalesce before
    split, so a NULL doc contributes zero token rows by the same path as
    an empty one."""
    return (fan_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                          r"\W+")).alias("token"))
        .filter(F.length("token") > 0))


def _gram_array(toks_col: str, n: int) -> F.Column:
    """Word n-gram array over a token-array column (codegen, no Python).

    ``toks_col`` names the token array a prior ``_with_gram_tokens`` (or
    equivalent) projection added — taking the column name rather than the
    raw text makes that dependency explicit in the API.

    Built with ``concat_ws`` over ``try_element_at`` probes instead of
    ``array_join(slice(...))`` — slice allocates a fresh array per
    position, which made shingling O(len·n) allocations and dominated
    the similarity-join profile (4.4 s → 0.6 s per 5k docs at sf0.1).
    ``concat_ws`` skips the NULL probes past the end, so a doc shorter
    than n words still yields its full text as one gram, and empty docs
    yield '' (callers filter on length). Verified element-for-element
    identical to the slice formulation on the full sf0.1 corpus.
    """
    probes = ", ".join(f"try_element_at({toks_col}, i + {k})"
                       for k in range(n))
    return F.expr(f"""
        filter(transform(
            sequence(1, greatest(size({toks_col}) - {n - 1}, 1)),
            i -> concat_ws(' ', {probes})),
          g -> length(g) > 0)
    """)


def _with_gram_tokens(df: DataFrame, text_col: str) -> DataFrame:
    # coalesce: NULL text ≡ empty document (repo-wide NULL-text policy)
    return df.withColumn(
        "_sg_toks",
        F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         r"\W+"),
                 lambda t: F.length(t) > 0))


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document.

    Sliding n-gram via token array + transform over positions — stays
    JVM-side (no Python UDF); see _gram_array for the expression shape.
    """
    out = (_with_gram_tokens(fan_out(df), text_col)
           .select(F.col(id_col),
                   F.explode(_gram_array("_sg_toks", n)).alias("shingle")))
    return out.distinct()


# -- exact dedup ------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical content by md5 fingerprint; keep the smallest id.

    One shuffle on the fingerprint. At 100 TB, dedup over a 128-bit digest
    shuffles ~48 bytes/doc instead of the document bodies. NULL text
    fingerprints as the empty string (the text-operator NULL policy:
    NULL ≡ empty document), so NULL and '' docs land in ONE copy group
    instead of a separate all-NULL group.
    """
    return (df.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
        F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"),
             F.count("*").alias("copies")))


# -- MinHash + LSH ----------------------------------------------------------


#: Mersenne prime 2^31−1 — the modulus of the 2-universal seed family.
MINHASH_P = 2_147_483_647
#: 2^32 · golden ratio: decorrelates the additive term across seeds.
MINHASH_GOLD = 2_654_435_769


def minhash_signatures_wide(sh: DataFrame, id_col: str,
                            k: int = 16) -> DataFrame:
    """(id, sig: array<bigint> of length k): the whole signature in-row.

    The k seed hashes are derived arithmetically from a single base hash —
    ``h_s = (h0·(2s+1) + s·GOLD) mod P`` (2-universal over the Mersenne
    prime P=2^31−1; every intermediate fits int64 so the same expression is
    exact in DuckDB) — instead of k separate md5 calls. The per-doc minima
    are k array-element ``min`` aggregates over ONE shuffle of the
    (id, shingle-hash-array) rows: at 100 TB this is 1/k of the shuffle bytes
    and 1/k of the md5 work of the naive seed-explode plan. Downstream
    banding/similarity read array slots in-row, so the signature never
    becomes k rows anywhere in the pipeline.
    """
    h0 = _h64(F.col("shingle")) % MINHASH_P
    hs = F.array(*[
        (h0 * (2 * s + 1) + s * MINHASH_GOLD) % MINHASH_P for s in range(k)])
    return (sh.select(F.col(id_col), hs.alias("hs"))
            .groupBy(id_col)
            .agg(*[F.min(F.col("hs")[s]).alias(f"s{s}") for s in range(k)])
            .select(F.col(id_col),
                    F.array(*[F.col(f"s{s}") for s in range(k)])
                    .alias("sig")))


def minhash_signatures(sh: DataFrame, id_col: str, k: int = 16) -> DataFrame:
    """(id, seed, sig): long-form view of :func:`minhash_signatures_wide`
    for consumers that want one row per (doc, seed) — a narrow in-row
    unpivot of the wide signature, no extra shuffle."""
    wide = minhash_signatures_wide(sh, id_col, k)
    seed_sig = F.explode(F.array(*[
        F.struct(F.lit(s).alias("seed"), F.col("sig")[s].alias("sig"))
        for s in range(k)])).alias("p")
    return (wide.select(F.col(id_col), seed_sig)
            .select(F.col(id_col), F.col("p.seed"), F.col("p.sig")))


def _banded_wide(wide: DataFrame, id_col: str,
                 bands: int, rows: int) -> DataFrame:
    """(id, band, band_key) from a wide signature — a narrow in-row unpivot
    (band key = md5 of the band's slots joined in seed order, matching the
    SQL oracle's string_agg(sig, ',' ORDER BY seed)); no groupBy shuffle."""
    def key(b: int):
        return F.md5(F.concat_ws(",", *[
            F.col("sig")[b * rows + r].cast("string") for r in range(rows)]))
    return (wide.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), key(b).alias("band_key"))
            for b in range(bands)])).alias("p"))
        .select(F.col(id_col), F.col("p.band"), F.col("p.band_key")))


def banded_signatures(wide: DataFrame, id_col: str,
                      bands: int = 4, rows: int = 4) -> DataFrame:
    """Public banding step: (id, band, band_key) rows from a wide signature.

    The LSH bucket-assignment half of :func:`lsh_candidate_pairs_wide`,
    exposed for consumers that aggregate over buckets directly instead of
    self-joining them — e.g. near-duplicate decontamination's side-flag
    groupBy, which never materializes candidate pairs at all.
    """
    return _banded_wide(wide, id_col, bands, rows)


def lsh_pairs_from_banded(banded: DataFrame, id_col: str) -> DataFrame:
    """The bucket self-join half of :func:`lsh_candidate_pairs_wide`,
    over a PRECOMPUTED (id, band, band_key) table — for callers that
    already hold the banded table for other consumers (the streaming
    near-dup processor bands once per trigger and reuses it for the
    history probe, the within-batch pairs, and the survivor index
    write). Emits distinct (id_a < id_b) candidate pairs."""
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (a.join(b, ["band", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def lsh_candidate_pairs_wide(wide: DataFrame, id_col: str,
                             bands: int = 4, rows: int = 4) -> DataFrame:
    """Band a wide signature (bands × rows = k) and self-join band buckets.

    Emits distinct (id_a < id_b) candidate pairs. The join key is
    (band, md5-of-band-signature) so only exact band collisions pair up —
    the standard LSH guarantee that pair probability ≈ jaccard^rows per
    band. Banding is in-row, so the only shuffle is the bucket self-join
    (``bands`` rows per doc, vs k rows + a groupBy in the long-form plan).
    """
    return lsh_pairs_from_banded(_banded_wide(wide, id_col, bands, rows),
                                 id_col)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str,
                        bands: int = 4, rows: int = 4) -> DataFrame:
    """Long-form ``(id, seed, sig)`` adapter for
    :func:`lsh_candidate_pairs_wide` — re-assembles the per-doc signature
    (one groupBy) then bands in-row."""
    ordered_sigs = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "sig"))),
        lambda x: x["sig"])
    wide = (sigs.groupBy(id_col)
            .agg(ordered_sigs.alias("sig")))
    return lsh_candidate_pairs_wide(wide, id_col, bands, rows)


def minhash_similarity_wide(wide: DataFrame, pairs: DataFrame, id_col: str,
                            k: int = 16,
                            wide_b: DataFrame | None = None) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots, computed
    in-row over the paired wide signatures (zip_with + aggregate): the pair
    join carries one array cell per side instead of k rows, and there is no
    aggregation stage. ``wide_b`` supplies the id_b side's signatures when
    the pairs span TWO signature tables (e.g. the streaming processor's
    batch-vs-history verify); default is the self-join case."""
    wa = wide.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    wb = (wide if wide_b is None else wide_b).select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    matched = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v)
    return (pairs.join(wa, "id_a").join(wb, "id_b")
            .select("id_a", "id_b",
                    (matched / F.lit(k)).alias("est_jaccard")))


def minhash_similarity(sigs: DataFrame, pairs: DataFrame, id_col: str,
                       k: int = 16) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of matching sig slots
    (long-form ``(id, seed, sig)`` adapter)."""
    sa = sigs.select(F.col(id_col).alias("id_a"), "seed",
                     F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), "seed",
                     F.col("sig").alias("sig_b"))
    j = pairs.join(sa, "id_a").join(sb, ["id_b", "seed"])
    return (j.groupBy("id_a", "id_b")
             .agg((F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1)
                         .otherwise(0)) / F.lit(k)).alias("est_jaccard")))


def minhash_lsh_dedup(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, k: int = 16, bands: int = 4, rows: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket-join →
    estimate. All signature math runs on the wide in-row form: one shuffle
    builds the signatures, one self-join buckets them — the signature is
    never exploded to k rows anywhere."""
    sh = shingles(df, text_col, id_col, n)
    # pin the wide signature: the banding self-join reads it twice and
    # the similarity scorer twice more — unpinned, each consumer re-ran
    # the corpus shingle + signature chain (lazy checkpoint: one
    # materialization inside the caller's action; guide §2.4)
    wide = minhash_signatures_wide(sh, id_col, k).localCheckpoint(
        eager=False)
    pairs = lsh_candidate_pairs_wide(wide, id_col, bands, rows)
    sim = minhash_similarity_wide(wide, pairs, id_col, k)
    return sim.filter(F.col("est_jaccard") >= threshold)


# -- one-permutation MinHash ------------------------------------------------

#: densification offset: borrows from different rotation distances must
#: never collide with each other or with real minima, so the offset step
#: sits above the hash range (h < P < 2^31); C = 2^33 keeps the largest
#: densified slot under 2^38 — exact int64 in both engines.
OPH_DENSE_C = 1 << 33


def oph_signatures_wide(sh: DataFrame, id_col: str, k: int = 16) -> DataFrame:
    """One-permutation MinHash signatures (Li, Owen & Zhang, NIPS'12)
    with rotation densification (Shrivastava & Li, ICML'14): ONE hash
    per shingle partitions the hash space into k residue-class bins
    (``bucket = h mod k`` — the k bins of the single permutation);
    slot j is the min hash within bin j; an EMPTY bin borrows the
    first non-empty bin to its cyclic right plus ``C·distance``
    (rotation densification — the offset keeps different-distance
    borrows from colliding, preserving the collision-probability ≈
    Jaccard estimator on densified slots).

    Why it exists next to :func:`minhash_signatures_wide`: the classic
    signature evaluates a k-term multiply-mod chain per shingle; OPH
    computes the base hash once and the bin assignment once — per
    shingle the k-way work collapses to k cheap equality guards inside
    the same single-shuffle conditional-min aggregate (map-side
    partial, AQE-splittable, identical shuffle bytes: k int64 partial
    minima per (partition, doc)). At 100 TB the shingle-side CPU is
    the dominant signature cost and drops ~k-fold; the measured
    pair-recall price vs classic MinHash is the oph_recall driver row
    (the lsh_tuning measured-not-claimed precedent). Densification is
    an in-row k²-term coalesce over constants — whole-stage codegen,
    no extra shuffle, no window.

    The densification coalesce is k² constant terms, so keep k at the
    LSH-practical sizes (k ≤ 64; k=16 → 256 terms, k=64 → 4096 — still
    codegen-fine, but quadratic growth is the knob to watch, not the
    shuffle). Output: ``(id, sig: array<bigint> length k)`` —
    band-compatible with every downstream consumer of the wide MinHash
    signature
    (:func:`lsh_candidate_pairs_wide`, :func:`minhash_similarity_wide`,
    :func:`banded_signatures`). Docs with no shingles emit no row
    (identical to the classic path).
    """
    h0 = _h64(F.col("shingle")) % MINHASH_P
    sparse = (sh.select(F.col(id_col), (h0 % k).alias("_b"),
                        h0.alias("_h"))
              .groupBy(id_col)
              .agg(*[F.min(F.when(F.col("_b") == j, F.col("_h")))
                     .alias(f"s{j}") for j in range(k)]))
    dense = [F.coalesce(*[F.col(f"s{(j + d) % k}") + F.lit(d * OPH_DENSE_C)
                          for d in range(k)]).alias(f"d{j}")
             for j in range(k)]
    return sparse.select(F.col(id_col),
                         F.array(*dense).alias("sig"))


def oph_lsh_dedup(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3, k: int = 16, bands: int = 4, rows: int = 4,
                  threshold: float = 0.5) -> DataFrame:
    """:func:`minhash_lsh_dedup` with the one-permutation signature —
    same shingling, same banding, same slot-agreement estimator, same
    output shape; only the signature construction differs. Plan: one
    shuffle builds signatures, one self-join buckets them."""
    sh = shingles(df, text_col, id_col, n)
    # same wide-signature pin as minhash_lsh_dedup (4 consumers)
    wide = oph_signatures_wide(sh, id_col, k).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs_wide(wide, id_col, bands, rows)
    sim = minhash_similarity_wide(wide, pairs, id_col, k)
    return sim.filter(F.col("est_jaccard") >= threshold)


# -- SimHash ----------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """b-bit SimHash: per distinct token, hash → bit votes → sign per bit.

    The b vote sums are b conditional-sum aggregates in ONE groupBy(id) —
    no bit-dimension explode, no per-(id, bit) shuffle: the token rows are
    shuffled once at 1/b of the exploded plan's volume, and the b votes
    fold into the fingerprint in-row afterwards.
    """
    toks = tokens(df, text_col, id_col).distinct()
    hashed = toks.select(F.col(id_col), _h64(F.col("token")).alias("h"))
    vote = [F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1,
                         F.lit(1)).otherwise(F.lit(-1))).alias(f"b{b}")
            for b in range(bits)]
    per_doc = hashed.groupBy(id_col).agg(*vote)
    fingerprint = None
    for b in range(bits):
        c = F.when(F.col(f"b{b}") > 0,
                   F.lit(1 << b).cast("bigint")).otherwise(
                       F.lit(0).cast("bigint"))
        fingerprint = c if fingerprint is None else fingerprint + c
    return per_doc.select(F.col(id_col), fingerprint.alias("simhash"))


# -- n-gram Jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 5, max_doc_freq: int = 100,
                        threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard over word n-gram sets for pairs sharing a rare shingle.

    Stop-shingle cap: shingles in > max_doc_freq docs are dropped BEFORE the
    pair join — this is what keeps the candidate join from going quadratic on
    boilerplate at scale. Jaccard is still computed over full set sizes.
    """
    # pin the shingle table: THREE consumers (sizes, df-filter, the pair
    # join's both sides) would otherwise each re-run the corpus explode +
    # distinct (lazy checkpoint — materializes inside the caller's one
    # action; the lsh_tuning discipline, guide §2.4: don't re-derive)
    sh = shingles(df, text_col, id_col, n).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    # (id, shingle) rows are DISTINCT by construction (shingles()), so
    # count(*) == countDistinct(id): same df, one aggregation phase
    # instead of a distinct-expand pass over the biggest table
    rare = (sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle"))
    shr = sh.join(rare, "shingle").localCheckpoint(eager=False)
    a = shr.select(F.col(id_col).alias("id_a"), "shingle")
    b = shr.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (a.join(b, "shingle")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("n_shared")))
    sza = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    szb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    out = (shared.join(sza, "id_a").join(szb, "id_b")
           .withColumn("jaccard",
                       F.col("n_shared").cast("double")
                       / (F.col("size_a") + F.col("size_b") - F.col("n_shared"))))
    return (out.filter(F.col("jaccard") >= threshold)
               .select("id_a", "id_b", "n_shared", "jaccard"))


# -- near-dup clustering (connected components) -----------------------------


def _canon(df: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u > v, no self-loops,
    distinct. Both star operations consume and produce this shape."""
    return (df.filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"),
                    F.least("a", "b").alias("v"))
            .distinct())


def connected_components(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Exact connected components over a pair graph via alternating
    **large-star / small-star** (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) → ``(node, label)`` with
    label = component min.

    Each round:

    - **large-star**: for every node ``x``, connect each *larger* neighbor
      to ``m = min(Γ(x) ∪ {x})`` — a symmetric-edge groupBy-min + one join.
    - **small-star**: orient edges large→small; connect each smaller
      neighbor (and ``x`` itself) to the min — same shape, no symmetrize.

    Both are single-shuffle DataFrame ops, and the round count is
    **O(log d)** in the component diameter (each round roughly halves path
    lengths), vs O(d) for plain min-label propagation — a 1000-long dup
    chain converges in ~10 rounds, not 1000. The fixed point is a star per
    component (every node points at its component min). Detection costs ONE
    job per round: both edge sets are distinct+canonical, so set equality
    reduces to (count, order-insensitive checksum) computed in the same
    aggregation — no second exceptAll/isEmpty job (round-3 verdict: the two
    extra convergence jobs per round were most of the query's runtime). The
    checksum is two independent 64-bit xxhash sums accumulated in
    decimal(38,0) (exact, order-independent, overflow-free); a false
    "converged" needs a simultaneous 128-bit collision between consecutive
    rounds — ~2⁻¹²⁸, far below any hardware error rate.
    ``localCheckpoint`` truncates lineage so plan size stays O(1) across
    rounds; per-round driver traffic is three scalars.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without reaching the
    fixed point — a partially-propagated labeling is silently *wrong* (it
    splits one true cluster into several), so the cap is a safety valve, not
    an output mode.
    """
    def _stats(df: DataFrame) -> tuple:
        # one job: size + two order-insensitive set checksums
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64("v", "u").cast("decimal(38,0)")).alias("h2"),
        ).collect()[0]
        return (row["n"], row["h1"], row["h2"])

    E = _canon(pairs.select(F.col(pairs.columns[0]).cast("bigint").alias("a"),
                            F.col(pairs.columns[1]).cast("bigint").alias("b"))
               ).localCheckpoint(eager=False)
    stats = _stats(E)
    converged = stats[0] == 0
    for _ in range(max_iter):
        if converged:
            break
        # large-star: symmetric neighborhoods, min over Γ(x) ∪ {x}
        sym = E.select("u", "v").union(
            E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        big = sym.groupBy("u").agg(F.min("v").alias("mn"))
        big = big.select("u", F.least("u", "mn").alias("m"))
        # ls is already oriented (v > u ≥ m, so left > right) and the
        # small-star min aggregates are duplicate-insensitive — no distinct
        # pass between the stars (its shuffle + checkpoint cost a full
        # stage per round; duplicate inflation is bounded at 2× for one
        # round and vanishes in E_new's canon)
        E1 = (sym.join(big, "u").filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
        # small-star: edges oriented u > v; min smaller-neighbor
        small = E1.groupBy("u").agg(F.min("v").alias("m"))
        ss = (E1.join(small, "u")
              .select(F.col("v").alias("a"), F.col("m").alias("b"))
              .union(small.select(F.col("u").alias("a"),
                                  F.col("m").alias("b"))))
        E_new = _canon(ss).localCheckpoint(eager=False)
        # fixed point ⇔ identical distinct canonical set ⇔ identical stats
        new_stats = _stats(E_new)
        converged = new_stats == stats
        E, stats = E_new, new_stats
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ≈ log2 of the largest component "
            "diameter)")
    # fixed point is a star per component: non-roots appear as u with their
    # root as v; roots appear only as v (label themselves)
    leaves = E.groupBy("u").agg(F.min("v").alias("label"))
    roots = E.select(F.col("v").alias("u"), F.col("v").alias("label"))
    return (leaves.union(roots).groupBy("u").agg(F.min("label").alias("label"))
            .withColumnRenamed("u", "node"))


def neardup_clusters(df: DataFrame, text_col: str, id_col: str,
                     pairs: DataFrame | None = None,
                     n: int = 5, max_doc_freq: int = 100,
                     threshold: float = 0.2, max_iter: int = 30) -> DataFrame:
    """Connected components over near-dup pairs → one canonical doc per
    cluster (the min id), the decision step of a dedup pipeline.

    Components run over ONLY the pair graph (dup pairs, not the corpus —
    tiny by comparison); untouched docs join back as singletons at the end.
    See :func:`connected_components` for the large-star/small-star rounds
    and the convergence guarantee (raises rather than returning a
    partially-merged clustering).
    """
    if pairs is None:
        pairs = ngram_jaccard_pairs(df, text_col, id_col, n, max_doc_freq,
                                    threshold)
    labels = connected_components(pairs.select("id_a", "id_b"), max_iter)
    clustered = labels.withColumnRenamed("node", id_col)
    return (df.select(F.col(id_col).cast("bigint").alias(id_col))
            .join(clustered, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("label"), F.col(id_col))
                    .alias("cluster_id"))
            .withColumn("is_canonical",
                        F.col(id_col) == F.col("cluster_id")))


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    local fingerprinting algorithm): hash every word ``k``-gram, then keep
    the MINIMUM hash of each ``w``-wide sliding window over the hash
    sequence. Guarantees every shared substring of ≥ w+k-1 words
    contributes at least one shared fingerprint, at ~1/w the density of
    keeping every gram — the property n-gram sampling lacks.

    Pure per-row expressions end-to-end: gram hashes and window minima
    compute IN-ROW over the token array (md5-derived 32-bit ints, engine-
    portable); output is one row per distinct (doc, fingerprint). Docs
    shorter than k+w-1 words emit the minimum over whatever windows exist
    (<k words: none).
    """
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                          r"\W+"),
                    lambda t: F.length(t) > 0)
    base = df.select(F.col(id_col), toks.alias("toks"))
    grams = (f"transform(sequence(0, greatest(size(toks) - {k}, 0)), "
             f"i -> CAST(conv(substr(md5(concat_ws(' ', "
             f"slice(toks, i + 1, {k}))), 1, 8), 16, 10) AS BIGINT))")
    mins = (f"transform(sequence(0, greatest(size(_g) - {w}, 0)), "
            f"j -> array_min(slice(_g, j + 1, {w})))")
    return (base.filter(F.size("toks") >= k)
            .select(F.col(id_col), F.expr(grams).alias("_g"))
            .select(F.col(id_col), F.explode(
                F.array_distinct(F.expr(mins))).alias("fingerprint")))


def winnow_pairs(df: DataFrame, text_col: str, id_col: str,
                 k: int = 3, w: int = 4, min_shared: int = 2,
                 max_doc_freq: int = 50) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints — the
    MOSS similarity join: docs sharing ≥ ``min_shared`` selected
    fingerprints, with the shared count and an e9 containment ratio
    (shared / smaller doc's fingerprint count).

    Scale shape: the fingerprint table is ~|words|/w rows; pairs come from
    a fingerprint-bucket self-join (never all-pairs), and fingerprints in
    more than ``max_doc_freq`` docs are dropped first — the stop-shingle
    cap that keeps boilerplate buckets from going quadratic (same rule as
    ngram_jaccard_pairs).
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, w)
    per_doc = fps.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    rare = (fps.groupBy("fingerprint")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_doc_freq).select("fingerprint"))
    kept = fps.join(rare, "fingerprint")
    a = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_b"))
    shared = (a.join(b, "fingerprint")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    na = per_doc.select(F.col(id_col).alias("id_a"),
                        F.col("n_fp").alias("n_a"))
    nb = per_doc.select(F.col(id_col).alias("id_b"),
                        F.col("n_fp").alias("n_b"))
    return (shared.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b", "n_shared",
                    F.expr("n_shared * 1000000000 div "
                           "least(n_a, n_b)").alias("containment_e9")))


# -- set-similarity join with prefix filtering (PPJoin-style) ---------------


def prefix_filter_jaccard(df: DataFrame, text_col: str, id_col: str,
                          threshold_e2: int = 50, shingle_n: int = 3,
                          max_doc_freq: int = 1000) -> DataFrame:
    """Exact shingle-set Jaccard join with PPJoin-style prefix filtering
    (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW'08 — public algorithm; the reference has no
    similarity operators, SURVEY §0).

    Set elements are distinct word ``shingle_n``-grams (unigrams collide
    massively on small vocabularies — n-grams make the sets
    discriminative), md5-hashed to 48-bit ints IN-ROW before any shuffle:
    8-byte keys instead of ~30-byte strings cut every downstream
    exchange, sort, and array payload ~4×, and because both engines hash
    identically the (astronomically rare) collision changes both sides
    the same way — hash parity is unconditional. Candidate generation
    does NOT join on every shared element: each document's set is
    ordered rarest-first by global document frequency, and only the
    first ``s − ⌈τ·s⌉ + 1`` elements (the *prefix*) participate in the
    self-join — two sets with Jaccard ≥ τ must share at least one prefix
    element, so the pruning is lossless, and the prefix pivots on the
    RAREST elements, which is what keeps bucket sizes small at scale (a
    frequency cap backstops adversarial corpora). Matches then pass
    PPJoin's positional filter — from match positions (i, j) the best
    possible overlap is ``1 + min(s_a − i, s_b − j)``, which must reach
    ``⌈τ·(s_a+s_b)/(1+τ)⌉`` — before candidates verify IN-ROW against
    the full sorted element arrays (``array_intersect``); arrays shuffle
    only for candidate pairs.

    ``threshold_e2`` is τ in integer hundredths; all arithmetic is
    integer (``(τ_e2·s + 99) div 100`` is ⌈τ·s⌉ for positive s) so the
    result is bit-identical across engines. Output: (id_a, id_b,
    n_shared, jaccard_e9) for pairs with Jaccard ≥ τ.
    Plan shape: each document's distinct hashed shingle set builds
    IN-ROW (``array_distinct`` + ``array_sort`` — no corpus-wide
    ``distinct()`` shuffle) and is localCheckpoint-ed once for its five
    consumers (the dedup_clusters multi-pass trade); the corpus-sized
    shuffles are exactly the unavoidable ones — the document-frequency
    groupBy, the frequency join + per-doc rank window, and the prefix
    self-join. The verification joins move the shingle ARRAYS, but only
    for |candidate| rows, not |corpus|.
    """
    from pyspark.sql.window import Window

    hashed = F.expr(
        "transform(_sg_grams, g ->"
        " cast(conv(substring(md5(g), 1, 12), 16, 10) as bigint))")
    # empty docs filter on the TOKEN array, before the gram projection:
    # a filter on size(toks) placed after it would be pushed down with
    # the whole gram+hash expression cascade inlined into the predicate
    # (split() re-evaluated per element probe — measured 35× slower).
    # ≥1 token ⟺ ≥1 gram, since concat_ws skips the NULL probes.
    base = (_with_gram_tokens(fan_out(df), text_col)
            .filter(F.size("_sg_toks") > 0)
            .withColumn("_sg_grams", _gram_array("_sg_toks", shingle_n))
            .select(F.col(id_col),
                    F.array_sort(F.array_distinct(hashed)).alias("toks"))
            .withColumn("set_size", F.size("toks").cast("bigint"))
            .localCheckpoint())
    tok = base.select(id_col, "set_size", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count("*").alias("_df"))
    ranked = (tok.join(dfreq, "token")
              .filter(F.col("_df") <= max_doc_freq)
              .withColumn("_pos", F.row_number().over(
                  Window.partitionBy(id_col).orderBy("_df", "token"))
                  .cast("bigint")))
    prefix = ranked.filter(
        F.col("_pos") <= F.col("set_size")
        - F.expr(f"({threshold_e2} * set_size + 99) div 100") + 1)
    a = prefix.select(F.col(id_col).alias("id_a"), "token",
                      F.col("set_size").alias("size_a"),
                      F.col("_pos").alias("pos_a"))
    b = prefix.select(F.col(id_col).alias("id_b"), "token",
                      F.col("set_size").alias("size_b"),
                      F.col("_pos").alias("pos_b"))
    # required overlap o = ⌈τ·(s_a+s_b)/(1+τ)⌉, integer form
    o_req = F.expr(f"({threshold_e2} * (size_a + size_b)"
                   f" + {100 + threshold_e2} - 1) div {100 + threshold_e2}")
    cand = (a.join(b, "token")
            .filter(F.col("id_a") < F.col("id_b"))
            # length filter: Jaccard ≥ τ ⇒ min(s)·100 ≥ τ_e2·max(s)
            .filter(F.least("size_a", "size_b") * 100
                    >= F.lit(threshold_e2) * F.greatest("size_a", "size_b"))
            # positional filter (PPJoin): a pair survives only if SOME
            # match position still allows the required overlap
            .filter(F.lit(1)
                    + F.least(F.col("size_a") - F.col("pos_a"),
                              F.col("size_b") - F.col("pos_b")) >= o_req)
            .select("id_a", "id_b").distinct())
    aa = base.select(F.col(id_col).alias("id_a"),
                     F.col("toks").alias("toks_a"))
    ab = base.select(F.col(id_col).alias("id_b"),
                     F.col("toks").alias("toks_b"))
    out = (cand.join(aa, "id_a").join(ab, "id_b")
           .withColumn("n_shared",
                       F.size(F.array_intersect("toks_a", "toks_b"))
                        .cast("bigint"))
           .withColumn("_union",
                       F.size("toks_a") + F.size("toks_b")
                       - F.col("n_shared")))
    return (out.filter(F.col("n_shared") * 100
                       >= F.lit(threshold_e2) * F.col("_union"))
            .select("id_a", "id_b", "n_shared",
                    F.expr("n_shared * 1000000000 div _union")
                     .alias("jaccard_e9")))


def lsh_tuning(df: DataFrame, text_col: str, id_col: str, n: int = 3,
               k: int = 16,
               settings: tuple[tuple[int, int], ...] = ((16, 1), (8, 2),
                                                        (4, 4), (2, 8)),
               threshold: float = 0.5,
               max_doc_freq: int = 100) -> DataFrame:
    """LSH banding parameter sweep — the tuning report run BEFORE
    committing a (bands, rows) choice for a corpus-wide MinHash dedup:
    per setting, candidate volume and recall/precision against exact
    n-gram Jaccard ≥ ``threshold``. More bands of fewer rows → higher
    recall and more candidates (collision prob ≈ 1-(1-J^rows)^bands);
    the report quantifies that tradeoff ON THE ACTUAL CORPUS instead of
    the uniform-similarity assumption the formula makes.

    Cost shape: shingles and the k-hash wide signature are computed
    ONCE (one corpus shuffle); each setting re-bands the in-row
    signature (narrow explode, bands rows/doc) and self-joins its
    buckets — the same bounded shape as lsh_candidate_pairs_wide. The
    exact ground truth uses the stop-shingle-capped postings join of
    ngram_jaccard_pairs. Truth and signature subtrees are localCheckpoint
    -pinned so the settings loop re-reads them instead of re-deriving.
    """
    sh = shingles(df, text_col, id_col, n).localCheckpoint(eager=False)
    wide = minhash_signatures_wide(sh, id_col, k).localCheckpoint(
        eager=False)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    # distinct (id, shingle) rows ⇒ count(*) == countDistinct(id); the
    # plain count skips the distinct-expand phase (same as
    # ngram_jaccard_pairs)
    rare = (sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle"))
    # pin the rare-filtered table too: the pair join reads it TWICE
    shr = sh.join(rare, "shingle").localCheckpoint(eager=False)
    a = shr.select(F.col(id_col).alias("id_a"), "shingle")
    b = shr.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (a.join(b, "shingle")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("n_shared")))
    sza = sizes.select(F.col(id_col).alias("id_a"),
                       F.col("set_size").alias("size_a"))
    szb = sizes.select(F.col(id_col).alias("id_b"),
                       F.col("set_size").alias("size_b"))
    truth = (shared.join(sza, "id_a").join(szb, "id_b")
             .filter(F.col("n_shared").cast("double")
                     / (F.col("size_a") + F.col("size_b")
                        - F.col("n_shared")) >= threshold)
             .select("id_a", "id_b")
             .withColumn("_true", F.lit(1))
             .localCheckpoint(eager=False))
    reports = []
    for bands, rows in settings:
        if bands * rows != k:
            raise ValueError(f"setting {bands}x{rows} != k={k}")
        cand = lsh_candidate_pairs_wide(wide, id_col, bands, rows)
        stats = (cand.join(truth, ["id_a", "id_b"], "left")
                 .agg(F.count("*").alias("n_candidates"),
                      F.coalesce(F.sum(F.coalesce("_true", F.lit(0))),
                                 F.lit(0)).cast("bigint")
                      .alias("hits")))
        totals = truth.agg(F.count("*").alias("true_pairs"))
        reports.append(
            stats.join(F.broadcast(totals))
            .select(F.lit(bands).alias("bands"),
                    F.lit(rows).alias("rows_per_band"),
                    "n_candidates", "true_pairs", "hits",
                    (F.col("hits").cast("double")
                     / F.greatest("true_pairs", F.lit(1)))
                    .alias("recall"),
                    (F.col("hits").cast("double")
                     / F.greatest("n_candidates", F.lit(1)))
                    .alias("precision")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("rows_per_band")


def _order_preserving_rank(df: DataFrame, key_col: str, id_col: str,
                           prefix_len: int = 2) -> DataFrame:
    """Dense global rank 0..N-1 by ``(key, id)`` WITHOUT a global
    single-partition sort — the order-preserving sibling of
    layout.global_index's two-pass ranking (TeraSort rank assignment):

    bucket by the key's first ``prefix_len`` CHARACTERS. A string
    prefix is monotone under binary collation (``k1 <= k2`` implies
    ``prefix(k1) <= prefix(k2)``, and UTF-8 byte order preserves
    codepoint order), so bucket order == key order and

        rank = bucket_offset + row_number within bucket

    equals ``row_number() OVER (ORDER BY key, id) - 1`` exactly — the
    plain-SQL oracle form. Every corpus-sized stage is bucket-parallel;
    the only single-partition work is the prefix-sum window over the
    O(distinct-prefix) bucket counts (same accepted shape as
    layout.global_index's 64-row offsets leg). Parallelism is bounded
    by the number of distinct key prefixes — the documented range-
    partitioning tradeoff (a heavier production pass would sample
    boundaries like Spark's own range partitioner; prefix buckets keep
    the rank a pure function of the data so the DuckDB twin matches
    bit-for-bit)."""
    from pyspark.sql.window import Window

    keyed = df.select(F.col(id_col), F.col(key_col).alias("_k"),
                      F.substring(F.col(key_col), 1, prefix_len)
                      .alias("_b"))
    wb = Window.partitionBy("_b").orderBy("_k", id_col)
    ranked = keyed.withColumn("_pos", F.row_number().over(wb))
    wo = (Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (keyed.groupBy("_b")
               .agg(F.count("*").alias("_n"))
               .withColumn("_off", F.coalesce(F.sum("_n").over(wo),
                                              F.lit(0).cast("bigint"))))
    return (ranked.join(F.broadcast(offsets.select("_b", "_off")), "_b")
            .select(F.col(id_col),
                    (F.col("_off") + F.col("_pos") - 1).alias("_r")))


def _ascii_fold(col: Column) -> Column:
    """Strip non-ASCII code points from a blocking key. Derived SNM
    keys built from ``reverse`` or ``length`` must be engine-portable:
    Spark reverses CODE POINTS while DuckDB reverses GRAPHEME CLUSTERS,
    so ``reverse('e' + U+0301)`` differs between engines and a
    combining character anywhere in the corpus silently reorders the
    reverse pass (r8 ADVICE). Folding to pure ASCII first makes
    code points == graphemes == bytes, so every derived-key function
    agrees everywhere; the VERIFY step still runs on the original
    text. Java regex and RE2 both treat ``[^\\x00-\\x7F]`` as
    a code-point class, so the fold itself is portable too."""
    return F.regexp_replace(col, r"[^\x00-\x7F]", "")


#: Hernandez-Stolfo multi-pass blocking keys, each a function of the
#: normalized (lowercased) text.  ``fwd`` sorts by the text itself;
#: ``rev`` by the reverse of the ASCII-folded text (catches dups that
#: diverge in their first characters); ``init_len`` by first character
#: + zero-padded length + text (the paper's "different key per pass"
#: prescription — groups same-initial, similar-length records that
#: neither lexicographic pass places adjacently).  Every derived key
#: folds to ASCII first so reverse/length are engine-portable (see
#: :func:`_ascii_fold`).
SNM_PASS_KEYS: "dict[str, Callable[[Column], Column]]" = {
    "fwd": lambda k: k,
    "rev": lambda k: F.reverse(_ascii_fold(k)),
    "init_len": lambda k: F.concat(
        F.substring(_ascii_fold(k), 1, 1),
        F.lpad(F.length(_ascii_fold(k)).cast("string"), 6, "0"),
        _ascii_fold(k)),
}


def sorted_neighborhood_pairs(df: DataFrame, text_col: str, id_col: str,
                              window: int = 8,
                              pass_names: "tuple[str, ...]" = ("fwd",
                                                               "rev"),
                              ) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo,
    SIGMOD'95): sort records by a blocking key, compare each record
    only with the ``window`` records that follow it in sort order —
    O(n·w) candidate pairs instead of the O(n²) cross join — then
    verify candidates exactly. The classic entity-resolution
    counterpart to shingle blocking (dedup_edit_distance) and LSH
    banding (dedup_minhash_lsh): no tokenization at all, just ordering,
    so it catches near-dups those methods price differently (shared
    long prefixes/suffixes).

    Multi-pass, as the paper prescribes (a single key misses dups that
    diverge in their first characters): ``pass_names`` selects from
    :data:`SNM_PASS_KEYS` (default ``fwd`` = normalized text, ``rev`` =
    reverse of the ASCII-folded text; ``init_len`` adds a third
    first-char+length key), and pairs are unioned with a per-pair
    pass count. Derived keys ASCII-fold before reverse/length so both
    engines order identically even with combining characters (see
    :func:`_ascii_fold`). Distributed shape: global ranks come from the
    order-preserving two-pass ranking (no single-partition sort),
    checkpoint-pinned per pass because both join legs read it; banded
    pairing joins on ``floor(rank / window)`` blocks — the left side is
    emitted to its own block and the next (2× fan-out of ids only), the
    right side to its own, so every pair ``0 < r_b - r_a <= window`` is
    matched exactly once and nothing corpus-sized shuffles twice. Texts
    join back only for the O(n·w) surviving candidates, through an
    EXPLICIT repartition on the pair key: the candidate shuffle is tiny
    in bytes, so AQE would coalesce it to one partition and serialize
    the O(len²)-per-row Levenshtein verify — partitions here must be
    sized by compute, not bytes (measured 27 s → 3 s on 40k pairs).
    The verify keeps pairs with distance <= max_len/5 (integer
    comparison, no floats), computed with the BANDED threshold form of
    levenshtein so rejected pairs cost O(len·band) not O(len²)."""
    key = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(F.col(id_col), key.alias("_key"))
    par = df.sparkSession.sparkContext.defaultParallelism
    passes = []
    for pname in pass_names:
        kcol = SNM_PASS_KEYS[pname](F.col("_key"))
        ranked = _order_preserving_rank(
            base.select(id_col, kcol.alias("_pk")), "_pk", id_col
        ).localCheckpoint(eager=False)
        blk = (F.col("_r") / window).cast("bigint")
        left = ranked.select(F.col(id_col).alias("_ia"),
                             F.col("_r").alias("_ra"),
                             F.explode(F.array(blk, blk + 1))
                             .alias("_blk"))
        right = ranked.select(F.col(id_col).alias("_ib"),
                              F.col("_r").alias("_rb"),
                              blk.alias("_blk"))
        pairs = (left.join(right, "_blk")
                 .filter((F.col("_rb") > F.col("_ra"))
                         & (F.col("_rb") <= F.col("_ra") + window))
                 .select(F.least("_ia", "_ib").alias("id_a"),
                         F.greatest("_ia", "_ib").alias("id_b")))
        passes.append(pairs.withColumn("_pass", F.lit(pname)))
    cand = passes[0]
    for p in passes[1:]:
        cand = cand.unionByName(p)
    cand = (cand
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_passes"))
            .repartition(par))
    ta = df.select(F.col(id_col).alias("id_a"),
                   F.coalesce(F.col(text_col), F.lit("")).alias("_ta"))
    tb = df.select(F.col(id_col).alias("id_b"),
                   F.coalesce(F.col(text_col), F.lit("")).alias("_tb"))
    # banded verify: the oracle's predicate is edit*5 <= max_len, i.e.
    # edit <= floor(max_len/5) (integer distance), so Spark's THRESHOLD
    # form computes only the |i-j| <= max_len/5 DP band — O(len·len/5)
    # instead of O(len²) — short-circuits on length difference (the
    # |la-lb| lower bound), and returns -1 above the band; keeping
    # d >= 0 rows is bit-identical to the full-distance filter, and d
    # itself is the exact distance for every survivor.
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .withColumn("max_len",
                        F.greatest(F.length("_ta"), F.length("_tb"))
                        .cast("bigint"))
            .withColumn("edit_distance",
                        F.expr("levenshtein(_ta, _tb, "
                               "cast(max_len div 5 as int))")
                        .cast("bigint"))
            .filter(F.col("edit_distance") >= 0)
            .select("id_a", "id_b", "n_passes", "edit_distance",
                    "max_len"))
