"""Stateless stream-side curation filters.

The decontamination family (queries.q_decontamination* /
q_embedding_decontamination) is batch-shaped: it reports which EVAL
items a finished training corpus contaminates. The production
streaming need is the transpose: every arriving TRAINING document must
be checked against the (small, fixed) benchmark suite and flagged
before it lands — a pure per-row decision, so the streaming form is a
stateless projection: no state store, no watermark, no output-mode
constraints, and replays trivially produce identical flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_decontaminate(train: DataFrame, eval_df: DataFrame,
                            id_col: str = "id",
                            vec_col: str = "embedding",
                            planes: int = 8,
                            threshold_e6: int = 400_000) -> DataFrame:
    """Embedding-space decontamination ON the ingest stream: flag every
    arriving training vector whose exact quantized cosine against any
    benchmark vector in its hyperplane-LSH bucket reaches the
    threshold — the same bucket + cosine decision as
    q_embedding_decontamination, transposed to the training side.

    The eval suite is bounded (benchmark sets are tiny next to a
    training corpus), so its per-bucket quantized vectors inline as ONE
    literal map — the label_prototypes broadcast-literal discipline:
    O(|eval| · dim) constants, never a join. Everything on the stream
    is in-row (signature, bucket probe, argmax cosine), so the plan is
    a stateless projection: works in append mode with no watermark and
    absorbs at-least-once replays by construction. Zero-norm vectors
    score cos := 0 (the repo convention).

    Returns the stream with ``bucket``, ``n_eval_candidates``,
    ``max_cos_e6`` and ``contaminated`` appended; the caller filters
    ``~contaminated`` to pass clean rows through.
    """
    from kafka_connect_streams_spark.operators.similarity import (
        _dot, _qvecs, _vec_dims, _hyperplane_proj, _quantized,
        hyperplane_signatures)
    dims = _vec_dims(eval_df.select(F.col(vec_col)), vec_col)
    ev = (_qvecs(eval_df, id_col, vec_col, "_eid", "_ev", "_en")
          .join(hyperplane_signatures(eval_df, id_col, vec_col,
                                      planes=planes)
                .select(F.col(id_col).alias("_eid"), "bucket"), "_eid")
          .collect())
    by_bucket: dict[int, list] = {}
    for r in ev:
        by_bucket.setdefault(int(r.bucket), []).append(r)
    base = train.select(
        "*", _quantized(F.col(vec_col)).alias("_v"))
    base = base.withColumn("_nv", _dot(F.col("_v"), F.col("_v")))
    bucket = F.expr("cast(0 as bigint)")
    for p in range(planes):
        bucket = bucket + F.when(_hyperplane_proj(p, dims) > 0,
                                 F.lit(1 << p).cast("bigint")) \
                           .otherwise(F.lit(0).cast("bigint"))
    base = base.withColumn("bucket", bucket)
    if by_bucket:
        entries = []
        for b, rows in sorted(by_bucket.items()):
            structs = ", ".join(
                "named_struct('en', {}L, 'ev', array({}))".format(
                    int(r._en), ", ".join(f"{int(x)}L" for x in r._ev))
                for r in rows)
            entries.append(f"{b}L, array({structs})")
        cands = (f"coalesce(element_at(map({', '.join(entries)}), bucket), "
                 "cast(array() as array<struct<en: bigint, "
                 "ev: array<bigint>>>))")
        cos = """CASE WHEN _nv > 0 AND e.en > 0
            THEN cast(floor(cast(aggregate(zip_with(_v, e.ev,
                     (x, y) -> x * y), cast(0 as bigint),
                     (a, v) -> a + v) as double)
                 / sqrt(cast(_nv as double) * cast(e.en as double))
                 * 1e6) as bigint)
            ELSE cast(0 as bigint) END"""
        out = (base
               .withColumn("_cands", F.expr(cands))
               .withColumn("n_eval_candidates",
                           F.size("_cands").cast("bigint"))
               .withColumn("max_cos_e6", F.coalesce(
                   F.expr(f"array_max(transform(_cands, e -> {cos}))"),
                   F.lit(0).cast("bigint")))
               .withColumn("contaminated",
                           F.col("max_cos_e6") >= threshold_e6))
    else:
        out = (base
               .withColumn("n_eval_candidates", F.lit(0).cast("bigint"))
               .withColumn("max_cos_e6", F.lit(0).cast("bigint"))
               .withColumn("contaminated", F.lit(False)))
    return out.drop("_v", "_nv")


def streaming_decontaminate_ngram(train: DataFrame, eval_df: DataFrame,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  n: int = 5,
                                  m_bits: int = 65536,
                                  n_hashes: int = 3) -> DataFrame:
    """N-gram benchmark decontamination ON the ingest stream — the
    published-eval method (q_decontamination_ngram) transposed to the
    training side: every arriving document counts how many of its word
    ``n``-grams appear ANYWHERE in the bounded eval suite, entirely
    in-row.

    Two-tier membership, exact output: each gram's 48-bit md5 hash
    first probes a Bloom BITMAP of the eval suite's gram set
    (``m_bits`` bits packed into ``m_bits/64`` bigint words inlined as
    one literal — O(1) per probe via word-index + shift, the
    runtime-bloom-filter trick made explicit), and only Bloom HITS pay
    the exact ``array_contains`` scan of the sorted eval-hash literal —
    so the common all-clean row costs ``grams × n_hashes`` constant
    probes and the final count is EXACT (the Bloom is a fast path,
    never the answer; hash family = the CMS md5-affine rows, same as
    membership.bloom_positions). Stateless: append mode, no watermark,
    no state store; replays re-emit identical flags.

    The eval-suite gram set is bounded (benchmark suites), so both
    literals are O(|eval grams|) constants — the label_prototypes
    broadcast-literal discipline. At very large suites, raise
    ``m_bits`` (fp rate only affects the fast-path hit rate, never
    correctness).
    """
    from kafka_connect_streams_spark.operators.dedup import (_gram_array,
                                                             shingles)
    ev = (shingles(eval_df, text_col, id_col, n=n)
          .select(F.expr("cast(conv(substring(md5(shingle), 1, 12), 16, 10)"
                         " as bigint)").alias("h"))
          .distinct().collect())
    fps = sorted({int(r.h) for r in ev})
    base = train.withColumn(
        "_sg_toks",
        F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         r"\W+"),
                 lambda t: F.length(t) > 0))
    # DISTINCT grams — the batch shingles() convention: a doc repeating
    # one n-gram contributes it once to both n_grams and the hit count
    gexpr = F.array_distinct(_gram_array("_sg_toks", n))
    if not fps:
        return (base
                .withColumn("n_grams", F.size(gexpr).cast("bigint"))
                .withColumn("n_contaminated", F.lit(0).cast("bigint"))
                .withColumn("contaminated", F.lit(False))
                .drop("_sg_toks"))
    words = [0] * ((m_bits + 63) // 64)
    for h in fps:
        for r in range(n_hashes):
            a, b = 2 * r + 1, 104729 * (r + 1)
            pos = ((h * a + b) % 2147483647) % m_bits
            words[pos >> 6] |= 1 << (pos & 63)
    # pack to SIGNED int64 for the literal (Python ints > 2^63-1 won't
    # parse as bigint literals)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bm = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    ev_lit = "array(" + ", ".join(f"{h}L" for h in fps) + ")"
    probes = " AND ".join(
        f"(shiftright(element_at({bm}, cast("
        f"(((h * {2 * r + 1} + {104729 * (r + 1)}) % 2147483647)"
        f" % {m_bits}) div 64 as int) + 1), "
        f"cast((((h * {2 * r + 1} + {104729 * (r + 1)})"
        f" % 2147483647) % {m_bits}) % 64 as int)) & 1) = 1"
        for r in range(n_hashes))
    hits = f"""size(filter(
        transform(_grams, g -> cast(conv(substring(md5(g), 1, 12), 16, 10)
                                    as bigint)),
        h -> ({probes}) AND array_contains({ev_lit}, h)))"""
    return (base
            .withColumn("_grams", gexpr)
            .withColumn("n_grams", F.size("_grams").cast("bigint"))
            .withColumn("n_contaminated", F.expr(hits).cast("bigint"))
            .withColumn("contaminated", F.col("n_contaminated") > 0)
            .drop("_sg_toks", "_grams"))


def streaming_decontaminate_fingerprint(train: DataFrame,
                                        eval_df: DataFrame,
                                        text_col: str = "text",
                                        id_col: str = "doc_id",
                                        k: int = 16, bands: int = 4,
                                        rows: int = 4,
                                        n: int = 3) -> DataFrame:
    """Exact + MinHash-LSH decontamination ON the ingest stream — the
    remaining two legs of the batch family (q_decontamination /
    q_decontamination_minhash) transposed to the training side, so all
    four modes (exact, n-gram, MinHash, embedding) now run as stateless
    per-row stream filters.

    Per arriving document, entirely in-row:

    - ``contaminated_exact``: its canonical token-set fingerprint
      (operators/text.fingerprint convention) is in the eval suite's
      fingerprint set — inlined as one sorted literal array.
    - ``near_contaminated``: any of its ``bands`` MinHash band keys
      lands in the eval suite's band buckets. The signature is the
      dedup machinery's exact arithmetic (48-bit md5 gram hash; seed s
      = (h·(2s+1) + s·GOLD) mod P) folded in-row: ``sig[s] =
      array_min`` over the gram hashes (min over duplicates == min
      over distinct, so no per-doc distinct pass is needed), band key
      = md5 of the band's slots in seed order — byte-identical to
      banded_signatures, so a bucket collision here IS the batch
      operator's collision.

    Documents with zero shingles have no signature (the batch
    convention: no sh rows → never banded) → ``near`` is false.
    Stateless append-mode projection; replay-stable by construction.
    Eval suites are bounded → both literals are O(|eval|) constants
    (the label_prototypes broadcast-literal discipline).
    """
    from kafka_connect_streams_spark.operators.dedup import (
        MINHASH_GOLD, MINHASH_P, banded_signatures,
        minhash_signatures_wide, shingles)
    from kafka_connect_streams_spark.operators.text import fingerprint

    ev_fp = sorted({r.fingerprint for r in
                    fingerprint(eval_df, text_col, id_col)
                    .select("fingerprint").collect()})
    ev_banded = (banded_signatures(
        minhash_signatures_wide(
            shingles(eval_df, text_col, id_col, n=n), id_col, k=k),
        id_col, bands=bands, rows=rows)
        .select("band", "band_key").distinct().collect())
    by_band: dict[int, list[str]] = {}
    for r in ev_banded:
        by_band.setdefault(int(r.band), []).append(r.band_key)

    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
        lambda t: F.length(t) > 0)
    grams_sql = """filter(transform(
        sequence(1, greatest(size(_toks) - {nm1}, 1)),
        i -> concat_ws(' ', {probes})), g -> length(g) > 0)""".format(
        nm1=n - 1,
        probes=", ".join(f"try_element_at(_toks, i + {j})"
                         for j in range(n)))
    hs = f"""transform({grams_sql},
        g -> cast(conv(substring(md5(g), 1, 12), 16, 10) as bigint)
             % {MINHASH_P}L)"""
    sig = "array(" + ", ".join(
        f"array_min(transform(_hs, h -> (h * {2 * s + 1}L"
        f" + {s}L * {MINHASH_GOLD}L) % {MINHASH_P}L))"
        for s in range(k)) + ")"

    def band_key(b: int) -> str:
        parts = ", ".join(f"cast(element_at(_sig, {b * rows + r + 1})"
                          " as string)" for r in range(rows))
        return f"md5(concat_ws(',', {parts}))"

    near_terms = []
    for b in range(bands):
        keys = by_band.get(b, [])
        if not keys:
            continue
        lit = "array(" + ", ".join(f"'{x}'" for x in sorted(keys)) + ")"
        near_terms.append(f"array_contains({lit}, {band_key(b)})")
    near = ("(size(_hs) > 0 AND (" + " OR ".join(near_terms) + "))"
            if near_terms else "false")
    exact = ("array_contains(array(" +
             ", ".join(f"'{x}'" for x in ev_fp) +
             "), md5(array_join(array_sort(array_distinct(_toks)), ' ')))"
             if ev_fp else "false")
    return (train
            .withColumn("_toks", toks)
            .withColumn("_hs", F.expr(hs))
            .withColumn("_sig", F.expr(sig))
            .withColumn("contaminated_exact", F.expr(exact))
            .withColumn("near_contaminated", F.expr(near))
            .drop("_toks", "_hs", "_sig"))
