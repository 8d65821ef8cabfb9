"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All four are single-pass column expressions or one-shuffle aggregations —
no Python in the hot path, so they run at scan speed over 100 TB of text.
Formulas are deliberately closed-form (ratios of counts, md5 digests) so a
SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: tiny per-language stopword lists for the n-gram/stopword-hit heuristic —
#: enough to discriminate on real text; deterministic on any text.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "en", "por"],
}

#: BPE-ish token heuristic: word pieces of letters OR digit runs OR single
#: punctuation — approximates subword tokenizer token counts from a regex.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tok_array(text_col: str) -> Column:
    # NULL text tokenizes as EMPTY, not NULL: a NULL document must fail
    # quality gates as "no tokens", not slip through every rule because
    # NULL comparisons are all unknown (the round-5 gopher_rules finding:
    # a NULL doc got keep=true before this coalesce)
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+")
    return F.filter(toks, lambda t: F.length(t) > 0)


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens, regex word tokens, BPE-ish tokens,
    plus character length. Pure per-row expressions (codegen, no shuffle)."""
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda t: F.length(t) > 0))
    words = F.size(_tok_array(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        ws.cast("bigint").alias("ws_tokens"),
        words.cast("bigint").alias("word_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str,
                  keep: list[str] | None = None) -> DataFrame:
    """Heuristic quality score from length/punctuation/stopword ratios.

    score = 0.4·len_score + 0.3·stopword_ratio_capped + 0.3·(1 − punct_ratio)
    where len_score saturates at 500 chars. All terms are ratios of integer
    counts computed in one projection — exactly reproducible in SQL.
    ``keep`` passes extra columns through the same projection so downstream
    consumers (e.g. the quality funnel) stay single-scan instead of joining
    the corpus back against itself.
    """
    n_chars = F.length(F.col(text_col)).cast("double")
    toks = _tok_array(text_col)
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(
        *STOPWORDS["en"]))).cast("double")
    n_punct = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"[^\w\s]"), 0)).cast("double")
    len_score = F.least(n_chars / 500.0, F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, F.least(n_stop / n_tok * 5.0, F.lit(1.0))
                        ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = 0.4 * len_score + 0.3 * stop_ratio + 0.3 * (1.0 - punct_ratio)
    # raw doubles on purpose: per-row arithmetic is bit-identical across
    # engines, while round() half-way behavior is not
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        len_score.alias("len_score"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-hit language ID: score(lang) = |tokens ∩ stopwords(lang)|,
    predict the argmax (ties broken by language code).

    One explode + one groupBy; the stopword table is a broadcast-sized map
    folded into the expression, not a join.
    """
    toks = _tok_array(text_col)
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).alias(f"score_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(STOPWORDS)
    # argmax with lexicographic tie-break: compare as (score, reverse-rank)
    best = F.greatest(*[F.struct(F.col(f"score_{l}").alias("s"),
                                 F.lit(-i).alias("ri"),
                                 F.lit(l).alias("lang"))
                        for i, l in enumerate(langs)])
    return scored.select(
        F.col(id_col), *[F.col(f"score_{l}") for l in langs],
        best["lang"].alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str, id_col: str,
                keep: list[str] | None = None) -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token set.

    Robust to token order and repetition (catches shuffled/near-identical
    docs that exact md5 misses); one projection, no shuffle. ``keep``
    passes extra columns through so consumers (e.g. the cross-source
    duplicate matrix) stay single-scan instead of re-joining the corpus.
    """
    toks = _tok_array(text_col)
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        F.md5(canon).alias("fingerprint"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("vocab_size"),
    )


def tfidf_topk(df: DataFrame, text_col: str, id_col: str, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Scale shape: per-(doc,term) TF once, then document frequency as
    ``tf.groupBy("term").agg(count(*))`` joined back — NOT a
    ``count(*) OVER (PARTITION BY term)`` window. A window over the term
    partition cannot partial-aggregate and AQE cannot skew-split it, so a
    stopword's partition (~N rows in the tf table) pins to ONE reducer at
    corpus scale; the aggregate form partial-combines map-side to one row
    per term and the join back is AQE-skew-splittable (the ngram_novelty /
    bm25_multiterm / block_dedup shape). The tf table feeds two consumers
    (the df aggregate and the join), so it is localCheckpoint-pinned —
    without the pin Catalyst re-expands the scan+explode+agg per consumer.
    The corpus size joins in as a broadcast 1-row aggregate — no
    driver-side ``count()`` round-trip in the plan.

    The top-k ordering is (tf DESC, df ASC, term ASC) — integers only, so
    ranking never depends on float ULPs; the double tfidf score is carried
    for consumers but not used as a sort key.
    """
    from pyspark.sql.window import Window
    toks = (df.select(F.col(id_col),
                      F.explode(_tok_array(text_col)).alias("term")))
    tf = (toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=False))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    tf = tf.join(docfreq, "term")
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.col("tf")
                          * F.log((F.col("n_docs") + 1.0)
                                  / (F.col("df") + 1.0))))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("tf").desc(), F.col("df").asc(), F.col("term")))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col(id_col), "term", "tf", "df", "tfidf",
                    F.col("rnk").cast("int").alias("rnk")))


#: split-bucket source: first 4 hex chars of md5(id) → 0..99. md5 gives the
#: same hex in every engine and every run — the split is reproducible across
#: the cluster, restarts, and the DuckDB oracle (unlike seeded rand()).
def _split_bucket(id_col: str) -> Column:
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                   16, 10).cast("int") % 100)


def hash_split(df: DataFrame, id_col: str,
               train: int = 80, valid: int = 10) -> DataFrame:
    """Deterministic train/valid/test assignment by content-free id hash.

    A pure projection (no shuffle, no sampling state): every row's split is
    a function of its id alone, so the assignment is stable under
    repartitioning, retries, and incremental appends — the property a
    training-data pipeline needs that ``df.sample``/``randomSplit`` (seeded
    per-partition RNG) cannot give at scale.
    """
    b = _split_bucket(id_col)
    return df.select(
        F.col(id_col),
        b.alias("bucket"),
        F.when(b < train, "train")
         .when(b < train + valid, "valid")
         .otherwise("test").alias("split"))


def leakage_safe_split(df: DataFrame, text_col: str, id_col: str,
                       train: int = 80, valid: int = 10) -> DataFrame:
    """Train/valid/test split keyed on the CONTENT fingerprint, not the id:
    exact duplicates share ``md5(coalesce(text, ''))``, so every copy of a
    document lands in the SAME split — an id-hash split (``hash_split``)
    puts two byte-identical docs with different ids in different splits
    ~32% of the time, which leaks training text into eval verbatim. Same
    zero-shuffle, append/retry-stable projection shape as ``hash_split``;
    for NEAR-duplicate safety substitute the dedup cluster representative
    (operators/dedup.neardup_clusters min-id) for the fingerprint at this
    same seam.
    """
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    b = (F.conv(F.substring(fp, 1, 4), 16, 10).cast("int") % 100)
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        b.alias("bucket"),
        F.when(b < train, "train")
         .when(b < train + valid, "valid")
         .otherwise("test").alias("split"))


def bm25_term_topk(df: DataFrame, text_col: str, id_col: str,
                   n_terms: int = 5, k: int = 10) -> DataFrame:
    """Per-term BM25 top-k documents with EXACT arithmetic (no libm ln).

    BM25(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    Within one term, idf and (k1+1) are constant, so the ranking is decided
    by the tf-saturation part alone; with the classic k1=6/5, b=3/4 and
    avgdl = L/N (L = corpus token count over docs with ≥1 token, N = their
    count) it equals 20·tf·L / (20·tf·L + 6·L + 18·dl·N) — an integer
    rational. The single final division runs in double on identical int64s
    (IEEE-exact on any engine, the cosine-operator discipline), so the
    ordering is bit-reproducible and ln's 1-ULP libm skew (the tfidf_topk
    finding) never enters. int64 bound: 20·tf·L < 2^63 holds while
    tf·L < 4.6e17 — beyond that, pre-divide L by its gcd granularity or
    rescale to per-million document lengths.

    The "query" is self-contained: the ``n_terms`` highest-document-
    frequency terms (ties → lexicographic). One explode + three hash
    aggregations + a broadcast of the tiny term set; the corpus totals
    ride a 1-row broadcast, never a driver round-trip.
    """
    toks = df.select(F.col(id_col),
                     F.explode(_tok_array(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n_docs"),
                    F.sum("dl").alias("l_total"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("docfreq"))
    top_terms = (docfreq.orderBy(F.col("docfreq").desc(), "term")
                 .limit(n_terms))
    cand = (tf.join(F.broadcast(top_terms), "term")
            .join(dl, id_col)
            .crossJoin(F.broadcast(corpus)))
    num = F.col("tf") * F.lit(20) * F.col("l_total")
    den = (num + F.lit(6) * F.col("l_total")
           + F.lit(18) * F.col("dl") * F.col("n_docs"))
    w = Window.partitionBy("term").orderBy(F.col("score").desc(),
                                           F.col(id_col))
    return (cand.withColumn("score",
                            num.cast("double") / den.cast("double"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("term", F.col(id_col), "tf", "dl", "docfreq",
                    "score", F.col("rnk").cast("int").alias("rnk")))


def bm25_multiterm(df: DataFrame, text_col: str, id_col: str,
                   n_terms: int = 4, k: int = 25) -> DataFrame:
    """Multi-term Okapi BM25 query scoring: the full retrieval shape —
    per-document score = Σ over matched query terms of idf(t)·tfsat(t,d)
    with k1=1.2, b=0.75 length normalization — as one corpus-wide top-k.
    bm25_term_topk ranks docs WITHIN one term (idf rank-neutral there);
    a real query has several terms, so idf weighting between terms now
    decides the ranking and must be cross-engine exact.

    Fixed-point discipline (hash-exact, no float-reduction order):

    - ``tfsat_e9 = floor(1e9 · 20·tf·L / (20·tf·L + 6·L + 18·dl·N))``,
      the bm25_term_topk integer rational; the single IEEE division and
      multiply of identical int64-derived doubles is correctly rounded
      on every engine, so the floor is bit-identical. int64/2^53 bound:
      20·tf·L < 2^53 (tf·L < 4.5e14) — rescale L to per-million beyond.
    - ``idf_e6 = floor(1e6 · ln((2N+2)/(2·df+1)))``, i.e. the Robertson
      idf ln((N+1)/(df+0.5)) with the argument kept an exact int64
      ratio. ln is evaluated on ≤ ``n_terms`` DISTINCT inputs total
      (never per row), so the only cross-engine libm exposure is
      ``n_terms`` floor boundaries at e6 granularity (~1e-9 straddle
      odds per term on this data; the gate verifies at every SF).
    - ``score_fp = Σ idf_e6 · tfsat_e9`` is a BIGINT sum — associative
      and order-insensitive, so Spark's nondeterministic aggregation
      order cannot flip a rank the way a double Σ could. Bound:
      n_terms · 2e7 · 1e9 ≪ 2^63.

    The "query" is self-contained: the ``n_terms`` highest-df terms
    (ties → lexicographic). Scale shape: the corpus is scanned and
    exploded ONCE — the (doc, term) tf table is localCheckpoint-pinned
    (multi-consumer subtree: dl, df, corpus totals and the postings
    probe all read it, and without the pin Catalyst re-expands the
    parquet scan + explode per consumer — measured 5 scans → 1) and
    doc length is Σtf, not a second tokenize. Postings filter through
    the BROADCAST query-term table (never a corpus-wide term shuffle),
    one (doc)-keyed shuffle joins doc lengths, one small groupBy sums
    the matched terms, and the global top-k is TakeOrderedAndProject —
    no corpus sort. Ref parity: retrieval scoring the reference
    delegates to ksql UDAFs; modeled on Robertson & Zaragoza 2009.
    """
    toks = df.select(F.col(id_col),
                     F.explode(_tok_array(text_col)).alias("term"))
    tf = (toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=False))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n_docs"),
                    F.sum("dl").alias("l_total"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("docfreq"))
    qterms = (docfreq.orderBy(F.col("docfreq").desc(), "term")
              .limit(n_terms)
              .crossJoin(F.broadcast(corpus))
              .withColumn("idf_e6", F.expr(
                  "cast(floor(1e6 * ln((2 * n_docs + 2) / "
                  "cast(2 * docfreq + 1 as double))) as bigint)")))
    cand = (tf.join(F.broadcast(qterms.select("term", "idf_e6")), "term")
            .join(dl, id_col))
    num = (F.col("tf") * F.lit(20)
           * F.col("l_total")).cast("double")
    den = (F.col("tf") * F.lit(20) * F.col("l_total")
           + F.lit(6) * F.col("l_total")
           + F.lit(18) * F.col("dl") * F.col("n_docs")).cast("double")
    scored = (cand.crossJoin(F.broadcast(corpus))
              .withColumn("tfsat_e9", F.floor(
                  num / den * F.lit(1e9)).cast("bigint"))
              .groupBy(id_col)
              .agg(F.count("*").alias("n_terms_hit"),
                   F.max("dl").alias("dl"),
                   F.sum(F.col("idf_e6") * F.col("tfsat_e9"))
                   .alias("score_fp")))
    return (scored
            .orderBy(F.col("score_fp").desc(), F.col(id_col))
            .limit(k)
            .select(F.col(id_col), "n_terms_hit", "dl", "score_fp"))


def ngram_novelty(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3) -> DataFrame:
    """Per-document n-gram novelty against the rest of the corpus: what
    fraction of a document's distinct n-grams FIRST occur in it
    (attribution by lowest doc_id)? The dataset-redundancy growth curve
    a curation pipeline watches while scaling a source — text_repetition
    measures WITHIN-doc repetition, chunk_dedup detects shared chunks;
    this quantifies each document's marginal n-gram contribution.

    Scale shape: distinct (doc, gram) shingles fingerprint to xxhash64
    IN-ROW before any shuffle (8-byte fixed-width rows, never gram text —
    the exact_dedup digest discipline); first-occurrence is a
    ``groupBy(gram).min(doc_id)`` — NOT a min-window — because a hot
    gram (a stopword trigram in half the corpus) must not pin all its
    rows to one reducer: the aggregate partial-combines map-side to one
    row per gram, and the join back is AQE-skew-splittable, neither of
    which a window over the gram partition allows. The per-doc
    aggregate is the last shuffle. novelty_e6 is integer fixed point
    (truncating div on non-negative counts, engine-exact). Documents
    with zero shingles (empty/NULL text) emit no row, matching the
    shingles() convention.
    """
    from kafka_connect_streams_spark.operators.dedup import shingles
    # xxhash64, not md5: the gram fingerprint is plan-internal (grouping
    # only, never emitted), so engine-matching digests aren't needed and
    # the cheaper hash halves the per-gram map cost
    sh = (shingles(df, text_col, id_col, n=n)
          .select(F.col(id_col), F.xxhash64("shingle").alias("_gfp")))
    firsts = sh.groupBy("_gfp").agg(F.min(id_col).alias("_first"))
    per = sh.join(firsts, "_gfp")
    return (per.groupBy(id_col)
            .agg(F.count("*").alias("n_distinct_grams"),
                 F.sum((F.col("_first") == F.col(id_col)).cast("bigint"))
                 .alias("novel_grams"))
            .select(F.col(id_col), "n_distinct_grams", "novel_grams",
                    F.expr("novel_grams * 1000000 div n_distinct_grams")
                    .alias("novelty_e6")))


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      rates: dict[str, int], default_rate: int = 100) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its md5-derived
    bucket (0..99) falls under its stratum's percentage rate.

    The training-data rebalancing primitive (e.g., downsample the dominant
    language to 10% while keeping the tail at 100%). Like ``hash_split``
    this is a pure projection — membership is a function of the row id
    alone, so the sample is stable under repartitioning, retries, and
    incremental appends, and the SAME rows are chosen by any engine that
    can compute md5 (the DuckDB oracle reproduces it exactly). ``rates``
    folds into one CASE expression: no join, no shuffle, scan-speed at
    100 TB.
    """
    b = _split_bucket(id_col)
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, pct).otherwise(rate)
    return (df.withColumn("bucket", b)
            .filter(F.col("bucket") < rate)
            .drop("bucket"))


def redact_terms(df: DataFrame, text_col: str, id_col: str,
                 pattern: str) -> DataFrame:
    """Sensitive-term scrubbing: replace every regex match with a fixed mask
    and count the hits — the PII-removal shape (emails/phones/IDs in real
    corpora; a term list here because the synthetic text has no digits).

    Two regex expressions per row (replace + extract_all), whole-stage
    codegen, no shuffle. The pattern must stay in the common subset of Java
    regex (Spark) and RE2 (DuckDB) for oracle parity — word boundaries,
    alternation, and classes all qualify.
    """
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))
        .cast("bigint").alias("n_hits"),
        F.md5(F.regexp_replace(F.col(text_col), pattern, "[REDACTED]"))
        .alias("redacted_md5"),
    )


def ngram_topk(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-wide top-k bigrams: adjacent token pairs built inside the token
    array (one ``transform`` over an index sequence — no self-join of the
    exploded token table, which would shuffle the corpus twice), then one
    explode + one count shuffle + a k-row ordered take.

    Vocabulary-building shape for tokenizer training: the count shuffle
    carries (bigram, partial-count) pairs after map-side combine, never raw
    text. Tie-break on the bigram string makes the LIMIT deterministic.

    The token array is materialized ONCE per row before the transform:
    indexing an inline ``split()`` expression from inside the lambda would
    re-evaluate the split per element — O(tokens²) per document.
    """
    t = F.col("_t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i),
                              F.element_at(t, i + 1)))
    return (df.select(_tok_array(text_col).alias("_t"))
            .filter(F.size(t) >= 2)  # sequence(1,0) would run backwards
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "bigram")
            .limit(k))


def repetition_signals(df: DataFrame, text_col: str,
                       id_col: str) -> DataFrame:
    """Within-document repetition signals — the quality-filter features that
    catch boilerplate/spam (MassiveText-style filters): distinct-token
    ratio, most-frequent-token share, duplicate-bigram fraction.

    EVERY signal is an in-row array expression — the operator is
    map-only (one pruned scan, zero shuffles, zero joins; plan-pinned).
    r10 rewrite, measured 6.2 s → <1 s at sf0.1, two findings:
    (1) the tokenize cascade MUST bind to a projected column (`_toks`)
    before anything indexes it — referencing the raw `_tok_array(...)`
    expression inside the per-position bigram lambda re-tokenized the
    document at EVERY position, O(len²) per doc (the inlining trap's
    transform-lambda form; binding measured 11× on the bigram pass
    alone — CollapseProject keeps the boundary because the reference
    is non-cheap and multiply-used); (2) the top-token count folds
    in-row as the max RUN of the SORTED token array (max multiplicity
    ≡ max sorted run), replacing the corpus-wide (id, token) explode +
    two-level groupBy — at 100 TB that shuffle was the only shuffle in
    the operator. The empty-doc filter uses the cheap precursor
    predicate (`text rlike '\\w'` ⟺ toks nonempty), never
    `size(_toks) > 0`, so the pushed scan filter stays trivial.
    Ratios are exact e9 fixed-point integers (``floor(num·1e9/den)``
    via integral division) so the numbers hash identically on any
    engine — the cross-engine lesson from the ROUND(double) failures.
    """
    base = (df.where(F.coalesce(F.col(text_col), F.lit(""))
                     .rlike("\\w"))
            .select(F.col(id_col), _tok_array(text_col).alias("_toks")))
    tb = F.col("_toks")
    # bigrams with the shingles() short-doc convention: a 1-token doc yields
    # its single token as one "bigram" (sequence floor at 0)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tb) - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(tb, i + 1, 2), " "))
    top_cnt = F.expr(
        "aggregate(array_sort(_toks),"
        " named_struct('prev', cast(null as string),"
        "              'run', cast(0 as bigint),"
        "              'best', cast(0 as bigint)),"
        " (a, t) -> named_struct("
        "   'prev', t,"
        "   'run', IF(a.prev IS NOT NULL AND t = a.prev,"
        "             a.run + 1, cast(1 as bigint)),"
        "   'best', greatest(a.best,"
        "     IF(a.prev IS NOT NULL AND t = a.prev,"
        "        a.run + 1, cast(1 as bigint)))),"
        " a -> a.best)")
    per_doc = base.select(
        F.col(id_col),
        F.size(tb).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tb)).cast("bigint").alias("n_distinct"),
        top_cnt.alias("top_cnt"),
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"))
    e9 = "CAST(1000000000 AS BIGINT)"
    return (per_doc
            .select(
                F.col(id_col), "n_tokens", "n_distinct",
                F.expr(f"(n_distinct * {e9}) DIV n_tokens")
                .alias("distinct_ratio_e9"),
                F.expr(f"(top_cnt * {e9}) DIV n_tokens")
                .alias("top_token_share_e9"),
                F.expr(
                    f"CASE WHEN n_bigrams > 0 THEN "
                    f"((n_bigrams - n_distinct_bigrams) * {e9}) DIV n_bigrams "
                    f"ELSE CAST(0 AS BIGINT) END")
                .alias("dup_bigram_frac_e9")))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    size: int = 64, stride: int = 48) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    whitespace-token chunks of ``size`` tokens every ``stride`` tokens —
    the pretokenization step that turns variable-length documents into
    model-context-sized training examples with boundary overlap.

    Chunk k covers tokens [k·stride, k·stride + size); the last chunk may
    be short, and a document with ≤ size tokens yields exactly one chunk.
    Pure per-row expansion (split → sequence → explode → slice): no
    shuffle, no Python, scan-speed at 100 TB. Emits the chunk's md5
    fingerprint rather than its text so downstream dedup/compare carries
    16 bytes per chunk instead of the text itself.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: F.length(x) > 0)
    d = (df.select(F.col(id_col), toks.alias("_toks"))
         .withColumn("_n", F.size("_toks"))
         .filter(F.col("_n") > 0))
    # number of extra chunks past the first: ceil((n - size) / stride),
    # floored at 0 — double division is exact for any realistic token count
    last = F.greatest(
        F.lit(0).cast("bigint"),
        F.ceil((F.col("_n") - F.lit(size)) / F.lit(float(stride))))
    chunk = F.slice(F.col("_toks"),
                    (F.col("chunk_id") * stride + 1).cast("int"), size)
    return (d.select(F.col(id_col), "_toks", "_n",
                     F.explode(F.sequence(F.lit(0).cast("bigint"), last))
                     .alias("chunk_id"))
            .select(F.col(id_col), F.col("chunk_id").cast("int").alias("chunk_id"),
                    F.size(chunk).cast("bigint").alias("chunk_tokens"),
                    F.md5(F.array_join(chunk, " ")).alias("chunk_fp")))


def token_budget_sample(df: DataFrame, text_col: str, id_col: str,
                        stratum_col: str, budget: int,
                        bins: int = 256) -> DataFrame:
    """Deterministic per-stratum token-budget sampling: walk each stratum's
    documents in md5(id) order and keep rows while the running token sum
    stays ≤ ``budget`` — "take ~N tokens per source", the mixing primitive
    that caps dominant sources by token mass rather than document count.

    Semantically this is one running-sum window per stratum, but a direct
    window needs a total sort of each stratum — a single-reducer bottleneck
    for a dominant source at 100 TB. Instead the hash order is split into
    ``bins`` segments (first md5 byte): per-(stratum, bin) token sums are
    tiny (n_strata × bins rows), their running sum gives each bin's prior
    offset, and the per-document window runs WITHIN (stratum, bin) — bins×
    more parallelism, bit-identical result to the naive window (which is
    exactly what the oracle runs).
    """
    h = F.md5(F.col(id_col).cast("string"))
    n_tok = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                            lambda x: F.length(x) > 0)).cast("bigint")
    base = df.select(F.col(id_col), F.col(stratum_col), h.alias("_h"),
                     n_tok.alias("n_tok")) \
             .withColumn("_bin", F.conv(F.substring("_h", 1, 2), 16, 10)
                         .cast("int") % bins)
    per_bin = base.groupBy(stratum_col, "_bin") \
                  .agg(F.sum("n_tok").alias("_bin_tok"))
    wb = Window.partitionBy(stratum_col).orderBy("_bin")
    prior = per_bin.withColumn(
        "_prior", F.sum("_bin_tok").over(wb) - F.col("_bin_tok")) \
        .select(stratum_col, "_bin", "_prior")
    wd = Window.partitionBy(stratum_col, "_bin").orderBy("_h", id_col)
    return (base.join(F.broadcast(prior), [stratum_col, "_bin"])
            .withColumn("cum_tok", F.col("_prior") + F.sum("n_tok").over(wd))
            .filter(F.col("cum_tok") <= budget)
            .select(id_col, stratum_col, "n_tok", "cum_tok"))


def quality_buckets(df: DataFrame, text_col: str, id_col: str,
                    lang_col: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: per language, rank documents
    by quality score and cut the population into thirds — the standard
    perplexity-tercile selection (head = best third) with the heuristic
    quality score standing in for a LM perplexity this sandbox can't run.

    Scale shape: documents never sort. Scores are binned to integer
    millipoints (floor(quality·1000)); per-(lang, bin) counts are a tiny
    aggregate (langs × ≤1001 rows), a window over THAT finds each bin's
    cumulative rank from the top, and every document joins its bin's
    bucket back by broadcast. Cuts land on bin boundaries (documents in
    one bin share a bucket), which is the documented, deterministic
    tie-rule — identical in the SQL oracle.
    """
    scored = quality_score(df, text_col, id_col, keep=[lang_col])
    # r14: pin the SKINNY binned table (id, lang, qbin — never text).
    # Unpinned, the cut-table subtree and the probe side each re-scanned
    # the corpus and re-ran the quality expression, and the bucket
    # join's inferred isnotnull(qbin) pushed the WHOLE quality
    # expression into a scan Filter a third time (registry plan sweep).
    # EAGER per the measured lazy-pin hazard (OPTIMIZATION_r14.md).
    # NULL-text rows keep their NULL qbin inside the pinned table and
    # drop at the join exactly as before.
    binned = scored.select(
        F.col(id_col), F.col(lang_col),
        F.floor(F.col("quality") * 1000).cast("int").alias("qbin")) \
        .localCheckpoint(eager=True)
    per_bin = binned.groupBy(lang_col, "qbin").agg(F.count("*").alias("_n"))
    wl = Window.partitionBy(lang_col).orderBy(F.col("qbin").desc())
    cuts = (per_bin
            .withColumn("_cum", F.sum("_n").over(wl))
            .withColumn("_tot", F.sum("_n").over(
                Window.partitionBy(lang_col)))
            .withColumn("_before", F.col("_cum") - F.col("_n"))
            .select(lang_col, "qbin",
                    F.when(F.col("_before") * 3 < F.col("_tot"), "head")
                    .when(F.col("_before") * 3 < 2 * F.col("_tot"), "middle")
                    .otherwise("tail").alias("bucket")))
    return binned.join(F.broadcast(cuts), [lang_col, "qbin"]) \
                 .select(id_col, lang_col, "qbin", "bucket")


def lm_doc_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Bigram-LM document scoring: the KenLM/CCNet quality-filter step with
    the language model ESTIMATED FROM THE CORPUS ITSELF (the standard
    data-prep bootstrap) and probabilities kept in e9 fixed point so the
    score is bit-deterministic across engines — a float ``ln()`` differs in
    the last ulp between libm and the JVM, so log-space perplexity is
    deliberately traded for linear-space conditional probabilities.

    Per document (with ≥2 tokens): ``n_bigrams``; ``n_singleton`` (bigrams
    whose only corpus occurrence is this one — the novelty signal);
    ``avg_p_e9`` / ``min_p_e9`` — mean and worst conditional probability
    P(w2|w1) = c(w1,w2)/c(w1,·) in e9 fixed point. Low avg ⇒ unusual word
    transitions ⇒ low-quality / out-of-domain text.

    Scale shape: bigram instances assemble IN-ROW (transform over the token
    array, no position explode); the LM tables are two groupBys over
    (w1,w2) and w1; scoring is ONE shuffle join of instances against the
    probability table (hot bigrams are AQE-skew-split). Nothing is
    collected to the driver and no table is O(corpus²). The fused
    single-plan form re-expands the instance subtree (3 corpus scans —
    Catalyst does not materialize shared subplans); at 100 TB, split at
    the ``probs`` seam: build+persist the LM table once, then scoring is
    one scan — same operators, no code change.
    """
    toks = _tok_array(text_col)
    base = df.select(F.col(id_col), toks.alias("toks"))
    inst = (base.filter(F.size("toks") >= 2)
            .select(id_col, F.explode(F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).alias("b"))
            .select(id_col, "b.w1", "b.w2"))
    bcnt = inst.groupBy("w1", "w2").agg(F.count("*").alias("c_bigram"))
    wstart = bcnt.groupBy("w1").agg(F.sum("c_bigram").alias("c_w1"))
    probs = bcnt.join(wstart, "w1").select(
        "w1", "w2", "c_bigram",
        F.expr("c_bigram * 1000000000 div c_w1").alias("p_e9"))
    return (inst.join(probs, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum((F.col("c_bigram") == 1).cast("bigint"))
                  .alias("n_singleton"),
                 F.expr("sum(p_e9) div count(*)").alias("avg_p_e9"),
                 F.min("p_e9").alias("min_p_e9")))


def boilerplate_removal(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, min_docs: int = 3) -> DataFrame:
    """Duplicated-span removal (the Lee-et-al. exact-substring dedup step at
    word n-gram granularity): any word n-gram occurring in ≥ ``min_docs``
    DISTINCT documents is boilerplate; every word position covered by a
    boilerplate n-gram occurrence is dropped from its document, and the
    cleaned text is reassembled in-row.

    Emits one row per document: ``n_words``, ``n_removed`` (covered
    positions), and ``clean_text`` (surviving words joined by a space, in
    original order). Documents shorter than ``n`` words pass through
    unchanged.

    Scale shape: the n-gram instance table is O(total words); the
    boilerplate set is the output of one distinct+groupBy over it (a
    shrinking filter — web boilerplate is a tiny fraction of distinct
    n-grams); covered positions semi-join instances against that set, and
    reconstruction is a per-document in-row filter over the token array.
    No step is quadratic and the corpus text shuffles exactly once
    (the final join of covered positions back to documents). The fused
    form re-scans the corpus for each use of the instance table; at
    100 TB, persist the boilerplate gram set (tiny) first, then the
    removal pass is a single scan — same operators, split at ``bp``.
    """
    toks = _tok_array(text_col)
    base = df.select(F.col(id_col), toks.alias("toks"))
    inst = (base.filter(F.size("toks") >= n)
            .select(id_col, F.explode(F.expr(
                f"transform(sequence(0, size(toks) - {n}), "
                f"i -> struct(i AS p, concat_ws(' ', slice(toks, i + 1, {n}))"
                " AS gram))")).alias("g"))
            .select(id_col, "g.p", "g.gram"))
    bp = (inst.select("gram", id_col).distinct()
          .groupBy("gram").agg(F.count("*").alias("n_docs"))
          .filter(F.col("n_docs") >= min_docs).select("gram"))
    covered = (inst.join(bp, "gram", "left_semi")
               .select(id_col, F.explode(
                   F.sequence(F.col("p"), F.col("p") + n - 1)).alias("pos"))
               .distinct()
               .groupBy(id_col).agg(F.collect_set("pos").alias("cov")))
    return (base.join(covered, id_col, "left")
            .select(F.col(id_col),
                    F.size("toks").cast("bigint").alias("n_words"),
                    F.when(F.col("cov").isNull(), F.lit(0))
                     .otherwise(F.size("cov")).cast("bigint")
                     .alias("n_removed"),
                    F.expr(
                        "CASE WHEN cov IS NULL THEN array_join(toks, ' ') "
                        "ELSE array_join(filter(transform(toks, (x, i) -> "
                        "CASE WHEN array_contains(cov, i) THEN NULL ELSE x "
                        "END), x -> x IS NOT NULL), ' ') END")
                    .alias("clean_text")))


def linear_classifier_score(df: DataFrame, text_col: str, id_col: str,
                            n_buckets: int = 64) -> DataFrame:
    """Hashed-feature linear classifier inference (the fastText-style
    model-based quality filter of CCNet/LLaMA data pipelines), expressed as
    a PURE PROJECTION: the model is a function bucket→weight, so scoring
    is an in-row fold over the token array — zero shuffles, scan speed,
    trivially correct under repartitioning.

    Feature hashing: bucket(tok) = first-16-bits-of-md5 mod ``n_buckets``.
    Weights are a deterministic integer surrogate for trained coefficients
    (Knuth-hash of the bucket mapped to [-1000, 1000]) so both engines and
    the oracle compute bit-identical scores; swapping in real trained
    weights means broadcasting a (bucket, weight) table and turning the
    fold into one broadcast join + groupBy — same plan class.

    Emits doc id, ``n_tokens``, integer ``score`` (sum of token weights),
    and the ``keep``/``drop`` decision at threshold 0.
    """
    w = (f"(CAST(conv(substr(md5(tk), 1, 4), 16, 10) AS BIGINT) "
         f"% {n_buckets} + 71) * 2654435761 % 2001 - 1000")
    return (df.select(F.col(id_col), _tok_array(text_col).alias("toks"))
            .select(
                F.col(id_col),
                F.size("toks").cast("bigint").alias("n_tokens"),
                F.expr(f"aggregate(toks, CAST(0 AS BIGINT), "
                       f"(acc, tk) -> acc + ({w}))").alias("score"))
            .withColumn("label",
                        F.when(F.col("score") >= 0, "keep")
                         .otherwise("drop")))


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher/Dolma-style rule filter: the classic document-quality gate
    (length bounds, mean token length, distinct-token ratio, top-token
    share, duplicate-bigram fraction) evaluated as ONE pure projection —
    every signal, including the most-frequent-token count, computes
    in-row over the token array, so the filter runs at scan speed with
    ZERO shuffles (repetition_signals pays one (id, token) shuffle for
    the same top-count; here the O(distinct²)-per-row fold is the right
    trade for a gate that drops most of a crawl).

    All ratios are e9/e3 fixed-point integers; ``keep`` is the AND of the
    five rules and ``fail_reasons`` lists the violated rules in a fixed
    order — bit-identical on any engine and any partitioning.
    """
    toks = _tok_array(text_col)
    base = df.select(F.col(id_col), toks.alias("toks"))
    sig = base.select(
        F.col(id_col),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr("aggregate(toks, CAST(0 AS BIGINT), "
               "(acc, tk) -> acc + length(tk))").alias("_chars"),
        F.size(F.array_distinct(F.col("toks"))).cast("bigint")
         .alias("n_distinct"),
        # max multiplicity as the max RUN of the sorted array — the
        # distinct × filter form was O(n_distinct · len) per row
        # (quadratic on long docs); the sorted-run fold is O(n log n)
        # and value-identical (repetition_signals r10 finding)
        F.expr(
            "aggregate(array_sort(toks),"
            " named_struct('prev', cast(null as string),"
            "              'run', cast(0 as bigint),"
            "              'best', cast(0 as bigint)),"
            " (a, t) -> named_struct("
            "   'prev', t,"
            "   'run', IF(a.prev IS NOT NULL AND t = a.prev,"
            "             a.run + 1, cast(1 as bigint)),"
            "   'best', greatest(a.best,"
            "     IF(a.prev IS NOT NULL AND t = a.prev,"
            "        a.run + 1, cast(1 as bigint)))),"
            " a -> a.best)").cast("bigint").alias("_top"),
        F.expr("transform(sequence(0, greatest(size(toks) - 2, 0)), "
               "i -> array_join(slice(toks, i + 1, 2), ' '))").alias("_bg"))
    e9 = "CAST(1000000000 AS BIGINT)"
    scored = sig.select(
        F.col(id_col), "n_tokens",
        F.expr("CASE WHEN n_tokens > 0 THEN (_chars * 1000) DIV n_tokens "
               "ELSE CAST(0 AS BIGINT) END").alias("avg_tok_len_e3"),
        F.expr(f"CASE WHEN n_tokens > 0 THEN (n_distinct * {e9}) "
               f"DIV n_tokens ELSE CAST(0 AS BIGINT) END")
         .alias("distinct_ratio_e9"),
        F.expr(f"CASE WHEN n_tokens > 0 THEN (_top * {e9}) DIV n_tokens "
               f"ELSE CAST(0 AS BIGINT) END").alias("top_token_share_e9"),
        F.expr(f"CASE WHEN n_tokens > 0 THEN "
               f"((size(_bg) - size(array_distinct(_bg))) * {e9}) "
               f"DIV size(_bg) ELSE CAST(0 AS BIGINT) END")
         .alias("dup_bigram_frac_e9"))
    reasons = F.expr(
        "concat_ws(',', "
        "CASE WHEN n_tokens < 20 THEN 'too_short' END, "
        "CASE WHEN n_tokens > 100000 THEN 'too_long' END, "
        "CASE WHEN n_tokens > 0 AND (avg_tok_len_e3 < 1500 "
        "     OR avg_tok_len_e3 > 12000) THEN 'weird_token_length' END, "
        "CASE WHEN distinct_ratio_e9 < 200000000 THEN 'low_diversity' END, "
        "CASE WHEN top_token_share_e9 > 300000000 THEN 'top_heavy' END, "
        "CASE WHEN dup_bigram_frac_e9 > 500000000 THEN 'repetitive' END)")
    return scored.select(
        F.col(id_col), "n_tokens", "avg_tok_len_e3", "distinct_ratio_e9",
        "top_token_share_e9", "dup_bigram_frac_e9",
        reasons.alias("fail_reasons")
    ).withColumn("keep", F.col("fail_reasons") == "")


def dsir_weights(df: DataFrame, text_col: str, id_col: str,
                 target_pred: Column, n_buckets: int = 1024) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS'23 — public
    method; the reference has no corpus operators, SURVEY §0).

    Each token hashes into one of ``n_buckets`` feature buckets; the
    target distribution is estimated from the rows matching
    ``target_pred`` and the raw distribution from the whole corpus. A
    document's importance score is the sum over its tokens (with
    multiplicity) of the bucket's target/raw rate ratio — documents
    whose token profile looks like the target domain score high and
    survive importance resampling.

    All arithmetic is integer fixed-point (rates in e9, ratios in e6,
    truncating ``div`` on non-negative values) so the score is
    bit-identical across engines. e-scale bound: rates stay non-zero
    while total token counts are < 1e9 per side; beyond that (true
    100 TB corpora) the same plan runs with DECIMAL(38) rates — the
    shape (explode → broadcast bucket join → per-doc sum) is unchanged.

    Scale shape: bucket stats are ``n_buckets`` rows (a broadcast), the
    corpus is scanned once for stats and once for scoring, and the only
    corpus-sized shuffle is the per-document sum.
    """
    toks = (df.select(F.col(id_col), target_pred.alias("_is_target"),
                      F.explode(_tok_array(text_col)).alias("_tok"))
            .withColumn("_bucket",
                        F.conv(F.substring(F.md5("_tok"), 1, 12), 16, 10)
                         .cast("bigint") % n_buckets))
    stats = (toks.groupBy("_bucket")
             .agg(F.count("*").alias("cr"),
                  F.sum(F.col("_is_target").cast("bigint")).alias("ct")))
    totals = stats.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    ratios = (stats.crossJoin(F.broadcast(totals))
              .withColumn("pt_e9", F.expr("ct * 1000000000 div nt"))
              .withColumn("pr_e9", F.expr("cr * 1000000000 div nr"))
              .select("_bucket",
                      F.expr("pt_e9 * 1000000 div greatest(pr_e9, 1)")
                       .alias("ratio_e6")))
    return (toks.join(F.broadcast(ratios), "_bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("ratio_e6").alias("dsir_score_e6")))


def langid_ngram(df: DataFrame, text_col: str, id_col: str,
                 lang_col: str = "lang", n: int = 3,
                 n_buckets: int = 1024) -> DataFrame:
    """Language identification by a corpus-trained hashed char-n-gram
    linear classifier — the CCNet pipeline's first stage (the fastText
    langid model class), the operator that PREDICTS a language instead
    of consuming ``lang`` as given (contrast :func:`language_id`'s
    fixed stopword heuristic). The reference has no corpus operators
    at all (SURVEY §0); this is the beyond-reference curation mandate.

    Model: each char ``n``-gram of ``lower(text)`` hashes into one of
    ``n_buckets`` feature buckets (first-48-bits-of-md5 mod buckets —
    the dsir_weights convention). Training estimates, per language
    present in ``lang_col``, the bucket's occurrence rate in e9 fixed
    point (``count(bucket, lang)·10⁹ div count(lang)``); inference
    scores document × candidate-language as Σ_buckets
    ``cnt_doc(bucket) · rate_e9(bucket, lang)`` — a multinomial
    naive-Bayes-style linear scorer on raw rates (integer-exact, so
    the oracle twin is bit-identical; log-likelihoods would need
    floats). Prediction is the argmax with lexicographic tie-break,
    spelled as max-score + min-language (two partial-aggregatable
    groupBys — deterministic on any engine, no argmax builtin whose
    tie behavior could differ). Documents shorter than ``n`` chars
    (including NULL text) predict the out-of-model code ``'??'``.

    Output: one row per document — ``id, lang`` (the given label),
    ``pred_lang``, and the winning ``score_e9``.

    Scale shape: the model is ``n_buckets × |langs|`` rows — a
    broadcast; the corpus is scanned once; per-doc gram counts are a
    partial-aggregatable (id, bucket) groupBy bounded per doc by
    n_buckets; scoring fans out by |langs| over DISTINCT doc buckets
    (never raw gram instances); every downstream groupBy/join keys on
    the doc id — AQE-splittable. e-scale bound: int64-safe while
    per-language gram totals < 1e9 (rate products) and per-doc grams
    < ~9e9 (score sums); beyond that the same plan runs the rates
    through DECIMAL(38,0), the dsir_weights upgrade path.
    """
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    grams = F.expr(
        f"CASE WHEN length(_t) >= {n} THEN "
        f"transform(sequence(1, length(_t) - {n - 1}), "
        f"i -> substring(_t, i, {n})) "
        "ELSE array() END")
    g = (df.select(F.col(id_col), F.col(lang_col).alias("lang"),
                   t.alias("_t"))
         .select(F.col(id_col), "lang", F.explode(grams).alias("_gram"))
         .withColumn("_bucket",
                     F.conv(F.substring(F.md5("_gram"), 1, 12), 16, 10)
                      .cast("bigint") % n_buckets))
    doc_buckets = (g.groupBy(id_col, "lang", "_bucket")
                   .agg(F.count("*").alias("_cnt")))
    by_lang = (g.groupBy("_bucket", F.col("lang").alias("_cand"))
               .agg(F.count("*").alias("_n_bl")))
    lang_tot = by_lang.groupBy("_cand").agg(F.sum("_n_bl").alias("_n_l"))
    rates = (by_lang.join(F.broadcast(lang_tot), "_cand")
             .select("_bucket", "_cand",
                     F.expr("_n_bl * 1000000000 div _n_l")
                      .alias("_rate_e9")))
    scores = (doc_buckets.join(F.broadcast(rates), "_bucket")
              .groupBy(id_col, "_cand")
              .agg(F.sum(F.expr("_cnt * _rate_e9")).alias("_score")))
    best = scores.groupBy(id_col).agg(F.max("_score").alias("_mx"))
    pred = (scores.join(best, id_col)
            .filter(F.col("_score") == F.col("_mx"))
            .groupBy(id_col)
            .agg(F.min("_cand").alias("_pred"),
                 F.max("_mx").alias("_best")))
    return (df.select(F.col(id_col), F.col(lang_col).alias("lang"))
            .join(pred, id_col, "left")
            .select(F.col(id_col), "lang",
                    F.coalesce("_pred", F.lit("??")).alias("pred_lang"),
                    F.coalesce("_best", F.lit(0)).cast("bigint")
                     .alias("score_e9")))


def block_dedup(df: DataFrame, text_col: str, id_col: str,
                size: int = 8, shape: str = "inline") -> DataFrame:
    """Corpus-wide BLOCK-level exact dedup with reconstruction — the
    paragraph-dedup pass of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (exact-substring dedup at fixed block
    granularity): every non-overlapping ``size``-token block that has
    appeared anywhere EARLIER in the corpus (by (doc_id, block_id)
    order) is removed, and each document is reconstructed from its
    surviving blocks. Catches the repeated passages document-level
    fingerprints can't see, and unlike chunk_dedup (detection) this
    OUTPUTS the deduped corpus shape.

    Returns one row per non-empty document: block counts, surviving
    token count, and the md5 of the reconstructed text (not the text
    itself, so the verified output stays narrow).

    First-occurrence-wins is a partial-aggregatable
    ``groupBy(fp).min(struct(id, block_id))`` plus an
    AQE-skew-splittable join back — NOT a row_number window over the
    fingerprint partition (the r11→r12 migration to
    :func:`block_dedup_rolling`'s discipline): a window over a
    corpus-cardinality fingerprint cannot partial-aggregate and AQE
    cannot skew-split it, so at 100× a hot boilerplate block
    fingerprint (millions of docs sharing a header) would serialize on
    one reducer. The min collapses map-side to one row per fingerprint;
    the duplicate test is an equi-join AQE can split. The decision
    (first occurrence by (doc_id, block_id) order) is provably
    identical to the old window's ``row_number() == 1``.

    Scale shape, selected by ``shape``:

    - ``"inline"`` (default): block text rides on the decision leg, so
      the rebuild is one per-doc aggregate over a sorted collect_list
      bounded by tokens-per-doc — block text shuffles (the join + the
      rebuild), and the fingerprint subtree is evaluated twice (the
      min leg + the probe leg: the rescan-over-materialize choice — a
      linear shuffle-free explode beats caching a corpus-scale block
      table).
    - ``"fp_rejoin"`` (extreme scale): the decision legs carry ONLY
      (doc, block_id, fp) — never block text; surviving block ids
      aggregate to one array per doc, and a final corpus scan re-joins
      the doc's token array by id, rebuilding survivors in-row. Text
      crosses the wire exactly once (the id join). The decision and
      every output column are identical between shapes.
    """
    if shape not in ("inline", "fp_rejoin"):
        raise ValueError(f"unknown block_dedup shape: {shape!r}")
    toks = _tok_array(text_col)
    d = (df.select(F.col(id_col), toks.alias("_toks"))
         .withColumn("_n", F.size("_toks"))
         .filter(F.col("_n") > 0))
    n_blocks = F.ceil(F.col("_n") / F.lit(float(size))).cast("bigint")
    block = F.slice(F.col("_toks"),
                    (F.col("block_id") * size + 1).cast("int"), size)
    exploded = d.select(F.col(id_col), "_toks", "_n",
                        F.explode(F.sequence(F.lit(0).cast("bigint"),
                                             n_blocks - 1))
                        .alias("block_id"))

    def _firsts(blocks: DataFrame) -> DataFrame:
        """min(struct(id, block_id)) per fingerprint — map-side
        partial-aggregatable first occurrence (lexicographic struct
        order == the old window's orderBy(id, block_id))."""
        return blocks.groupBy("_bfp").agg(
            F.min(F.struct(F.col(id_col).alias("i"),
                           F.col("block_id").alias("b"))).alias("_f"))

    def _decide(blocks: DataFrame) -> DataFrame:
        return (blocks.join(_firsts(blocks.select(id_col, "block_id",
                                                  "_bfp")), "_bfp")
                .withColumn("_keep",
                            (F.col(id_col) == F.col("_f.i"))
                            & (F.col("block_id") == F.col("_f.b"))))

    if shape == "inline":
        blocks = (exploded
                  .select(F.col(id_col), "block_id",
                          F.array_join(block, " ").alias("_btext"))
                  .withColumn("_bfp", F.md5("_btext")))
        rebuilt = (_decide(blocks).groupBy(id_col)
                   .agg(F.count("*").alias("n_blocks"),
                        F.sum(F.col("_keep").cast("bigint"))
                        .alias("kept_blocks"),
                        F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.when(F.col("_keep"),
                                           F.struct("block_id",
                                                    "_btext")))),
                                lambda s: s["_btext"]), " ")
                        .alias("_ktext")))
    else:
        # fingerprint in-row, DROP the text before any shuffle
        fps = exploded.select(
            F.col(id_col), "block_id",
            F.md5(F.array_join(block, " ")).alias("_bfp"))
        per_doc = (_decide(fps).groupBy(id_col)
                   .agg(F.count("*").alias("n_blocks"),
                        F.sum(F.col("_keep").cast("bigint"))
                        .alias("kept_blocks"),
                        F.array_sort(F.collect_list(
                            F.when(F.col("_keep"), F.col("block_id"))))
                        .alias("_kept_ids")))
        rebuilt = (d.join(per_doc, id_col)
                   .select(F.col(id_col), "n_blocks", "kept_blocks",
                           F.array_join(F.flatten(F.transform(
                               F.col("_kept_ids"),
                               lambda b: F.slice(
                                   F.col("_toks"),
                                   (b * size + 1).cast("int"),
                                   size))), " ").alias("_ktext")))
    return rebuilt.select(
        F.col(id_col), "n_blocks", "kept_blocks",
        F.size(F.filter(
            F.split(F.coalesce(F.col("_ktext"), F.lit("")), r"\s+"),
            lambda t: F.length(t) > 0)).cast("bigint")
        .alias("kept_tokens"),
        F.md5(F.coalesce(F.col("_ktext"), F.lit(""))).alias("kept_fp"))


def block_dedup_rolling(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8,
                        min_span: int | None = None) -> DataFrame:
    """Rolling-window exact-substring dedup — the stride-1 upgrade of
    :func:`block_dedup` that closes its boundary blind spot: fixed
    ``size``-token blocks miss any shared span shorter than two blocks
    that straddles a block boundary, while fingerprinting EVERY
    overlapping ``k``-token window guarantees that any span of ≥ k
    tokens shared with an earlier position (corpus order: doc_id, pos)
    is detected — the detection guarantee of Lee et al.'s
    suffix-array exact-substring pass at window granularity, via
    fingerprints instead of a suffix array.

    Semantics: window w at position p is a DUPLICATE iff its k-gram
    fingerprint occurred at an earlier (doc_id, pos); every token
    covered by a duplicate window is removed, and each document is
    rebuilt from the surviving tokens in order. Within-document
    repetition dedups the same way (first occurrence survives).

    ``min_span`` (default: k — i.e. no extra threshold) is the
    Lee-et-al. minimum-match-length knob (the paper removes only
    duplicated substrings of >= 50 tokens): duplicate windows first
    MERGE into maximal covered intervals (the in-row interval fold),
    and only merged intervals spanning >= min_span tokens are removed —
    a short incidental k-gram collision (a common phrase) no longer
    deletes text, while any shared span of >= max(k, min_span) tokens
    still merges into a >= min_span interval and is removed in full.
    Window counts (n_windows/dup_windows) report DETECTION and are
    threshold-independent; only the kept text changes.

    Scale shape (the fp_rejoin discipline): windows explode to
    ``(id, pos, 8-byte xxhash64 fp)`` ONLY — text never rides a shuffle.
    First-occurrence is ``groupBy(fp).min(struct(id, pos))`` — NOT a
    row_number window — because a hot fingerprint (a boilerplate
    8-gram in millions of docs) must not pin all its rows to one
    reducer: the min partial-combines map-side to one row per fp and
    the duplicate test is an AQE-skew-splittable join back, neither of
    which a window over the fp partition allows. Duplicate positions
    then aggregate to one bounded array per doc; a second corpus scan
    re-joins the token array by id and the reconstruction is IN-ROW:
    merge the sorted duplicate positions into disjoint covered
    intervals (one O(|dups|) fold), take the complement gaps, and
    slice the token array per gap (O(n) total, never O(n·|dups|)
    per-token exists probes). Stride-1 windows are ~n rows/doc vs
    n/size for block_dedup — the price of the guarantee; every shuffle
    carries fixed-width rows.
    """
    toks = _tok_array(text_col)
    d = (df.select(F.col(id_col), toks.alias("_toks"))
         .withColumn("_n", F.size("_toks"))
         .filter(F.col("_n") > 0))
    # fingerprint every stride-1 window; docs shorter than k have none
    wins = (d.filter(F.col("_n") >= k)
            .select(F.col(id_col), "_toks",
                    F.explode(F.sequence(
                        F.lit(0).cast("bigint"),
                        (F.col("_n") - k).cast("bigint"))).alias("pos"))
            .select(F.col(id_col), "pos",
                    # xxhash64, not md5: the fingerprint is PLAN-INTERNAL
                    # (it only defines the grouping; it never reaches the
                    # output), so the engines don't need matching digests —
                    # and it's ~2× cheaper over the stride-1 fan-out. 64-bit
                    # collisions at 1e9 windows: ~1e-2 birthday pairs, each
                    # only ever UNDER-keeping a token — acceptable for a
                    # dedup pass; swap back to md5 for exactness-critical use
                    F.xxhash64(F.array_join(
                        F.slice(F.col("_toks"),
                                (F.col("pos") + 1).cast("int"), k),
                        " ")).alias("_wfp")))
    firsts = wins.groupBy("_wfp").agg(
        F.min(F.struct(F.col(id_col).alias("i"),
                       F.col("pos").alias("p"))).alias("_f"))
    dec = (wins.join(firsts, "_wfp")
           .withColumn("_dup",
                       ~((F.col(id_col) == F.col("_f.i"))
                         & (F.col("pos") == F.col("_f.p")))))
    dups = (dec.groupBy(id_col)
            .agg(F.count("*").alias("n_windows"),
                 F.sum(F.col("_dup").cast("bigint"))
                 .alias("dup_windows"),
                 F.array_sort(F.collect_list(
                     F.when(F.col("_dup"), F.col("pos"))))
                 .alias("_dp")))
    joined = (d.join(dups, id_col, "left")
              .select(F.col(id_col), "_toks", "_n",
                      F.coalesce("n_windows", F.lit(0).cast("bigint"))
                      .alias("n_windows"),
                      F.coalesce("dup_windows", F.lit(0).cast("bigint"))
                      .alias("dup_windows"),
                      F.coalesce("_dp", F.expr(
                          "cast(array() as array<bigint>)"))
                      .alias("_dp")))
    # in-row interval merge: sorted duplicate starts fold into disjoint
    # covered spans [lo, hi); complement gaps slice the token array
    merged = F.expr(f"""aggregate(_dp,
        cast(array() as array<struct<lo: bigint, hi: bigint>>),
        (acc, p) -> CASE
            WHEN size(acc) > 0 AND p <= element_at(acc, -1).hi
                THEN concat(slice(acc, 1, size(acc) - 1),
                            array(named_struct(
                                'lo', element_at(acc, -1).lo,
                                'hi', greatest(element_at(acc, -1).hi,
                                               p + {k}))))
            ELSE concat(acc, array(named_struct('lo', p,
                                                'hi', p + {k})))
        END)""")
    min_span = max(min_span or k, k)
    covered = joined.withColumn("_iv", merged)
    if min_span > k:
        # Lee-et-al. minimum match length: drop merged removal
        # intervals shorter than min_span (an in-row filter over the
        # already-merged spans — no plan-shape change)
        covered = covered.withColumn(
            "_iv", F.filter("_iv",
                            lambda s: s["hi"] - s["lo"] >= min_span))
    gaps = F.expr("""filter(zip_with(
        concat(array(cast(0 as bigint)), transform(_iv, x -> x.hi)),
        concat(transform(_iv, x -> x.lo), array(cast(_n as bigint))),
        (s, e) -> named_struct('s', s, 'e', e)),
        g -> g.e > g.s)""")
    ktext = F.expr("""array_join(flatten(transform(_gaps,
        g -> slice(_toks, cast(g.s + 1 as int),
                   cast(g.e - g.s as int)))), ' ')""")
    return (covered.withColumn("_gaps", gaps)
            .withColumn("_ktext", ktext)
            .select(
                F.col(id_col), "n_windows", "dup_windows",
                F.size(F.filter(
                    F.split(F.coalesce(F.col("_ktext"), F.lit("")),
                            r"\s+"),
                    lambda t: F.length(t) > 0)).cast("bigint")
                .alias("kept_tokens"),
                F.md5(F.coalesce(F.col("_ktext"), F.lit("")))
                .alias("kept_fp")))


def vocab_concentration(df: DataFrame, text_col: str,
                        stratum_col: str, top: int = 10) -> DataFrame:
    """Per-stratum vocabulary-concentration diagnostics — the corpus-
    health report run before mixing sources: type-token ratio, hapax-
    legomena share (fraction of the vocabulary seen exactly once: low →
    boilerplate/templated text, high → noisy OCR), and the mass held by
    the ``top`` most frequent tokens (near-Zipf head weight; a spam
    source shows an inflated head).

    All outputs are exact integers or e9 fixed-point ratios (truncating
    div on non-negative counts) — bit-identical on any engine.

    Scale shape: one scan, one partial-aggregated (stratum, token)
    shuffle; the per-stratum aggregate and the top-k window then run
    over vocabulary-sized data (counts, never text), and nothing sorts
    the corpus.
    """
    per_tok = (df.select(F.col(stratum_col).alias("stratum"),
                         F.explode(_tok_array(text_col)).alias("_tok"))
               .groupBy("stratum", "_tok")
               .agg(F.count("*").alias("c")))
    wtop = Window.partitionBy("stratum").orderBy(F.desc("c"), "_tok")
    ranked = per_tok.withColumn("_rk", F.row_number().over(wtop))
    agg = (ranked.groupBy("stratum")
           .agg(F.sum("c").alias("n_tokens"),
                F.count("*").alias("vocab"),
                F.sum((F.col("c") == 1).cast("bigint")).alias("hapax"),
                F.sum(F.when(F.col("_rk") <= top, F.col("c"))
                      .otherwise(0)).alias("top_mass")))
    e9 = "CAST(1000000000 AS BIGINT)"
    return agg.select(
        "stratum", "n_tokens", "vocab", "hapax", "top_mass",
        F.expr(f"(vocab * {e9}) DIV n_tokens").alias("ttr_e9"),
        F.expr(f"(hapax * {e9}) DIV vocab").alias("hapax_ratio_e9"),
        F.expr(f"(top_mass * {e9}) DIV n_tokens").alias("top_share_e9"))
