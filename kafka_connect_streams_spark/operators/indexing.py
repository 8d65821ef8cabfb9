"""Inverted-index construction: blocked, delta-encoded posting lists.

The IR-index build workload (Zobel & Moffat, ACM CS'06): word →
(document frequency, total term frequency, posting list). Two design
choices carry the 100 TB story:

- **Blocking**: postings shard by ``doc_id div block_size`` so no row
  ever holds an unbounded list — a stopword's postings split across
  blocks instead of materializing one corpus-length array (the same
  reason production indexes store postings in fixed-size segments).
  Shuffle keys are (word, block), so hot words also spread across
  reducers instead of hitting one.
- **Delta encoding**: within a block the sorted doc ids are stored as
  first-absolute + gaps — the standard compression step — computed
  in-row from the sorted array (JVM ``transform``, no Python).

Emitted as strings so the (word, block, df, tf, postings) rows
hash-match a SQL oracle (DuckDB: ``string_agg(gap ORDER BY doc_id)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def inverted_index(df: DataFrame, text_col: str, id_col: str,
                   block_size: int = 65536) -> DataFrame:
    """Blocked delta-encoded inverted index over a document table."""
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\W+")
    wd = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("word"))
          .where(F.length("word") > 0))
    per_doc = (wd.groupBy("word", "doc_id")
               .agg(F.count("*").alias("tf"))
               .withColumn("block",
                           F.expr(f"doc_id div {block_size}")))
    deltas = F.col("docs")
    return (per_doc
            .groupBy("word", "block")
            .agg(F.count("*").alias("df"),
                 F.sum("tf").alias("tf_total"),
                 F.array_sort(F.collect_list("doc_id")).alias("docs"))
            .withColumn("postings", F.array_join(F.transform(
                "docs",
                lambda x, i: x - F.when(
                    i > 0, F.element_at(deltas, i)).otherwise(F.lit(0))),
                ","))
            .select("word", "block", "df", "tf_total", "postings")
            .orderBy("word", "block"))


def cosine_pair_topk(df: DataFrame, text_col: str, id_col: str,
                     k: int = 20, max_df: int = 50) -> DataFrame:
    """Top-k most-similar document PAIRS by term-frequency cosine via a
    postings self-join — the all-pairs similarity-mining pass (Bayardo
    et al., WWW'07 "Scaling Up All Pairs Similarity Search") that feeds
    semantic near-dup candidates and related-document links.

    Candidate generation is bounded the DAAT way: terms with document
    frequency > ``max_df`` are dropped from the document vectors before
    pairing (a stopword would otherwise fan out df² candidate rows —
    THE all-pairs scale killer). Dot products and squared norms are
    exact integer sums over the pruned vectors; the ranking key is
    cos² in e9 fixed-point, ``dot²·1e9 div (na·nb)`` — integer-exact and
    engine-identical (no transcendentals, no float summation order).
    Bound: by Cauchy-Schwarz dot ≤ sqrt(na·nb) — na/nb are per-doc sums
    of tf² with NO cap on term frequency (max_df prunes document
    frequency, not tf), so a rare term repeated a few hundred times in
    two docs already pushes dot²·1e9 past int64. The ranking key is
    therefore computed in DECIMAL(38,0) (exact to 38 digits, i.e.
    per-doc pruned token mass up to ~3e9) and the quotient — always
    ≤ 1e9 — lands back in a bigint.

    Scale shape: one (id, term) partial-aggregated shuffle, a per-term
    self-join whose fan-out is capped at max_df² per term, one pair
    aggregate over integer dots, and a global top-k that plans as
    TakeOrderedAndProject (per-partition top-k + single k-row merge,
    never a total sort). r15: the per-doc squared norm is computed as a
    window over the pruned table INSIDE its pin and carried through the
    self-join and the pair aggregate (it is constant per doc, so
    ``min(na)`` per pair group reproduces it exactly) — the r14 shape
    re-joined the PAIR-level dots table against a separate norms
    aggregate twice (by id_a, then id_b), i.e. two extra shuffles of
    the pair table, the largest intermediate in the plan (guide §2.4;
    the carried norm costs 8 bytes/row on the term shuffle instead).

    Corpus note: the df-prune presumes a Zipf tail (real corpora: most
    terms are rare). The synthetic testdata draws from a ~30-word
    vocabulary, so past sf0.01 every unigram exceeds any sane max_df
    and the result is legitimately empty — the sf0.01 correctness rows
    are the meaningful check; scaling max_df with corpus size would
    reintroduce the df² fan-out the prune exists to kill.
    """
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\W+")
    # r14: pin the two multi-consumer tables EAGERLY (the measured
    # eager/lazy rule, OPTIMIZATION_r14.md): unpinned, ``tf`` (consumed
    # by the df-prune aggregate AND the prune join) re-ran the corpus
    # tokenize+explode+aggregate chain per consumer, and ``pruned``
    # (consumed by norms and BOTH self-join sides, fanning out in
    # parallel within the one action) re-derived the prune join 3×.
    tf = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("term"))
          .where(F.length("term") > 0)
          .groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=True))
    rare = (tf.groupBy("term")
            .agg(F.count("*").alias("df_t"))
            .filter(F.col("df_t") <= max_df)
            .select("term"))
    wdoc = Window.partitionBy("doc_id")
    pruned = (tf.join(rare, "term")
              .withColumn("norm_sq",
                          F.sum(F.col("tf") * F.col("tf")).over(wdoc))
              .localCheckpoint(eager=True))
    a = pruned.select("term", F.col("doc_id").alias("id_a"),
                      F.col("tf").alias("tf_a"),
                      F.col("norm_sq").alias("na"))
    b = pruned.select("term", F.col("doc_id").alias("id_b"),
                      F.col("tf").alias("tf_b"),
                      F.col("norm_sq").alias("nb"))
    dots = (a.join(b, "term")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"),
                 F.min("na").alias("na"), F.min("nb").alias("nb")))
    return (dots
            .select("id_a", "id_b", "dot", "na", "nb",
                    F.expr("(CAST(dot AS DECIMAL(38,0)) * dot "
                           "* CAST(1000000000 AS BIGINT)) "
                           "DIV (CAST(na AS DECIMAL(38,0)) * nb)")
                    .alias("cos_sq_e9"))
            .orderBy(F.desc("cos_sq_e9"), "id_a", "id_b")
            .limit(k))
