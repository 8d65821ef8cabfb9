"""BPE tokenizer training: corpus-level byte-pair-merge learning
(Sennrich, Haddow & Birch, ACL'16) as a deterministic Spark loop.

The workload every in-house tokenizer run needs at scale: count
adjacent symbol pairs over the corpus's word-frequency table, merge the
most frequent pair, repeat. Three design choices make it exact and
oracle-checkable across engines:

- **Train on the word-frequency table, not the corpus.** The classic
  BPE trick: after one corpus pass (wordcount), every round runs on
  |vocab| rows — at 100 TB the corpus is touched once and the training
  loop iterates over megabytes. Each round's symbol table is
  ``localCheckpoint``-ed (the Lloyd-rounds discipline from trained PQ).
- **Deterministic argmax.** Ties break (count DESC, left, right) — a
  total order, so the learned merge table is partitioning-independent.
- **No self-merges (left ≠ right).** Applying (a,a) needs greedy
  run-parsing (leftmost-non-overlapping), which is sequential per word
  and not expressible as independent per-position logic in SQL. With
  left ≠ right, merge positions provably cannot overlap — position i
  merges iff (s[i],s[i+1]) = (a,b) and position i−1 did NOT merge; the
  latter requires s[i] = b AND s[i] = a, impossible — so the merge
  applies as a pure per-position expression on both engines. This is a
  documented variant of Sennrich's greedy application; the restriction
  only reorders which pair wins a round when a self-pair would top the
  count.

Per round the operator emits the merge learned and the corpus token
count after applying it — the compression curve BPE optimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

MERGE_SCHEMA = StructType([
    StructField("round", LongType()),
    StructField("lhs", StringType()),
    StructField("rhs", StringType()),
    StructField("pair_count", LongType()),
    StructField("n_tokens_after", LongType()),
])


def word_freq(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One corpus pass: the word-frequency table BPE trains on.
    NULL text ≡ empty document (repo-wide policy)."""
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\W+")
    return (df.select(F.explode(toks).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol table, weighted by word
    frequency. In-row pair expansion (sequence + transform), one tiny
    groupBy over the pair vocabulary."""
    pairs = F.expr("""
        CASE WHEN size(s) > 1 THEN
            transform(sequence(1, size(s) - 1),
                      i -> struct(element_at(s, i) AS a,
                                  element_at(s, i + 1) AS b))
        ELSE array() END
    """)
    return (syms.select(F.col("cnt"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c")))


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every (a,b) adjacency in every word's symbol array —
    pure per-position logic (left ≠ right ⇒ no overlapping matches)."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    # try_element_at handles the past-the-end probe (NULL); the i-1
    # probe is CASE-guarded because index 0 is invalid even for try_
    merged = F.expr(f"""
        filter(transform(sequence(1, size(s)), i -> CASE
            WHEN element_at(s, i) = '{qa}'
                 AND try_element_at(s, i + 1) = '{qb}'
                THEN '{qa}{qb}'
            WHEN i > 1 AND element_at(s, i) = '{qb}'
                 AND (CASE WHEN i > 1 THEN element_at(s, i - 1) END)
                     = '{qa}'
                THEN CAST(NULL AS STRING)
            ELSE element_at(s, i) END),
          x -> x IS NOT NULL)
    """)
    return syms.select("word", "cnt", merged.alias("s"))


def bpe_merges(spark: SparkSession, df: DataFrame, text_col: str,
               id_col: str, rounds: int = 3) -> DataFrame:
    """Learn ``rounds`` BPE merges; return the merge table with the
    post-merge corpus token counts.

    The per-round argmax is a 1-row collect (the trained-PQ/IVF
    precedent for learned parameters); everything else is DataFrame
    algebra over the checkpointed |vocab|-row symbol table.

    Serial-job shape (r15): ``1 + rounds`` jobs — one corpus pass (the
    eager word-frequency checkpoint), then one argmax per round, with
    the pre-merge corpus token total folded into the FIRST round's
    argmax job. The compression curve needs no job at all:

        n_tokens_after(r) = n_tokens_after(r-1) − pair_count(r)

    exactly, because with left ≠ right no two (a,b) adjacencies can
    overlap (overlap needs a = b), so ``_apply_merge`` merges EVERY
    counted adjacency and each merge removes exactly one token — the
    argmax's own ``pair_count`` IS the per-round token reduction. The
    r14 shape ran one trailing job re-scanning every round's symbol
    table for the same totals (and before that, ``1 + 3·rounds`` jobs);
    training wall-clock is serial job latency, not vocab-sized data
    (guide §1.2: fix the pass structure first). The LAST round's merge
    is consequently never applied (its symbol table had no consumer but
    that trailing job); intermediate rounds keep the LAZY per-round
    checkpoints that materialize inside the next round's argmax job.
    """
    syms = (word_freq(df, text_col, id_col)
            .select("word", "cnt",
                    F.expr("regexp_extract_all(word, '.', 0)").alias("s"))
            .localCheckpoint(eager=True))
    picked: list[tuple] = []   # (round, lhs, rhs, pair_count)
    n_tok = 0                  # pre-merge corpus token total (round 1)
    for r in range(1, rounds + 1):
        best_df = (_pair_counts(syms)
                   .where(F.col("a") != F.col("b"))
                   .orderBy(F.desc("c"), "a", "b")
                   .limit(1))
        if r == 1:
            # ride the token total on the first argmax job: both
            # subtrees scan the same checkpointed symbol table, so the
            # extra aggregate costs no extra pass and no extra job
            best = best_df.crossJoin(
                syms.agg(F.sum(F.col("cnt") * F.size("s"))
                         .alias("_n0"))).collect()
        else:
            best = best_df.collect()
        if not best:
            break
        a, b, c = best[0].a, best[0].b, best[0].c
        if r == 1:
            n_tok = int(best[0]["_n0"])
        picked.append((r, a, b, int(c)))
        if r < rounds:
            syms = _apply_merge(syms, a, b).localCheckpoint(eager=False)
    if not picked:
        return spark.createDataFrame([], MERGE_SCHEMA)
    rows = []
    for r, a, b, c in picked:
        n_tok -= c             # the non-overlap identity above
        rows.append((r, a, b, c, n_tok))
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def bpe_encode(df: DataFrame, text_col: str, id_col: str,
               merges: "list[tuple[str, str]]",
               keep: "tuple[str, ...]" = ()) -> DataFrame:
    """Corpus-scale tokenizer APPLY: encode every document with a
    learned merge table, emitting ``(id, n_tokens, token_ids)`` — the
    materialization a training pipeline actually allocates by (real
    token counts, not the \\W+ proxy tokenizer_fertility budgets with).

    Fully in-row, zero shuffles: the merge table is inlined as an array
    literal and applied as an ``aggregate`` fold over each word's
    symbol array — the fold's accumulator is a bound lambda variable,
    so each merge round evaluates the previous round's result ONCE
    (nesting the rounds textually instead would re-evaluate the inner
    expression ~4× per level). Each fold step is the same
    per-position merge as training's ``_apply_merge`` (no-self-merge
    variant ⇒ positions never overlap ⇒ pure per-position logic).
    Token ids are the repo's md5-affine 48-bit hash, computed in-row.

    Scale note: this shape is O(merges × word_len) per word, the right
    trade for learned-loop merge counts (the whole document pass stays
    map-only — no explode, no join, no reassembly shuffle). At
    production vocabularies (~50k merges) you'd instead encode the
    DISTINCT-word table once with the training loop's checkpointed
    per-round apply (``syms`` after round R IS the encoded vocab) and
    map the corpus through it as a broadcast join — same semantics,
    one broadcast instead of a 50k-element fold.

    ``keep`` passes extra columns of ``df`` through unchanged, so a
    downstream fold (per-language fertility, per-source budgets) rides
    the SAME map-only pass instead of re-scanning the corpus and
    re-joining by id — at scale that's the difference between zero and
    one corpus shuffle."""
    if merges:
        lits = ", ".join(
            "named_struct('a', '{}', 'b', '{}')".format(
                a.replace("'", "\\'"), b.replace("'", "\\'"))
            for a, b in merges)
        enc = f"""aggregate(array({lits}),
            regexp_extract_all(w, '.', 0),
            (s, m) -> filter(transform(sequence(1, size(s)), i -> CASE
                WHEN element_at(s, i) = m.a
                     AND try_element_at(s, i + 1) = m.b
                    THEN concat(m.a, m.b)
                WHEN i > 1 AND element_at(s, i) = m.b
                     AND (CASE WHEN i > 1
                          THEN element_at(s, i - 1) END) = m.a
                    THEN CAST(NULL AS STRING)
                ELSE element_at(s, i) END),
              x -> x IS NOT NULL))"""
    else:
        enc = "regexp_extract_all(w, '.', 0)"
    toks = F.expr(f"""
        flatten(transform(
            filter(split(lower(coalesce({text_col}, '')), '\\\\W+'),
                   w -> length(w) > 0),
            w -> {enc}))""")
    kept = [F.col(c) for c in keep]
    return (df.select(F.col(id_col), *kept, toks.alias("_toks"))
            .select(
                F.col(id_col), *kept,
                F.size("_toks").cast("bigint").alias("n_tokens"),
                F.expr("transform(_toks, t -> cast(conv(substring("
                       "md5(t), 1, 12), 16, 10) as bigint))")
                .alias("token_ids")))


def bpe_round_sql(r: int) -> str:
    """One unrolled training round as SQL CTEs (DuckDB dialect) — the
    oracle twin of `_pair_counts` + argmax + `_apply_merge`. ``syms0``
    must exist; produces ``best{r}`` and ``syms{r}``."""
    p = r - 1
    return f"""
        pairs{r} AS (
            SELECT s[i] AS a, s[i + 1] AS b,
                   CAST(sum(cnt) AS BIGINT) AS c
            FROM syms{p},
                 UNNEST(range(1, len(s))) AS t(i)
            GROUP BY 1, 2),
        best{r} AS (SELECT a, b, c FROM pairs{r} WHERE a <> b
                    ORDER BY c DESC, a, b LIMIT 1),
        syms{r} AS (
            SELECT word, cnt,
                   list_filter(list_transform(range(1, len(s) + 1),
                       i -> CASE
                           WHEN s[i] = m.a AND i < len(s)
                                AND s[i + 1] = m.b THEN m.a || m.b
                           WHEN i > 1 AND s[i - 1] = m.a
                                AND s[i] = m.b THEN NULL
                           ELSE s[i] END),
                       x -> x IS NOT NULL) AS s
            FROM syms{p} CROSS JOIN best{r} m),
        stat{r} AS (SELECT CAST({r} AS BIGINT) AS round, m.a AS lhs,
                           m.b AS rhs, m.c AS pair_count,
                           (SELECT CAST(sum(cnt * len(s)) AS BIGINT)
                            FROM syms{r}) AS n_tokens_after
                    FROM best{r} m)"""
