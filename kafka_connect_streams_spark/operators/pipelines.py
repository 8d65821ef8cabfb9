"""End-to-end training-data pipeline: the composition the engine exists for.

quality-filter → exact dedup → near-dup (token-set) dedup → deterministic
split → per-split corpus stats, as ONE declarative plan:

- every per-doc feature (quality ratios, fingerprints, token counts, split
  bucket) is computed in a single projection over the scan — no self-joins
  between feature "tables";
- each dedup stage is ``groupBy(fp).min(struct(id, features...))`` — the
  min-id row survives whole, selected by the struct's leading unique id
  field, so retries/replays pick the same survivor. The min is map-side
  partial-aggregatable: a hot fingerprint (a boilerplate document shared
  by millions of rows) collapses to one row per map task BEFORE the
  shuffle — unlike the min-over-window form this replaces (r11→r12
  migration), which pinned every row of a hot fingerprint partition to
  one reducer and could not partial-aggregate;
- the final rollup aggregates integers and min/max of doubles only —
  order-independent, so the result is bit-stable under any partitioning.

At 100 TB: 2 partial-aggregated hash shuffles (dedup stages) + 1 agg
shuffle over ~6 rows. No Python, no collect, no iteration, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.text import (BPE_TOKEN_RE,
                                                        STOPWORDS, _tok_array,
                                                        _split_bucket)


def training_pipeline(df: DataFrame, text_col: str, id_col: str,
                      min_quality: float = 0.5,
                      train: int = 80, valid: int = 10) -> DataFrame:
    """documents → (split, n_docs, total word/bpe tokens, quality range)."""
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
    quality = 0.4 * len_score + 0.3 * stop_ratio + 0.3 * (1.0 - punct_ratio)

    feats = df.select(
        F.col(id_col),
        quality.alias("quality"),
        F.md5(F.col(text_col)).alias("exact_fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("neardup_fp"),
        F.size(toks).cast("bigint").alias("word_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
        .cast("bigint").alias("bpe_tokens"),
        _split_bucket(id_col).alias("bucket"),
    ).filter(F.col("quality") >= min_quality)

    # groupBy-min keeps the smallest-id ROW per fingerprint (the struct's
    # leading field is the unique id, so lexicographic min == min-id row):
    # deterministic survivor selection (same on every retry/replay), one
    # partial-aggregatable shuffle per stage, skew-immune by construction
    def _min_id_row(d: DataFrame, fp_col: str) -> DataFrame:
        # id_col leads the struct so the min is driven by the unique id
        rest = [id_col] + [c for c in d.columns
                           if c not in (fp_col, id_col)]
        return (d.groupBy(fp_col)
                .agg(F.min(F.struct(*[F.col(c) for c in rest]))
                     .alias("_s"))
                .select(*[F.col(f"_s.{c}").alias(c) for c in rest],
                        F.col(fp_col)))

    deduped1 = _min_id_row(feats, "exact_fp")
    deduped = _min_id_row(deduped1, "neardup_fp")

    split = (F.when(F.col("bucket") < train, "train")
             .when(F.col("bucket") < train + valid, "valid")
             .otherwise("test"))
    return (deduped.select(split.alias("split"), "word_tokens", "bpe_tokens",
                           "quality")
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("word_tokens").alias("total_word_tokens"),
                 F.sum("bpe_tokens").alias("total_bpe_tokens"),
                 F.min("quality").alias("min_quality"),
                 F.max("quality").alias("max_quality")))
