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
