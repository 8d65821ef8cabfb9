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
