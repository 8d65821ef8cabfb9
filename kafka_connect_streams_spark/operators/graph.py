"""Graph analytics over relational co-occurrence graphs: triangle census
with the degree-ordered edge-iterator.

Triangle counting is the canonical "joins explode at scale" workload:
the naive 3-way self-join enumerates every wedge (path of length 2),
and wedge count is Σ C(deg(v), 2) — quadratic in hub degree. The fix is
40 years of graph-mining practice (Schank & Wagner '05; Suri & Vassilvitskii
WWW'11 for the MapReduce form): orient every edge from the lower-ranked
endpoint to the higher under the total order (degree, node id). Then

- every triangle has exactly ONE wedge rooted at its lowest-ranked
  corner, so counting oriented wedges closed by an edge counts each
  triangle once, and
- out-degrees are bounded by O(√m), which caps the per-node wedge work.

We count closed wedges in-row: group oriented edges into sorted
adjacency arrays, join each oriented edge (u,v) with N⁺(u) and N⁺(v),
and take ``array_intersect`` cardinality — the wedge set never
materializes as rows, only as array payloads bounded by out-degree.

Graph construction from lineitem (parts co-occurring in an order) keeps
per-row fan-out bounded by order size: pairs expand in-row from the
order's sorted part array (≤ C(7,2) pairs), never via a self-join of
the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pairs_in_row(arr: Column) -> Column:
    """All (a,b) a<b pairs from a sorted distinct array, expanded in-row
    (flatten∘transform — JVM codegen, no Generate until the final explode)."""
    a = F.array_sort(arr)
    n = F.size(a)
    return F.flatten(F.transform(
        a, lambda x, i: F.transform(
            F.slice(a, i + 2, n), lambda y: F.struct(
                x.alias("a"), y.alias("b")))))


def cooccurrence_edges(df: DataFrame, group_col: str,
                       item_col: str) -> DataFrame:
    """Distinct undirected edges between items sharing a group, with the
    (a < b) canonical form. One shuffle to collect the per-group item
    sets, one to dedup the edges."""
    return (df.groupBy(group_col)
              .agg(F.collect_set(item_col).alias("items"))
              .select(F.explode(pairs_in_row(F.col("items"))).alias("e"))
              .select("e.a", "e.b")
              .distinct())


def triangle_census(edges: DataFrame) -> DataFrame:
    """(n_nodes, n_edges, n_wedges, n_triangles, gcc_e9) in one row.

    ``edges`` must be distinct with a < b. Orientation rank is
    (degree, node) — ties broken by id, so the order is total and the
    count is exact regardless of partitioning. ``gcc_e9`` is the global
    clustering coefficient 3·T/wedges in e9 fixed-point (the repo's
    cross-engine convention for derived ratios: integer arithmetic only,
    no float ulps in the hash).

    The edge list and the oriented edge list are each consumed by
    several branches (degrees, adjacency ×2, the census scalars) —
    without lineage truncation Catalyst re-derives the co-occurrence
    pair generation once per consumer (18 scans of the fact table in
    the un-truncated plan). ``localCheckpoint`` materializes each once,
    the same discipline dedup_clusters uses for its pair graph.
    """
    # r14: pins stay EAGER — the A/B (OPTIMIZATION_r14.md) measured the
    # all-lazy spelling 1.55× SLOWER: a lazily-pinned RDD consumed by
    # several stages of the same action is recomputed by each stage that
    # starts before another has populated its cache blocks, so the
    # multi-consumer subtrees here (edges ×4, deg ×3, e ×3) duplicated
    # instead of materializing once. deg gains its own (eager) pin: the
    # orient join consumes it on BOTH key sides and the wedge census
    # reads it again (3 consumers).
    edges = edges.localCheckpoint(eager=True)
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg"))
           .localCheckpoint(eager=True))
    # orient: keep each edge as (lo, hi) under the (deg, id) total order
    e = (edges
         .join(deg.withColumnRenamed("v", "a")
                  .withColumnRenamed("deg", "da"), "a")
         .join(deg.withColumnRenamed("v", "b")
                  .withColumnRenamed("deg", "db"), "b")
         .select(
             F.when((F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db"))
                       & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("lo"), F.col("b").alias("hi"))
                    ).otherwise(
                 F.struct(F.col("b").alias("lo"), F.col("a").alias("hi"))
             ).alias("e"))
         .select("e.lo", "e.hi")
         .localCheckpoint(eager=True))
    adj = (e.groupBy("lo").agg(F.array_sort(
        F.collect_list("hi")).alias("nbrs"))
        .localCheckpoint(eager=True))
    # closed wedges per oriented edge: |N+(lo) ∩ N+(hi)| — in-row intersect
    closed = (e
              .join(adj, "lo")
              .join(adj.withColumnRenamed("lo", "hi")
                       .withColumnRenamed("nbrs", "nbrs_hi"), "hi")
              .select(F.size(F.array_intersect(
                  F.col("nbrs"), F.col("nbrs_hi"))).alias("tri")))
    tri = closed.agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles"))
    wedges = deg.agg(
        F.count("*").alias("n_nodes"),
        # integer `div` on both engines (DuckDB `//`) — no double ulps
        F.expr("sum(deg * (deg - 1)) div 2").alias("n_wedges"))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (wedges.crossJoin(n_edges).crossJoin(tri)
            .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
                    F.when(F.col("n_wedges") > 0,
                           F.expr("n_triangles * 3 * 1000000000"
                                  " div n_wedges"))
                    .otherwise(F.lit(0)).alias("gcc_e9")))


def _degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from a distinct a<b undirected edge list."""
    ends = (edges.select(F.col("a").alias("node"))
            .unionByName(edges.select(F.col("b").alias("node"))))
    return ends.groupBy("node").agg(F.count("*").alias("deg"))


def kcore(edges: DataFrame, k: int, rounds: int = 8) -> DataFrame:
    """The k-core of an undirected graph (Seidman '83): the maximal
    subgraph where every node has degree ≥ k — the standard "dense
    backbone" filter before community mining, and the classic
    *iterative peeling* workload: repeatedly drop nodes with degree
    below k until the survivor set is stable (each removal can push a
    neighbor below the threshold).

    Exact-or-raise unrolled iteration (the bpe_merges / dedup_clusters
    precedent for hash-gating loops): exactly ``rounds`` peels run —
    each one degree aggregate over the CURRENT edge list (map-side
    combined; input is 2|E| id rows, never the fact table) and two
    semi-joins that keep edges whose both endpoints survive — with a
    ``localCheckpoint`` per round so the shrinking graph replays from
    materialized state instead of re-expanding the whole lineage each
    iteration. After the last round one O(1) action verifies the
    fixpoint (every remaining degree ≥ k — equivalent to round R+1
    being a no-op); an unconverged graph raises instead of returning a
    silently-wrong partial peel. Degree-peeling halves the graph's
    sub-k fringe each round in practice; ``rounds=8`` covers 2× the
    max observed on this corpus (7 at sf0.1, k=16).

    Scale shape: every stage is keyed by node id (no global sort, no
    cross join); the graph only shrinks, so round cost is bounded by
    the FIRST round, and the k-core of a 100 TB co-occurrence graph
    peels in the same 8 bounded passes. Returns the survivors'
    (node, deg) — their degree INSIDE the core.
    """
    cur = edges.select("a", "b").localCheckpoint()
    prev_n = None
    converged = False
    for _ in range(rounds):
        # fixpoint short-circuit: a peel that drops any node also drops
        # that node's ≥1 edges (degree-0 nodes never appear in an edge
        # list), so an unchanged edge count means every remaining round
        # is a no-op — the result is IDENTICAL to running all `rounds`,
        # which is what the unrolled SQL twin does. The count is a
        # cheap job over the already-materialized checkpoint. An
        # unchanged count also PROVES the fixpoint (no edge dropped ⇔
        # every endpoint sat in keep ⇔ every degree ≥ k), so the final
        # assertion job below is skipped on this path.
        n = cur.count()
        if n == prev_n:
            converged = True
            break
        prev_n = n
        # pin the survivor list: both semi-joins consume it, and
        # without the checkpoint each would re-run the degree aggregate.
        # LAZY checkpoint: it materializes inside the round's single
        # edge-rebuild job (the first semi-join branch computes it, the
        # second reads the checkpointed blocks) instead of paying a
        # dedicated keep-materialization job per round — 2 serial jobs
        # per round, not 3; same lineage truncation, same result.
        keep = (_degrees(cur).filter(F.col("deg") >= k).select("node")
                .localCheckpoint(eager=False))
        cur = (cur.join(keep.withColumnRenamed("node", "a"), "a",
                        "left_semi")
               .join(keep.withColumnRenamed("node", "b"), "b",
                     "left_semi")
               .select("a", "b")
               .localCheckpoint())
    final = _degrees(cur)
    if not converged and final.filter(F.col("deg") < k).limit(1).count() > 0:
        raise ValueError(
            f"k-core peeling did not converge in {rounds} rounds "
            f"(k={k}); raise `rounds`")
    return (final.select("node", F.col("deg").cast("bigint").alias("deg"))
            .orderBy("node"))
