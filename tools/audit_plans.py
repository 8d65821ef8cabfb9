"""Write PLANS.md: the physical plan of each headline query, annotated.

For every bench headline query, records the `explain("formatted")` output
plus a one-line scorecard of the properties that matter at 100 TB:
shuffle count, broadcast joins, pushed filters, read schemas (pruning),
and whole-stage-codegen coverage. Usage:

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from kafka_connect_streams_spark.engine import get_spark  # noqa: E402
from kafka_connect_streams_spark import queries as Q  # noqa: E402
from kafka_connect_streams_spark.plans.explain import (  # noqa: E402
    physical_plan, shuffle_count)
from bench import HEADLINE  # noqa: E402

#: audited beyond the bench headline: newest operators whose plan shape the
#: round narrative makes claims about.
EXTRA = ["gopher_rules", "semantic_dedup", "min_cost_supplier",
         "dominant_suppliers", "linear_quality", "winnowing_dedup",
         "exact_k_sample", "winsorize",
         "jaccard_prefix_join", "dsir_importance", "resample_gapfill",
         "anomaly_zscore", "pps_sample", "pagerank_types",
         "bm25_term_topk", "leakage_safe_split", "inverted_index",
         "bpe_merges", "constraint_report", "scd2_history",
         # r8: keep scorecards for the recall eval and the thin
         # wrappers rotated out of the bench headline this round
         "hard_negatives_recall", "dedup_exact", "returned_items",
         "top_supplier", "bigram_topk", "cross_source_duplicates",
         "product_profit", "user_journeys", "chunk_dedup", "range_join",
         "bloom_semijoin",
         # r10: scorecards for the entries rotated out of the bench
         # headline this round (their shapes stay audited)
         "sorted_neighborhood", "jl_projection", "attribution",
         "rollup_merge", "hll_distinct",
         "block_dedup", "vocab_concentration", "incremental_dedup",
         # r10 batches 3-4: headline-line budget kept these out of
         # bench.py, the scorecards still audit them
         "bpe_generalization", "embedding_prototypes", "label_noise",
         "pack_spans",
         # r10 noop-audit rewrite: map-only now, keep the scorecard
         "text_repetition",
         # r11: scorecards for the five entries rotated out of the
         # bench headline this round (shapes stay audited)
         "large_orders", "market_share", "copurchase_pairs",
         "rrf_fusion", "quantile_exact",
         # r12: the two additions kept out of the headline (minspan is
         # rolling + one in-row filter; ksql_functions a thin
         # rewriter-driven projection) — scorecards still audit them
         "block_dedup_minspan", "ksql_functions", "media_neardup", "join_inner",
         # r13: the real-decoder perceptual-hash roundtrip (Arrow map),
         # plus the exact-order-statistic reports whose SCALE NOTE below
         # names quantile_exact as the scalable twin
         "media_phash", "media_audiofp", "media_dedup_clusters",
         "percentile_disc", "approx_quantile",
         # r13 video leg: the Y4M roundtrip (Arrow map) and the
         # frame-voting near-dup (banded machinery + doc-pair vote)
         "media_videofp", "video_neardup", "video_scene_cuts",
         "k_anonymize", "l_diversity",
         # r14: the trained langid pair, the privacy-family additions
         # (t-closeness audit, DP histogram release + utility eval),
         # the audio robustness twin (phash_robustness and pii_mask
         # joined the bench headline), the PII detect leg, and the two
         # thin entries rotated out of the headline this round (their
         # shapes stay audited)
         "langid", "langid_confusion", "t_closeness",
         "dp_counts", "dp_utility", "audiofp_robustness", "pii_report",
         "quantile_sketch", "global_index",
         # r14 batch 2: the one-permutation signature + agreement eval,
         # the Hilbert layout + equal-frequency pruning A/B
         "dedup_oph", "oph_recall", "hilbert_layout",
         "layout_prune_ab",
         # r14 optimization batch 2: the three non-headline queries
         # whose shapes the resumed session restructured (fused
         # continuation aggregate, single-pass postings, joinless
         # DAU/WAU) — scorecards audit the new shapes
         "ngram_lm_counts", "phrase_search", "rolling_active_users"]

#: Cost-ceiling notes for the eval/iterative harnesses (r12 verdict #7):
#: one sentence each stating which FIXED iteration/sweep count dominates
#: the entry's runtime and why it does not grow with the corpus — so the
#: "eval by design" claim is verifiable without re-deriving it.
NOTES = {
    "ann_ivf_trained_recall": (
        "COST CEILING: dominated by the THREE fixed Lloyd training "
        "rounds (each one map pass + an O(n_lists) centroid aggregate) "
        "plus the recall leg over the fixed query sample — rounds and "
        "query count are build-time constants, so cost scales linearly "
        "with corpus size and never super-linearly; this is a tuning/"
        "eval harness, not a per-ingest operator."),
    "lsh_tuning": (
        "COST CEILING: dominated by the FIXED sweep of banding settings "
        "(default 4 configs) re-banding ONE checkpoint-pinned signature "
        "table in-row plus one exact-truth pass — config count is a "
        "constant; shingles/signatures/truth are computed once, so cost "
        "is (1 + configs) linear passes, corpus-proportional only."),
    "bootstrap_ci": (
        "COST CEILING: dominated by the 32 fixed bootstrap replicates, "
        "all folded IN-ROW as map-side partial sums in one scan (no "
        "corpus explode) — replicate count is a constant; doubling the "
        "corpus doubles the scan, nothing else."),
    "kcore": (
        "COST CEILING: dominated by the 8 unrolled peel rounds over a "
        "localCheckpoint-pinned edge list that strictly SHRINKS each "
        "round — round count is fixed at build time (the k-core depth "
        "this report targets), not data-dependent; each round is one "
        "bounded degree aggregation + semi-join."),
    "dedup_clusters": (
        "COST CEILING: min-label propagation with label doubling "
        "converges in O(log2(longest chain)) rounds under a fixed "
        "max_iter=30 budget and RAISES instead of silently mislabeling "
        "past it — rounds grow with graph diameter (logarithmically), "
        "never with corpus row count; each round is one join + "
        "aggregate over the (shrinking) pair graph."),
    # exact-order-statistic reports: the per-group sort IS the contract
    "winsorize": (
        "SCALE NOTE: the rank/count windows partition the raw events "
        "table by event_type (corpus-proportional partitions) — "
        "inherent to the EXACT-percentile contract this report "
        "documents; the scalable twin is quantile_exact / "
        "grouped_exact_quantiles (64-way md5-bucketed parallel sorts), "
        "already in the registry. Use that shape when the group's rows "
        "exceed one reducer."),
    "percentile_disc": (
        "SCALE NOTE: exact discrete percentiles via a per-group rank "
        "window — the naive spelling, kept as the semantic reference; "
        "quantile_exact is the registry's scalable twin (bucketed "
        "parallel sorts, no single-reducer group sort)."),
    "approx_quantile": (
        "SCALE NOTE: compares approx_percentile against the exact "
        "rank-window answer — the exact leg's per-group sort is the "
        "point of the comparison; production uses the approx leg or "
        "quantile_exact."),
    "layout_prune_ab": (
        "COST CEILING: two layout passes (key derivation + the "
        "global_index-style two-pass ranking, each one window over "
        "~N/64-row key ranges plus an O(64) offset prefix sum) over "
        "the same point set, then a 128-row-by-16-row constant "
        "crossJoin — nothing iterates, nothing exceeds the two layout "
        "writes it models. An A/B eval harness; production writes ONE "
        "layout."),
    "oph_recall": (
        "COST CEILING: runs BOTH signature pipelines (classic + OPH) "
        "once over the same shingle set — two linear passes + two "
        "banding self-joins, then a full-outer join of the two "
        "banding-bounded thresholded pair sets; nothing iterates and "
        "nothing exceeds the cost of the two pipelines it compares. "
        "An A/B eval harness, not a per-ingest operator — production "
        "runs dedup_oph alone."),
}


def scorecard(formatted: str, simple: str) -> str:
    shuffles = len(re.findall(
        r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
        simple))
    bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", formatted))
    bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", formatted))
    smj = len(re.findall(r"\(\d+\) SortMergeJoin", formatted))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", formatted))
    scans = len(re.findall(r"\(\d+\) Scan parquet", formatted))
    # note: whole-stage-codegen markers are not visible pre-execution under
    # AQE (isFinalPlan=false), so codegen coverage is not scored here
    return (f"shuffles={shuffles} broadcast_joins={bhj + bnlj} "
            f"sortmerge_joins={smj} scans={scans} pushed_filter_scans={pushed}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit")
    out = ["# PLANS — physical plans of the headline queries",
           "",
           f"Generated by `python tools/audit_plans.py {sf_dir}`. The",
           "scorecard line counts the plan properties the 100 TB design",
           "cares about; `tests/test_plans.py` pins the load-bearing ones.",
           ""]
    for name in HEADLINE + [n for n in EXTRA if n not in HEADLINE]:
        fn = Q.QUERIES.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = physical_plan(df)
            simple = physical_plan(df, "simple")
        except Exception as exc:  # iterative ops need an action; skip those
            out += [f"## {name}", "", f"(not statically explainable: {exc})", ""]
            continue
        out += [f"## {name}", "", f"`{scorecard(plan, simple)}`", ""]
        if name in NOTES:
            out += [NOTES[name], ""]
        out += ["```", plan.strip(), "```", ""]
    path = REPO_ROOT / "PLANS.md"
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
