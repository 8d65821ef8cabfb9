"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line to stdout:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver records only the last 2000 chars of stdout, so the contract line
MUST stay under that window (round 4's line grew past it when ``spread`` was
added and the driver recorded ``parsed: null``). Diagnostics that are not
part of the contract — per-query spread, repeat count, suite wall-clock — go
to STDERR instead, and a guard refuses to print an oversized line.

``value`` is the sum of per-query MEDIANS (lower is better). Each query runs
``SPARK_GRAFT_BENCH_REPEATS`` times (default 3) after one untimed warm-up of
the whole plan; the stderr ``spread`` map holds max-min across repeats, so a
regression has to clear the measured noise floor to count. Single-run
timings on a shared session swing ±30-50% (round-2/3 comparison of
byte-identical code), which made the old one-shot bench unusable for
regression detection.

Each query is forced through the noop sink (see ``_force``) so the timing
covers FULL plan evaluation — every output column materialized — without
driver-side collect overhead dominating.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_streams_spark.engine import get_spark  # noqa: E402
from kafka_connect_streams_spark import queries as Q  # noqa: E402

#: headline set: one per operator family, weighted toward shuffle/join-heavy
#: plans where scale behavior actually shows.
HEADLINE = [
    # round 6: five thin Catalyst micro-queries (interval_join,
    # agg_pricing, groupby_stats, window_rank, tumbling_window —
    # all sub-0.3s wrappers over built-ins, stable across r3-r5,
    # plus session_window and asof_join for batch 3)
    # rotated out for the round-6 operator batch below; the r5
    # common set stays 54 queries for the trend comparison.
    "wordcount",
    # r13: join_inner (0.49 s thin wrapper over the built-in broadcast
    # join, stable since r3; the join family stays covered by
    # multiway_join/shipping_priority/interval_join) cedes its slot to
    # media_phash — the Arrow decode path (BMP roundtrip + integer DCT
    # pHash) should be timed per round like every other operator class.
    "media_phash",
    "multiway_join",
    "shipping_priority",
    "funnel",
    "correlated_subquery",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "tfidf_topk",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "ann_pq_adc",
    "ann_ivfpq",
    "training_pipeline",
    "data_profile",
    "ann_recall",
    "decontamination_minhash",
    # (cross_source_duplicates 0.364 s, scd2_history 0.373 s,
    # chunk_dedup 0.505 s, user_journeys 0.482 s and product_profit
    # 0.453 s in r7 rotated out for the six round-8 additions below;
    # dedup keeps block_dedup/incremental_dedup/dedup_minhash_lsh,
    # SCD2 keeps scd2_asof, sequence analytics keeps funnel, and
    # profit-style joins keep nation_volume_shipping/market_share.
    # Scorecards stay via audit_plans EXTRA.)
    "curation_pipeline",
    "token_budget_sample",
    "ccnet_buckets",
    "embedding_decontamination",
    "lm_doc_score",
    "local_supplier_volume",
    "nation_volume_shipping",
    "jaccard_prefix_join",
    "dsir_importance",
    "pagerank_types",
    "ann_ivf_trained_recall",
    "heavy_hitters",
    "cms_frequency",
    "triangle_census",
    "skyline",
    "kmv_set_ops",
    # round 7: the round-6 batch-2 operators that landed after the r6
    # headline freeze (VERDICT r6 next-round #3), plus waiting_suppliers
    # re-admitted (the heaviest entry of the ten rotated out in r6 —
    # 0.99 s in r5, worth tracking). To keep the contract line inside
    # the driver's 2000-char stdout tail, SIX thin stable sub-0.25 s
    # wrappers rotated out above: mix_weights (0.153 s in r6),
    # training_order (0.112), packing_efficiency (0.187),
    # tokenizer_fertility (0.223), forecast_revenue (0.156),
    # decayed_counts (0.216).
    "bpe_merges",
    "constraint_report",
    "waiting_suppliers",
    # round 8: the nine round-7 operators the r7 verdict flagged as
    # invisible to the perf harness (What's-wrong #2), plus the new
    # fp_rejoin block-dedup shape benched AGAINST the inline shape.
    # To hold the 2000-char stdout tail, SEVEN thin stable sub-0.31 s
    # wrappers rotated out above: boilerplate_removal (0.217 s in r7),
    # inverted_index (0.237, r7 number recorded per the r6 ask),
    # sequence_packing (0.270), doc_chunking (0.301), frame_sampling
    # (0.301), disjunctive_predicates (0.305), zorder_layout (0.307),
    # dedup_exact (0.281; block_dedup/incremental_dedup keep the
    # family) and returned_items (0.499; market_share/large_orders
    # keep TPC-H Q10-shape coverage).
    "block_dedup_fp",
    "cosine_pair_topk",
    "scd2_asof",
    "zonemap_prune",
    "cdc_materialize",
    "hard_negatives",
    # round-8 additions: distributed ranking + LSH banding sweep.
    # top_supplier (0.384 in r7) and bigram_topk (0.513) rotate out to
    # hold the line budget; their families stay covered (product_profit
    # / nation_volume_shipping; tfidf_topk / phrase machinery).
    "lsh_tuning",
    "bootstrap_ci",
    "kcore",
    # (hll_distinct joins the sketch group; range_join 0.348 s and
    # bloom_semijoin 0.401 s in r7 rotated out to hold the line budget
    # — non-equi broadcast and runtime-filter shapes stay plan-pinned
    # and scorecarded via EXTRA.)
    # round 10: the five additions — SNM third pass, the mergeable
    # histogram quantile sketch (vs quantile_exact's two-pass
    # selection), the JL decision-recall eval, and the map-only corpus
    # tokenizer apply + real-token fertility fold. To hold the
    # worst-case 1800-char line guard, FIVE entries rotated out:
    # sorted_neighborhood (r9 1.45 s — snm_multikey runs a strict
    # superset of its pair work), jl_projection (0.61 s — subsumed by
    # jl_then_neardup's projection + decision eval), and the three
    # thin stable wrappers attribution (0.205 s), rollup_merge
    # (0.271 s) and hll_distinct (0.355 s; the sketch family keeps
    # heavy_hitters/cms_frequency/kmv_set_ops/quantile_sketch and the
    # streaming-HLL parity tests).
    "snm_multikey",
    "jl_then_neardup",
    "bpe_encode",
    "bpe_fertility",
    # round-10 batch 2: real-token sequence packing, k-means quota
    # sampling, difficulty-decile curriculum scheduling. The WORST-CASE
    # render of 63 entries measures 1872 chars (> the 1800 guard the
    # contract test pins), so THREE thin stable entries rotated out to
    # 1783: block_dedup (0.299 s — block_dedup_fp runs the strict
    # superset shape), vocab_concentration (0.236 s thin wrapper) and
    # incremental_dedup (0.317 s — its real surface is the streaming
    # replay/compaction pytest battery, and dedup_minhash_lsh +
    # block_dedup_fp keep batch dedup in the headline). All three keep
    # PLANS.md scorecards via tools/audit_plans.py EXTRA.
    "bpe_packing",
    "cluster_balanced_sample",
    "curriculum_order",
    # round 11: the four additions — stride-1 rolling exact-substring
    # dedup (block_dedup's boundary-blind-spot fix, a heavier shape
    # worth timing), multi-term Okapi BM25 top-k, the in-row greedy
    # MMR rerank, and the cross-doc n-gram novelty curve. To hold the
    # worst-case 1800-char guard (64 entries would render 1898), FIVE
    # shape-redundant entries rotated out: large_orders (thin filter —
    # shipping_priority/data_profile keep the scan-filter shape),
    # market_share (join-agg — nation_volume_shipping/
    # local_supplier_volume keep it), copurchase_pairs (pair join —
    # dedup_minhash_lsh/jl_then_neardup keep pair shapes), rrf_fusion
    # (rank fusion — bm25_multiterm + mmr_diversify now carry the
    # retrieval family), and quantile_exact (the sketch-vs-exact A/B
    # has its r10 driver artifacts; quantile_sketch stays). All five
    # keep PLANS.md scorecards via tools/audit_plans.py EXTRA.
    "block_dedup_rolling",
    "bm25_multiterm",
    "mmr_diversify",
    "ngram_novelty",
    # round 14: phash_robustness (the heaviest Arrow decode entry — 4
    # pHash evaluations/row vs media_phash's 1, the per-round timing of
    # the whole quantize→BMP→decode→einsum-DCT chain) and pii_mask
    # (the JVM-regex redaction scan — 6 regexp passes over enriched
    # text inside one codegen stage, a shape the headline lacked). To
    # hold the 1800-char worst-case guard (62 entries would render
    # 1842), TWO thin stable entries rotated out: quantile_sketch
    # (0.46 s in r13; the sketch family keeps heavy_hitters /
    # cms_frequency / kmv_set_ops, and the sketch-vs-exact A/B has its
    # r10 artifacts) and global_index (0.32 s stable since r8; the
    # two-pass offset shape is plan-pinned). Both keep PLANS.md
    # scorecards via tools/audit_plans.py EXTRA.
    "phash_robustness",
    "pii_mask",
    # round 12: block_dedup re-admitted (rotated out in r10 as a thin
    # stable wrapper) so the fingerprint-window → partial-aggregatable-
    # min migration's cost is MEASURED against its r09 window-shaped
    # timings — expect ≈ flat at sf0.1 (the win is skew robustness at
    # 100×, not small-SF speed; the groupBy+join trades the window's
    # single sort for a second scan). training_pipeline and
    # block_dedup_fp, the other two migrated queries, were already in
    # the headline. ksql_functions and block_dedup_minspan keep
    # PLANS.md scorecards via tools/audit_plans.py EXTRA instead of
    # headline slots (minspan is block_dedup_rolling + one in-row
    # filter; ksql_functions is a thin rewriter-driven projection).
    "block_dedup",
]


def _force(df) -> None:
    """Force FULL plan evaluation through the noop sink. ``count()``
    (rounds ≤ 9) let Catalyst prune every column not feeding an
    aggregate, so map-only entries were timed at training/scan cost
    with their projections optimized away (bpe_encode's merge fold:
    measured 2.0× under-report at sf0.1; jl_projection 1.8×,
    pii_redaction 1.5×; shuffle-bound queries unchanged within noise).
    The noop sink evaluates every output row without driver transfer —
    the honest number. NOTE: r10+ totals are therefore NOT directly
    comparable to BENCH_r01–r09 (count-mode); the one-session A/B is
    recorded in SURVEY's round-10 close-out."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    suite_t0 = time.perf_counter()

    # exclude first-query JVM/session warmup from per-query numbers
    _force(Q.QUERIES["filter"](spark, sf_dir))

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    build_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES.get(name)
        if fn is None:
            continue
        # one untimed warm-up so codegen/compilation and page-cache effects
        # don't land on an arbitrary repeat
        _force(fn(spark, sf_dir))
        runs, builds, execs = [], [], []
        for _ in range(repeats):
            t0 = time.perf_counter()
            # fresh plan each run: no cross-run exchange/cache reuse.
            # build = driver plan construction incl. eager training
            # jobs/collects/pins; exec = noop evaluation of the final plan
            # (same split as tools/profile_query.py). The per-query
            # contract number is unchanged: median of (build + exec) per
            # repeat, exactly what the single time.perf_counter() pair
            # around _force(fn(...)) measured before.
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            runs.append(t2 - t0)
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)
        build_s[name] = round(statistics.median(builds), 3)
        exec_s[name] = round(statistics.median(execs), 3)

    total = round(sum(timings.values()), 3)
    # diagnostics off the contract line (driver tails 2000 chars of stdout):
    # build_s/exec_s decompose each entry into driver/serial-job time vs
    # distributed evaluation (VERDICT r14 next-round #3) so serial-job-
    # dominated entries are diagnosable from driver artifacts alone.
    print(json.dumps({
        "spread": spread,
        "build_s": build_s,
        "exec_s": exec_s,
        "repeats": repeats,
        "eval": "noop",   # full-evaluation sink, r10+ (see _force)
        "suite_wallclock": round(time.perf_counter() - suite_t0, 3),
    }), file=sys.stderr)
    line = json.dumps({
        "metric": "headline_queries_total_wallclock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    })
    if len(line) > 1800:
        raise SystemExit(
            f"bench contract line is {len(line)} chars; the driver records "
            "only the last 2000 chars of stdout — trim HEADLINE or keys")
    print(line)


if __name__ == "__main__":
    main()
