"""Batch operator semantics: focused unit checks complementing the
DuckDB-oracle gate in tools/check.py (which covers full-query parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_streams_spark.operators.dedup import (exact_dedup,
                                                         minhash_lsh_dedup,
                                                         shingles, simhash)
from kafka_connect_streams_spark.operators.joins import interval_join, value_joiner
from kafka_connect_streams_spark.operators.multimodal import (attach_payload,
                                                              decode_features)
from kafka_connect_streams_spark.operators.projections import flat_map_values
from kafka_connect_streams_spark.operators.similarity import topk_cosine
from kafka_connect_streams_spark.operators.text import language_id


class TestProjections:
    def test_flat_map_values_splits_and_drops_empty(self, spark):
        df = spark.createDataFrame([(1, "To be, or not")], "id long, text string")
        words = [r.word for r in
                 flat_map_values(df, "text", keep=["id"]).collect()]
        assert words == ["to", "be", "or", "not"]


class TestIntervalJoin:
    def test_window_bounds_inclusive(self, spark):
        mk = lambda rows: spark.createDataFrame(
            rows, "key long, v string, ts_ms long").selectExpr(
            "key", "v AS value", "timestamp_micros(ts_ms*1000) AS ts")
        left = mk([(0, "A", 10_000)])
        right = mk([(0, "in-low", 0), (0, "in-high", 20_000),
                    (0, "out", 20_001), (1, "wrong-key", 10_000)])
        j = interval_join(left, right, key="key", ts="ts", window_ms=10_000)
        got = {r.r_value for r in j.collect()}
        assert got == {"in-low", "in-high"}

    def test_value_joiner_null_padding(self, spark):
        df = spark.createDataFrame([("A", None)], "l string, r string")
        out = value_joiner(df, "l", "r").collect()[0]
        assert out.joined_value == "A-null"  # AbstractJoinIntegrationTest.java:118-123


class TestDedup:
    def test_exact_dedup_groups_identical_texts(self, spark):
        df = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "other")],
            "doc_id long, text string")
        rows = {r.keep_id: r.copies for r in
                exact_dedup(df, "text", "doc_id").collect()}
        assert rows == {1: 2, 3: 1}

    def test_minhash_finds_near_duplicates(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " tail"
        other = "completely different words entirely unrelated content here now"
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, other)], "doc_id long, text string")
        pairs = {(r.id_a, r.id_b) for r in
                 minhash_lsh_dedup(df, "text", "doc_id", threshold=0.3).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_minhash_long_form_adapters_match_wide(self, spark):
        """The long (id, seed, sig) adapters must stay value-identical to
        the wide in-row path — external consumers see one signature."""
        from kafka_connect_streams_spark.operators.dedup import (
            lsh_candidate_pairs, lsh_candidate_pairs_wide,
            minhash_signatures, minhash_signatures_wide, shingles)
        df = spark.createDataFrame(
            [(i, f"shared prefix words here variant {i % 3}")
             for i in range(1, 9)], "doc_id long, text string")
        sh = shingles(df, "text", "doc_id", 3)
        wide = {r.doc_id: list(r.sig) for r in
                minhash_signatures_wide(sh, "doc_id", k=8).collect()}
        long = {}
        for r in minhash_signatures(sh, "doc_id", k=8).collect():
            long.setdefault(r.doc_id, [0] * 8)[r.seed] = r.sig
        assert wide == long
        cand_w = {(r.id_a, r.id_b) for r in lsh_candidate_pairs_wide(
            minhash_signatures_wide(sh, "doc_id", k=8), "doc_id",
            bands=2, rows=4).collect()}
        cand_l = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(
            minhash_signatures(sh, "doc_id", k=8), "doc_id",
            bands=2, rows=4).collect()}
        assert cand_w == cand_l

    def test_simhash_similar_docs_close_hamming(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (2, "alpha beta gamma delta epsilon eta"),
             (3, "one two three four five six")],
            "doc_id long, text string")
        sh = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])

    def test_shingles_short_doc(self, spark):
        df = spark.createDataFrame([(1, "two words")], "doc_id long, text string")
        got = [r.shingle for r in shingles(df, "text", "doc_id", n=3).collect()]
        assert got == ["two words"]


class TestConnectedComponents:
    """Large-star/small-star: O(log d) rounds, exact labels, hard failure
    instead of silently-partial clusters (the old min-label propagation
    needed d rounds on a d-long chain)."""

    def test_long_chain_converges_in_log_rounds(self, spark):
        from kafka_connect_streams_spark.operators.dedup import (
            connected_components)
        # path graph 0-1-2-...-63: diameter 63; log2-ish rounds must suffice
        chain = [(i, i + 1) for i in range(63)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        got = {r.node: r.label
               for r in connected_components(pairs, max_iter=10).collect()}
        assert got == {i: 0 for i in range(64)}

    def test_two_components_and_reversed_edges(self, spark):
        from kafka_connect_streams_spark.operators.dedup import (
            connected_components)
        pairs = spark.createDataFrame(
            [(5, 3), (3, 9), (20, 21), (21, 20), (7, 7)],
            "id_a long, id_b long")  # self-loop 7-7 must vanish
        got = {r.node: r.label for r in connected_components(pairs).collect()}
        assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}

    def test_raises_instead_of_partial_result(self, spark):
        import pytest
        from kafka_connect_streams_spark.operators.dedup import (
            connected_components)
        chain = [(i, i + 1) for i in range(200)]
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iter=1)

    def test_random_graphs_match_union_find(self, spark):
        """Property check against a plain union-find reference: identical
        component PARTITIONS (labels compared up to relabeling) on a batch
        of adversarial random graphs — rings, stars, bridges, multi-edges."""
        import random

        from kafka_connect_streams_spark.operators.dedup import (
            connected_components)
        rng = random.Random(7)

        def union_find_components(edges, nodes):
            parent = {n: n for n in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                parent[find(a)] = find(b)
            groups = {}
            for n in nodes:
                groups.setdefault(find(n), set()).add(n)
            return {frozenset(g) for g in groups.values()}

        for trial in range(5):
            n = rng.randint(5, 40)
            m = rng.randint(1, 3 * n)
            edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
            nodes = {a for e in edges for a in e}
            # drop pure self-loop nodes: the operator only labels nodes that
            # appear on a real (non-loop) edge
            real = [e for e in edges if e[0] != e[1]]
            nodes = {a for e in real for a in e}
            if not real:
                continue
            pairs = spark.createDataFrame(real, "id_a long, id_b long")
            got = {}
            for r in connected_components(pairs, max_iter=30).collect():
                got.setdefault(r.label, set()).add(r.node)
            assert {frozenset(g) for g in got.values()} == \
                union_find_components(real, nodes), (trial, sorted(real))


class TestSimilarity:
    def test_brute_force_guard_trips(self, spark):
        import pytest
        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(40)],
            "id long, embedding array<float>")
        with pytest.raises(ValueError, match="max_pairs"):
            topk_cosine(df, df, k=2, max_pairs=100)
        # explicit override unlocks the same call
        assert topk_cosine(df, df, k=2, max_pairs=100,
                           allow_full_scan=True).count() > 0

    def test_auto_sizing_formulas(self):
        from kafka_connect_streams_spark.operators.similarity import (
            auto_centroids, auto_planes)
        assert auto_planes(2048) == 4          # 16 buckets of ~128
        assert auto_planes(8192) == 6          # 64 buckets of ~128
        assert auto_planes(10) == 4            # clipped floor
        assert auto_planes(10 ** 12) == 24     # clipped ceiling
        assert auto_centroids(10_000) == 100   # sqrt(N)
        assert auto_centroids(1) == 4          # clipped floor

    def test_lsh_bucket_pairs_grow_linearly(self, spark):
        """Auto-sized planes keep Σ_bucket C(n_b, 2) ~linear in N: 4× data
        must yield well under the 16× a fixed bucket count would give."""
        import numpy as np
        from kafka_connect_streams_spark.operators.similarity import (
            hyperplane_signatures)
        rng = np.random.default_rng(7)

        def pair_count(n):
            # 32 dims: enough that the md5-derived ±1 hyperplanes are
            # near-orthogonal (at ≤8 dims they correlate and skew buckets)
            vecs = rng.standard_normal((n, 32)).astype(float)
            df = spark.createDataFrame(
                [(i, [float(x) for x in vecs[i]]) for i in range(n)],
                "id long, embedding array<float>")
            occ = (hyperplane_signatures(df, "id", "embedding", planes=None)
                   .groupBy("bucket").count().collect())
            return sum(r["count"] * (r["count"] - 1) // 2 for r in occ)

        p1, p4 = pair_count(2048), pair_count(8192)
        assert p4 <= 8 * p1, f"bucket pairs grew {p4 / p1:.1f}x on 4x data"

    def test_topk_self_neighbor_excluded_and_identical_found(self, spark):
        vec = [0.1] * 4
        other = [0.9, -0.2, 0.05, 0.4]
        df = spark.createDataFrame(
            [(1, vec), (2, vec), (3, other)],
            "id long, embedding array<float>")
        rows = topk_cosine(df.filter(F.col("id") == 1), df, k=2).collect()
        assert rows[0].c_id == 2 and abs(rows[0].cosine - 1.0) < 1e-9
        assert all(r.c_id != 1 for r in rows)


class TestSetOps:
    def test_native_union_intersect_except(self, spark):
        a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
        assert sorted(r.k for r in a.union(b).distinct().collect()) == [1, 2, 3, 4]
        assert sorted(r.k for r in a.intersect(b).collect()) == [2, 3]
        assert sorted(r.k for r in a.exceptAll(b).collect()) == [1]


class TestText:
    def test_language_id_english(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat of the mat and it is a cat")],
            "doc_id long, text string")
        assert language_id(df, "text", "doc_id").collect()[0].pred_lang == "en"


class TestMultimodal:
    def test_payload_and_features(self, spark):
        df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
        feats = decode_features(attach_payload(df, "text", "doc_id")).collect()[0]
        import hashlib
        h = hashlib.md5(b"hello world").hexdigest()
        assert feats.media_bytes == 11
        assert feats.content_hash == h
        assert feats.fake_width == int(h[:4], 16) % 1920


class TestAsofJoin:
    """asof_join: backward at-or-before match, tolerance, unmatched → null."""

    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
            "k bigint, t bigint, lv string",
        ).selectExpr("k", "timestamp_micros(t * 1000) AS t", "lv")
        right = spark.createDataFrame(
            [(1, 90, "r_early"), (1, 100, "r_exact"), (1, 200, "r_late"),
             (3, 10, "r_other")],
            "k bigint, t bigint, rv string",
        ).selectExpr("k", "timestamp_micros(t * 1000) AS t", "rv")
        return left, right

    def test_backward_match_includes_equal_ts(self, spark):
        from kafka_connect_streams_spark.operators.joins import asof_join
        left, right = self._frames(spark)
        out = {r.lv: r.rv for r in asof_join(
            left, right, key="k", ts="t", right_cols=["rv"]).collect()}
        # p1 at t=100 sees the right row AT t=100, not the t=90 one
        assert out == {"p1": "r_exact", "p2": "r_late", "p3": None}

    def test_tolerance_nulls_stale_matches(self, spark):
        from kafka_connect_streams_spark.operators.joins import asof_join
        left, right = self._frames(spark)
        out = {r.lv: r.rv for r in asof_join(
            left, right, key="k", ts="t", right_cols=["rv"],
            tolerance_ms=4).collect()}
        # p2 (t=205) is 5ms past r_late (t=200) → stale under 4ms tolerance
        assert out == {"p1": "r_exact", "p2": None, "p3": None}


class TestSplitStability:
    def test_hash_split_stable_under_repartition(self, spark, sf_dir):
        """The split assignment is a pure function of the id: any physical
        layout (repartition width, input order) yields identical rows."""
        from kafka_connect_streams_spark.operators.text import hash_split
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = hash_split(docs, "doc_id").collect()
        b = hash_split(docs.repartition(7, "lang"), "doc_id").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        splits = {r.split for r in a}
        assert splits == {"train", "valid", "test"}


class TestStratifiedSample:
    def test_stable_under_repartition_and_rate_bounded(self, spark, sf_dir):
        """Membership is a pure function of doc_id: identical rows at any
        partitioning; per-stratum keep-rates land near the requested pct."""
        from kafka_connect_streams_spark.operators.text import stratified_sample
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "lang")
        rates = {"en": 10}
        a = stratified_sample(docs, "doc_id", "lang", rates, default_rate=50)
        b = stratified_sample(docs.repartition(9, "lang"), "doc_id", "lang",
                              rates, default_rate=50)
        ra = sorted(map(tuple, a.collect()))
        assert ra == sorted(map(tuple, b.collect()))
        n_en = docs.filter("lang = 'en'").count()
        k_en = a.filter("lang = 'en'").count()
        # md5 buckets are near-uniform: 10% ± a generous binomial margin
        assert 0.02 <= k_en / n_en <= 0.25, (k_en, n_en)


class TestRedaction:
    def test_counts_and_hash_match_python_reference(self, spark):
        import hashlib
        import re as pyre

        from kafka_connect_streams_spark.operators.text import redact_terms
        rows = [(1, "the key to the value is the key"),
                (2, "no hits here"), (3, "secret secret secret")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        pat = r"\b(key|value|secret)\b"
        got = {r.doc_id: (r.n_hits, r.redacted_md5)
               for r in redact_terms(df, "text", "doc_id", pat).collect()}
        for doc_id, text in rows:
            hits = len(pyre.findall(pat, text))
            red = pyre.sub(pat, "[REDACTED]", text)
            assert got[doc_id] == (hits, hashlib.md5(red.encode()).hexdigest())


class TestSequencePacking:
    def test_packs_respect_budget_and_are_deterministic(self, spark, sf_dir):
        """Every pack except possibly the last of each bucket stays within
        budget + one document's overflow; assignment is repartition-stable."""
        from kafka_connect_streams_spark import queries as Q
        a = Q.q_sequence_packing(spark, sf_dir).collect()
        b = Q.q_sequence_packing(spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        budget = 2048
        for r in a:
            # chunking closes a pack only once it crosses the budget, so a
            # pack can exceed it by at most one doc's tokens — but the
            # PREVIOUS cumulative stays under: pack_tokens < budget + max_doc
            assert r.pack_tokens < budget * 2, r


class TestFrameSampling:
    def test_sample_frames_shape_and_determinism(self, spark, sf_dir):
        from kafka_connect_streams_spark.operators.multimodal import (
            attach_payload, sample_frames)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        media = attach_payload(docs, "text", "doc_id")
        frames = sample_frames(media, n_frames=4)
        rows = frames.collect()
        assert len(rows) == 20 * 4
        # evenly spaced, monotone offsets per doc; md5 stable across runs
        again = {(r.doc_id, r.frame_idx): r.frame_hash
                 for r in sample_frames(media, n_frames=4).collect()}
        for r in rows:
            assert again[(r.doc_id, r.frame_idx)] == r.frame_hash


class TestMediaNeardup:
    @staticmethod
    def _simhash_ref(payload: bytes, bits=48, gram_bytes=4, stride=2):
        """Sequential mirror of payload_simhash's exact arithmetic."""
        import hashlib
        hx = payload.hex().upper()
        gb2, st2 = gram_bytes * 2, stride * 2
        grams = {hx[i:i + gb2]
                 for i in range(0, max(len(hx) - gb2, 0) + 1, st2)
                 if len(hx[i:i + gb2]) == gb2}
        fp = 0
        for b in range(bits):
            vote = sum(1 if (int(hashlib.md5(g.encode()).hexdigest()[:12],
                                 16) >> b) & 1 else -1 for g in grams)
            if vote > 0:
                fp |= 1 << b
        return fp

    def test_fingerprint_matches_python_reference(self, spark):
        from kafka_connect_streams_spark.operators.multimodal import (
            attach_payload, payload_simhash)
        docs = [(0, "the quick brown fox jumps over the lazy dog"),
                (1, "the quick brown fox jumps over the lazy cat"),
                (2, None), (3, "zz")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.simhash for r in payload_simhash(
            attach_payload(df, "text", "doc_id")).collect()}
        for i, text in docs:
            want = self._simhash_ref((text or "").encode())
            assert got[i] == want, (i, got[i], want)

    def test_pairs_match_banded_brute_force(self, spark):
        """Operator pairs == the Python reference's banded-candidate +
        Hamming-verify walk (cap included): identical payloads pair at
        hamming 0, NULL-text docs pair on the zero fingerprint, and no
        pair survives without a shared clean band."""
        from kafka_connect_streams_spark.operators.multimodal import (
            attach_payload, media_neardup)
        texts = {0: "alpha beta gamma delta epsilon zeta eta theta iota",
                 1: "alpha beta gamma delta epsilon zeta eta theta iota",
                 2: "completely different content with other words here",
                 3: None, 4: None,
                 5: "alpha beta gamma delta epsilon zeta eta theta iotz"}
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = sorted((r.id_a, r.id_b, r.hamming) for r in media_neardup(
            attach_payload(df, "text", "doc_id"), "payload", "doc_id",
            bits=48, bands=4, max_hamming=3, max_bucket=50).collect())
        fps = {i: self._simhash_ref((t or "").encode())
               for i, t in texts.items()}
        bands = {}
        for i, fp in fps.items():
            for b in range(4):
                bands.setdefault((b, (fp >> (b * 12)) & 4095,),
                                 []).append(i)
        want = set()
        for members in bands.values():
            if len(members) > 50:
                continue
            for x in members:
                for y in members:
                    if x < y and bin(fps[x] ^ fps[y]).count("1") <= 3:
                        want.add((x, y, bin(fps[x] ^ fps[y]).count("1")))
        assert got == sorted(want), (got, sorted(want))
        assert (0, 1, 0) in want            # identical payloads
        assert (3, 4, 0) in want            # NULL-text pair on fp 0

    def test_bands_must_divide_bits(self, spark):
        """Review finding: bands that don't divide bits (or exceed
        them) gave band_bits=0 → every key 0 → silently zero pairs;
        must raise instead."""
        import pytest

        from kafka_connect_streams_spark.operators.multimodal import (
            attach_payload, media_neardup)
        df = attach_payload(spark.createDataFrame(
            [(0, "x")], "doc_id long, text string"), "text", "doc_id")
        with pytest.raises(ValueError, match="divide bits"):
            media_neardup(df, "payload", "doc_id", bits=8, bands=16)
        with pytest.raises(ValueError, match="divide bits"):
            media_neardup(df, "payload", "doc_id", bits=48, bands=5)


def test_repetition_signals_flag_degenerate_docs(spark):
    """A doc that is one token repeated must score minimal distinct ratio,
    full top-token share, and full duplicate-bigram fraction; a doc of all
    unique tokens scores the opposite extremes."""
    from kafka_connect_streams_spark.operators.text import repetition_signals
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "alpha beta gamma delta")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            repetition_signals(df, "text", "doc_id").collect()}
    assert rows[1].n_tokens == 4 and rows[1].n_distinct == 1
    assert rows[1].top_token_share_e9 == 1_000_000_000
    assert rows[1].dup_bigram_frac_e9 > 0
    assert rows[2].distinct_ratio_e9 == 1_000_000_000
    assert rows[2].dup_bigram_frac_e9 == 0


class TestChunkDocuments:
    def test_chunk_coverage_and_overlap(self, spark):
        """Chunk k covers tokens [k·stride, k·stride+size); every token is
        covered, consecutive chunks overlap by size−stride, short docs get
        exactly one chunk, empty docs none."""
        import hashlib
        from kafka_connect_streams_spark.operators.text import chunk_documents
        docs = [(0, " ".join(f"t{i}" for i in range(10))),   # 10 toks → 1 chunk
                (1, " ".join(f"t{i}" for i in range(16))),   # exactly size
                (2, " ".join(f"t{i}" for i in range(17))),   # size+1 → 2 chunks
                (3, " ".join(f"t{i}" for i in range(100))),  # long
                (4, "   ")]                                   # empty → 0 chunks
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {}
        for r in chunk_documents(df, "text", "doc_id",
                                 size=16, stride=12).collect():
            got.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_tokens,
                                                        r.chunk_fp)
        assert set(got[0]) == {0} and got[0][0][0] == 10
        assert set(got[1]) == {0} and got[1][0][0] == 16
        assert set(got[2]) == {0, 1} and got[2][1][0] == 5
        assert 4 not in got
        for doc_id, text in docs[:4]:
            toks = text.split()
            n_extra = max(0, -(-(len(toks) - 16) // 12))
            assert set(got[doc_id]) == set(range(n_extra + 1))
            for k, (n_tok, fp) in got[doc_id].items():
                chunk = toks[k * 12:k * 12 + 16]
                assert n_tok == len(chunk)
                assert fp == hashlib.md5(" ".join(chunk).encode()).hexdigest()


class TestTokenBudgetSample:
    def test_bin_accelerated_equals_naive_window(self, spark, sf_dir):
        """The 256-bin two-level plan must keep EXACTLY the rows the naive
        per-stratum running-sum window keeps."""
        import hashlib
        from kafka_connect_streams_spark.operators.text import (
            token_budget_sample)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = {r.doc_id: (r.source, r.n_tok, r.cum_tok) for r in
               token_budget_sample(docs, "text", "doc_id", "source",
                                   budget=700).collect()}
        by_src: dict = {}
        for r in docs.select("doc_id", "source", "text").collect():
            h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
            n = len([t for t in r.text.split() if t])
            by_src.setdefault(r.source, []).append((h, r.doc_id, n))
        want = {}
        for src, rows in by_src.items():
            cum = 0
            for h, doc_id, n in sorted(rows):
                cum += n
                if cum <= 700:
                    want[doc_id] = (src, n, cum)
        assert got == want
        # budget is actually binding: some but not all rows kept
        assert 0 < len(got) < docs.count()


class TestQualityBuckets:
    def test_terciles_are_balanced_and_ordered(self, spark, sf_dir):
        """Per language: bucket sizes within one bin of n/3 of each other,
        and every head doc scores ≥ every middle doc ≥ every tail doc."""
        from kafka_connect_streams_spark.operators.text import quality_buckets
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = quality_buckets(docs, "text", "doc_id", "lang").collect()
        assert len(rows) == docs.count()
        per_lang: dict = {}
        for r in rows:
            per_lang.setdefault(r.lang, []).append((r.qbin, r.bucket))
        order = {"head": 0, "middle": 1, "tail": 2}
        for lang, items in per_lang.items():
            n = len(items)
            # monotone: sorting by qbin desc must group buckets contiguously
            by_bin = sorted(items, key=lambda t: -t[0])
            ranks = [order[b] for _, b in by_bin]
            assert ranks == sorted(ranks), (lang, by_bin[:10])
            counts = {b: sum(1 for _, x in items if x == b) for b in order}
            # cuts land on bin boundaries, so thirds are approximate; with
            # ~1000 bins over this corpus each bucket stays within 25% of n/3
            for b, c in counts.items():
                assert abs(c - n / 3) <= max(2, n * 0.25), (lang, counts)


class TestProductQuantization:
    def test_pq_codes_and_adc_match_numpy_reference(self, spark, sf_dir):
        """PQ encode (codebook sample, per-subspace argmin codes) and ADC
        scoring must equal an independent numpy int64 reference."""
        import hashlib
        import numpy as np
        from pyspark.sql import functions as F
        from kafka_connect_streams_spark.operators.similarity import (
            pq_codebooks, topk_pq_l2)
        vecs = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select(F.col("vec_id").alias("id"), "embedding").limit(200))
        rows = vecs.collect()
        q = {r.id: np.floor(np.asarray(r.embedding, dtype=np.float64)
                            * 10000.0 + 0.5).astype(np.int64) for r in rows}
        # reference codebooks: 16 ids by (md5(id), id), 8 subspaces of 8
        order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode())
                                         .hexdigest(), i))[:16]
        books = [[q[i][m * 8:(m + 1) * 8] for i in order] for m in range(8)]
        got_books = pq_codebooks(vecs, 8, 16)
        assert [[list(c) for c in bm] for bm in got_books] == \
               [[list(c) for c in bm] for bm in books]

        ids = sorted(q)
        queries = [i for i in ids if i % 100 == 0]
        cands = [i for i in ids if i % 100 != 0]
        codes = {c: [min(range(16), key=lambda k: (
            int(((q[c][m*8:(m+1)*8] - books[m][k]) ** 2).sum()), k))
            for m in range(8)] for c in cands}
        want = {}
        for qi in queries:
            tabs = [[int(((q[qi][m*8:(m+1)*8] - books[m][k]) ** 2).sum())
                     for k in range(16)] for m in range(8)]
            scored = sorted(
                ((sum(tabs[m][codes[c][m]] for m in range(8)), c)
                 for c in cands))
            want[qi] = [(c, d) for d, c in scored[:5]]
        got = {}
        res = topk_pq_l2(vecs.filter(F.col("id") % 100 == 0),
                         vecs.filter(F.col("id") % 100 != 0),
                         k=5, books=got_books).collect()
        for r in sorted(res, key=lambda r: (r.q_id, r.rank)):
            got.setdefault(r.q_id, []).append((r.c_id, r.adc_dist))
        assert got == want


class TestPartitioningInvariance:
    def test_results_identical_across_shuffle_widths(self, spark, sf_dir):
        """The determinism claims (md5 ordering, fixed-point arithmetic,
        total-order tie-breaks) mean results must be IDENTICAL when the
        shuffle width changes — the property that makes retries, cluster
        resizes, and AQE re-plans safe. Run the repartition-sensitive
        queries at 5 and 32 shuffle partitions and compare row sets."""
        from kafka_connect_streams_spark import queries as Q
        tricky = ["training_order", "token_budget_sample",
                  "sequence_packing", "ccnet_buckets", "mix_weights",
                  "dedup_minhash_lsh", "lm_doc_score",
                  "boilerplate_removal", "min_cost_supplier",
                  "dominant_suppliers",
                  # r12: the migrated min+join first-occurrence shapes
                  # and the banded payload pairs — the queries whose
                  # determinism story this round rewrote
                  "block_dedup", "block_dedup_minspan", "media_neardup",
                  # r13: the DF-window→groupBy+join migration and the
                  # Arrow decode path (conditional repartition branch)
                  "tfidf_topk", "media_phash",
                  # r13 video batch: the per-frame Arrow decode fan-out,
                  # the synthetic-id banding collapse, and the per-video
                  # lag window
                  "media_videofp", "video_neardup", "video_scene_cuts"]
        results = {}
        for width in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            try:
                for name in tricky:
                    rows = sorted(map(tuple,
                                      Q.QUERIES[name](spark, sf_dir).collect()))
                    results.setdefault(name, []).append(rows)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "32")
        for name, (a, b) in results.items():
            assert a == b, f"{name} differs across shuffle widths"

    def test_kmeans_codebooks_match_numpy_lloyd(self, spark, sf_dir):
        """The distributed trainer must replicate a bit-exact numpy Lloyd
        loop: hash-sample init, squared-L2 argmin with ties→lowest code,
        int64 floor-average recentering, empty clusters keep their
        centroid."""
        import hashlib
        import numpy as np
        from pyspark.sql import functions as F
        from kafka_connect_streams_spark.operators.similarity import (
            kmeans_subspace_codebooks, pq_codebooks)
        vecs = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select(F.col("vec_id").alias("id"), "embedding").limit(150))
        rows = vecs.collect()
        q = {r.id: np.floor(np.asarray(r.embedding, dtype=np.float64)
                            * 10000.0 + 0.5).astype(np.int64) for r in rows}
        order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode())
                                         .hexdigest(), i))[:16]
        books = [[[int(v) for v in q[i][m*8:(m+1)*8]] for i in order]
                 for m in range(8)]
        for _ in range(3):
            sums = {}
            for x in q.values():
                for m in range(8):
                    sv = x[m*8:(m+1)*8]
                    code = min(range(16), key=lambda k: (
                        int(((sv - np.asarray(books[m][k])) ** 2).sum()), k))
                    n, s = sums.get((m, code), (0, np.zeros(8, np.int64)))
                    sums[(m, code)] = (n + 1, s + sv)
            books = [[[int(v) // n for v in s] if (m, k) in sums else books[m][k]
                      for k in range(16)
                      for n, s in [sums.get((m, k), (1, books[m][k]))]]
                     for m in range(8)]
        got = kmeans_subspace_codebooks(vecs, 8, 16, iters=3)
        got = [[[int(v) for v in c] for c in bm] for bm in got]
        assert got == books

    def test_kmeans_coarse_centroids_match_numpy_lloyd(self, spark, sf_dir):
        """The trained IVF coarse quantizer must replicate a bit-exact
        numpy full-vector Lloyd loop: 'c:'-salted hash-sample init,
        squared-L2 argmin with ties→lowest list, int64 floor-average
        recentering, empty lists keep their centroid."""
        import hashlib
        import numpy as np
        from pyspark.sql import functions as F
        from kafka_connect_streams_spark.operators.similarity import (
            kmeans_coarse_centroids)
        vecs = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select(F.col("vec_id").alias("id"), "embedding").limit(150))
        rows = vecs.collect()
        q = {r.id: np.floor(np.asarray(r.embedding, dtype=np.float64)
                            * 10000.0 + 0.5).astype(np.int64) for r in rows}
        order = sorted(q, key=lambda i: (
            hashlib.md5(f"c:{i}".encode()).hexdigest(), i))[:8]
        cents = [q[i].copy() for i in order]
        for _ in range(3):
            sums = {}
            for x in q.values():
                j = min(range(8), key=lambda c: (
                    int(((x - cents[c]) ** 2).sum()), c))
                n, s = sums.get(j, (0, np.zeros(len(x), np.int64)))
                sums[j] = (n + 1, s + x)
            cents = [np.asarray([int(v) // n for v in s], np.int64)
                     if j in sums else cents[j]
                     for j in range(8)
                     for n, s in [sums.get(j, (1, cents[j]))]]
        got = kmeans_coarse_centroids(vecs, n_lists=8, iters=3)
        assert [[int(v) for v in c] for c in got] == \
               [[int(v) for v in c] for c in cents]


class TestSemanticDedup:
    def test_matches_numpy_reference(self, spark):
        """semantic_dedup ≡ an independent numpy implementation of the same
        contract: int64-quantized cosine, nearest-of-16-lowest-id centroids
        (ties → lowest centroid), drop x iff a same-cluster y with id < x
        has cosine ≥ τ."""
        import numpy as np
        from pyspark.sql import functions as F
        from kafka_connect_streams_spark.operators.similarity import (
            semantic_dedup)

        rng = np.random.RandomState(7)
        base = rng.randn(6, 8)
        vecs = []
        for i in range(48):
            v = base[i % 6] + rng.randn(8) * (0.01 if i % 3 == 0 else 0.6)
            vecs.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(vecs, "id long, embedding array<float>")

        q = {i: np.floor(np.array(v, dtype=np.float64) * 10000.0 + 0.5
                         ).astype(np.int64) for i, v in vecs}

        def cos(a, b):
            d = int((q[a] * q[b]).sum())
            return d / np.sqrt(float((q[a] * q[a]).sum())
                               * float((q[b] * q[b]).sum()))

        cents = sorted(q)[:16]
        assign = {}
        for i in q:
            best = max(cents, key=lambda c: (cos(i, c), -c))
            assign[i] = best
        want_keep = {}
        for i in q:
            want_keep[i] = not any(
                j < i and assign[j] == assign[i] and cos(i, j) >= 0.4
                for j in q)
        sizes = {}
        for i, c in assign.items():
            sizes[c] = sizes.get(c, 0) + 1

        got = semantic_dedup(df, n_centroids=16, threshold=0.4).collect()
        assert len(got) == 48
        for r in got:
            assert r.cluster_id == assign[r.vec_id], r
            assert r.keep == want_keep[r.vec_id], r
            assert r.cluster_size == sizes[assign[r.vec_id]], r
        # the dataset has true near-dups: the rule must actually drop some
        assert any(not r.keep for r in got)
        assert any(r.keep for r in got)


class TestAqeInvariance:
    def test_results_identical_with_and_without_aqe(self, spark, sf_dir):
        """Runtime re-planning (AQE coalescing/skew splits/join demotion)
        must never change RESULTS — only plans. Run the partition-
        sensitive queries with adaptive execution off and on, compare row
        sets; any divergence means an operator leaked partitioning into
        its semantics."""
        from kafka_connect_streams_spark import queries as Q
        tricky = ["token_budget_sample", "sequence_packing",
                  "dedup_minhash_lsh", "winnowing_dedup",
                  "semantic_dedup", "exact_k_sample", "winsorize",
                  # r12: the skew-join migration exists FOR AQE's
                  # benefit — prove the re-plan never changes results
                  "block_dedup", "block_dedup_rolling", "media_neardup",
                  # r13: the migrated DF join is the AQE-skew-split target
                  "tfidf_topk",
                  # r13 video batch: the banded frame join is the other
                  # AQE-skew-split target (hot frame buckets)
                  "video_neardup"]
        results = {}
        for aqe in ("false", "true"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            try:
                for name in tricky:
                    rows = sorted(map(tuple,
                                      Q.QUERIES[name](spark, sf_dir).collect()))
                    results.setdefault(name, []).append(rows)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
        for name, (off, on) in results.items():
            assert off == on, f"{name} differs with AQE off vs on"


class TestWinsorize:
    def test_matches_python_rank_reference(self, spark, sf_dir):
        """q_winsorize ≡ a pure-Python reimplementation of the exact
        rank-based p05/p95 convention (value at 1-based rank ceil(q·n)
        under the (value, event_id) total order) and the clipped decimal
        sums — the third implementation alongside Spark and DuckDB."""
        import math
        from decimal import Decimal

        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        rows = load_tables(spark, sf_dir)["events"] \
            .select("event_type", "event_id", "value").collect()
        by_type: dict = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
        want = {}
        for et, vs in by_type.items():
            vs.sort()
            n = len(vs)
            lo = vs[math.ceil(0.05 * n) - 1][0]
            hi = vs[math.ceil(0.95 * n) - 1][0]
            clipped = [min(max(v, lo), hi) for v, _ in vs]
            want[et] = (n,
                        sum(1 for v, _ in vs if v < lo),
                        sum(1 for v, _ in vs if v > hi),
                        lo, hi,
                        float(sum(Decimal(str(round(c, 6))).quantize(
                            Decimal("0.000001")) for c in clipped)))
        got = {r.event_type: (r.n, r.n_clipped_low, r.n_clipped_high,
                              r.lo, r.hi, r.sum_winsorized)
               for r in Q.QUERIES["winsorize"](spark, sf_dir).collect()}
        assert set(got) == set(want)
        for et in want:
            g, w = got[et], want[et]
            assert g[:5] == w[:5], (et, g, w)
            assert abs(g[5] - w[5]) < 1e-3, (et, g[5], w[5])


class TestIntervalJoinProperty:
    """Hypothesis leg for J1: interval_join ≡ a pure-Python O(n·m)
    reference over random keyed event sets (inclusive ±window edges,
    null keys never join)."""

    def test_matches_python_reference(self, spark):
        from hypothesis import given, settings, HealthCheck
        from hypothesis import strategies as st

        from kafka_connect_streams_spark.operators.joins import interval_join

        KEY = st.sampled_from(["a", "b", None])
        EV = st.tuples(KEY, st.integers(min_value=0, max_value=30_000))

        @settings(max_examples=10, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.lists(EV, min_size=0, max_size=8),
               st.lists(EV, min_size=0, max_size=8))
        def run(levs, revs):
            base = 1_700_000_000_000
            ldf = spark.createDataFrame(
                [(k, i, base + off) for i, (k, off) in enumerate(levs)],
                "key string, lid long, ts_ms long"
            ).selectExpr("key", "lid", "timestamp_micros(ts_ms*1000) AS ts")
            rdf = spark.createDataFrame(
                [(k, i, base + off) for i, (k, off) in enumerate(revs)],
                "key string, rid long, ts_ms long"
            ).selectExpr("key", "rid", "timestamp_micros(ts_ms*1000) AS ts")
            got = {(r.l_lid, r.r_rid) for r in interval_join(
                ldf, rdf, key="key", ts="ts", window_ms=10_000).collect()}
            want = {(i, j)
                    for i, (lk, lt) in enumerate(levs)
                    for j, (rk, rt) in enumerate(revs)
                    if lk is not None and lk == rk and abs(lt - rt) <= 10_000}
            assert got == want, (levs, revs, got, want)

        run()


class TestStratifiedSampleProperty:
    def test_matches_python_md5_reference(self, spark):
        """stratified_sample membership ≡ Python md5 bucket arithmetic —
        a function of the row id alone (the repartition-stability claim)."""
        import hashlib

        from kafka_connect_streams_spark.operators.text import (
            stratified_sample)

        rows = [(i, "en" if i % 3 else "de", f"s{i % 4}")
                for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
        rates = {"en": 10, "de": 100}
        got = {r.doc_id for r in stratified_sample(
            df, "doc_id", "lang", rates).collect()}
        want = set()
        for i, lang, _ in rows:
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
            if b < rates[lang]:
                want.add(i)
        assert got == want


class TestAnalyticsReferences:
    def test_funnel_matches_python_reference(self, spark, sf_dir):
        """q_funnel ≡ a Python per-user scan: first view, first later
        click, first later purchase — stage counts must agree."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        evs = load_tables(spark, sf_dir)["events"] \
            .select("user_id", "event_type", "ts").collect()
        per_user: dict = {}
        for r in evs:
            per_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
        n1 = n2 = n3 = 0
        for seq in per_user.values():
            seq.sort()
            t1 = min((t for t, e in seq if e == "view"), default=None)
            if t1 is None:
                continue
            n1 += 1
            t2 = min((t for t, e in seq if e == "click" and t > t1),
                     default=None)
            if t2 is None:
                continue
            n2 += 1
            if any(e == "purchase" and t > t2 for t, e in seq):
                n3 += 1
        got = {r.stage: r.users
               for r in Q.QUERIES["funnel"](spark, sf_dir).collect()}
        assert got == {"1_view": n1, "2_click": n2, "3_purchase": n3}

    def test_rolling_active_users_matches_python_reference(self, spark,
                                                           sf_dir):
        """q_rolling_active_users ≡ a Python set-per-window scan: DAU,
        exact 7-day rolling distinct, e9 stickiness."""
        import datetime

        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        rows = load_tables(spark, sf_dir)["events"] \
            .selectExpr("user_id", "to_date(ts) AS day").distinct().collect()
        by_day: dict = {}
        for r in rows:
            by_day.setdefault(r.day, set()).add(r.user_id)
        want = {}
        for d, users in by_day.items():
            window = set()
            for k in range(7):
                window |= by_day.get(d - datetime.timedelta(days=k), set())
            dau, wau = len(users), len(window)
            want[d] = (dau, wau, dau * 10**9 // wau)
        got = {r.report_day: (r.dau, r.wau, r.stickiness_e9)
               for r in Q.QUERIES["rolling_active_users"](
                   spark, sf_dir).collect()}
        assert got == want

    def test_transition_matrix_matches_python_reference(self, spark, sf_dir):
        """q_transition_matrix ≡ a Python per-user sorted scan with the
        (ts, event_id) tie-break and e9 row normalization."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        evs = load_tables(spark, sf_dir)["events"] \
            .select("user_id", "event_id", "event_type", "ts").collect()
        seqs: dict = {}
        for r in evs:
            seqs.setdefault(r.user_id, []).append(
                (r.ts, r.event_id, r.event_type))
        counts: dict = {}
        for seq in seqs.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        totals: dict = {}
        for (a, _), n in counts.items():
            totals[a] = totals.get(a, 0) + n
        want = {(a, b): (n, n * 10**9 // totals[a])
                for (a, b), n in counts.items()}
        got = {(r.from_type, r.to_type): (r.n, r.p_e9)
               for r in Q.QUERIES["transition_matrix"](
                   spark, sf_dir).collect()}
        assert got == want

    def test_cohort_retention_matches_python_reference(self, spark, sf_dir):
        """q_cohort_retention ≡ a Python first-seen-day bucketing with
        per-(cohort, offset) distinct-user counts."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        evs = load_tables(spark, sf_dir)["events"] \
            .select("user_id", "ts").collect()
        per_user: dict = {}
        for r in evs:
            per_user.setdefault(r.user_id, []).append(r.ts)
        want: dict = {}
        for u, ts_list in per_user.items():
            first = min(ts_list).date()
            for d in {t.date() for t in ts_list}:
                k = (first, (d - first).days)
                want[k] = want.get(k, 0) + 1
        got = {(r.cohort_day.date(), r.day_offset): r.users
               for r in Q.QUERIES["cohort_retention"](
                   spark, sf_dir).collect()}
        assert got == want

    def test_user_journeys_matches_python_reference(self, spark, sf_dir):
        """q_user_journeys ≡ a Python gap-sessionizer (>600s starts a new
        session under the (ts, event_id) total order) with top-20 path
        counting and the (n DESC, path) tie-break."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables

        evs = load_tables(spark, sf_dir)["events"] \
            .select("user_id", "event_id", "event_type", "ts").collect()
        seqs: dict = {}
        for r in evs:
            seqs.setdefault(r.user_id, []).append(
                (r.ts, r.event_id, r.event_type))
        counts: dict = {}
        for seq in seqs.values():
            seq.sort()
            path: list = []
            prev = None
            for ts, _, et in seq:
                us = int(ts.timestamp() * 1_000_000)
                if prev is not None and us - prev > 600_000_000:
                    p = ">".join(path)
                    counts[p] = counts.get(p, 0) + 1
                    path = []
                path.append(et)
                prev = us
            p = ">".join(path)
            counts[p] = counts.get(p, 0) + 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = [(r.path, r.n_sessions)
               for r in Q.QUERIES["user_journeys"](spark, sf_dir).collect()]
        assert got == want


class TestFrequency:
    def test_heavy_hitters_match_brute_force(self, spark):
        """MG candidates + exact second pass ≡ plain groupBy-and-filter,
        on skewed data spread over many partitions (the candidate set is
        partition-dependent; the OUTPUT must not be)."""
        import random

        from kafka_connect_streams_spark.operators.frequency import (
            heavy_hitters_exact)

        rng = random.Random(7)
        # Zipf-ish: word_i has weight 1/(i+1); 40 distinct words
        words = [f"w{rng.choices(range(40), weights=[1/(i+1) for i in range(40)])[0]}"
                 for _ in range(5000)]
        docs = [" ".join(words[i:i + 25]) for i in range(0, 5000, 25)]
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)],
            "doc_id long, text string").repartition(16)
        k = 25
        got = {(r.word, r.cnt) for r in
               heavy_hitters_exact(df, "text", k).collect()}
        from collections import Counter
        exact = Counter(words)
        want = {(w, c) for w, c in exact.items() if c * k > len(words)}
        assert got == want and got  # non-trivial answer

    def test_cms_never_undercounts(self, spark):
        from kafka_connect_streams_spark.operators.frequency import (
            cms_estimate, words_of)

        df = spark.createDataFrame(
            [(i, f"alpha beta w{i % 97} w{i % 31}") for i in range(800)],
            "doc_id long, text string")
        probes = (words_of(df, "text").distinct().limit(40))
        rows = cms_estimate(df, "text", probes).collect()
        assert rows and all(r.overcount_ok for r in rows)
        assert all(r.est >= r.exact for r in rows)

    def test_cms_derived_probes_match_explicit_top10(self, spark):
        """r14 pin: cms_estimate(probes=None) derives its probe set from
        the same pinned word-count table that feeds the sketch — its
        output must be row-identical to passing the explicit top-10
        (count desc, word) probe set, and the exact counts must match a
        driver-side recount. Guards the one-tokenize-pass derivation
        (sketch counters = sum of word counts per cell)."""
        from collections import Counter

        from kafka_connect_streams_spark.operators.frequency import (
            cms_estimate)

        texts = [(i, f"alpha beta w{i % 7} w{i % 13} gamma") for i in
                 range(400)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        derived = cms_estimate(df, "text", probes=None,
                               probe_top=10).collect()
        counts = Counter(w for _i, t in texts for w in t.split())
        top10 = sorted(counts, key=lambda w: (-counts[w], w))[:10]
        explicit_probes = spark.createDataFrame(
            [(w,) for w in top10], "word string")
        explicit = cms_estimate(df, "text", explicit_probes).collect()
        as_tuples = lambda rows: sorted(  # noqa: E731
            (r.word, r.exact, r.est, r.overcount_ok) for r in rows)
        assert as_tuples(derived) == as_tuples(explicit)
        assert {r.word for r in derived} == set(top10)
        assert all(r.exact == counts[r.word] for r in derived)


class TestGraph:
    def test_triangle_census_on_known_graphs(self, spark):
        from kafka_connect_streams_spark.operators.graph import (
            triangle_census)

        # K4 = 4 triangles, 6 edges, C(3,2)*4/... wedges = sum C(3,2)=12
        k4 = spark.createDataFrame(
            [(a, b) for a in range(4) for b in range(4) if a < b],
            "a long, b long")
        r = triangle_census(k4).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
        assert r.gcc_e9 == 1000000000  # 3*4/12
        # path graph: no triangles
        path = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "a long, b long")
        r = triangle_census(path).collect()[0]
        assert r.n_triangles == 0 and r.gcc_e9 == 0

    def test_triangle_census_matches_brute_force_random(self, spark):
        import itertools
        import random

        from kafka_connect_streams_spark.operators.graph import (
            triangle_census)

        rng = random.Random(13)
        edges = sorted({tuple(sorted(rng.sample(range(30), 2)))
                        for _ in range(120)})
        eset = set(edges)
        want = sum(1 for a, b, c in itertools.combinations(range(30), 3)
                   if (a, b) in eset and (b, c) in eset and (a, c) in eset)
        df = spark.createDataFrame(edges, "a long, b long")
        assert triangle_census(df).collect()[0].n_triangles == want


class TestLayout:
    def test_zorder_key_interleaves_bits(self, spark):
        from kafka_connect_streams_spark.operators.layout import zorder_key

        df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
        z = df.select(zorder_key(F.col("x"), F.col("y"), bits=3)
                      .alias("z")).collect()[0].z
        # x bits at even positions, y bits at odd: x=101,y=011 -> 011011
        assert z == 0b011011

    def test_skyline_matches_brute_force(self, spark):
        import random

        from kafka_connect_streams_spark.operators.layout import skyline2d

        rng = random.Random(5)
        pts = [(i, rng.randrange(50), rng.randrange(50))
               for i in range(400)]
        # duplicate some points to exercise the tie rules
        pts += [(1000 + i, x, y) for i, (_, x, y) in enumerate(pts[:10])]
        df = spark.createDataFrame(pts, "pid long, x long, y long") \
                  .repartition(8)
        got = {(r.pid, r.x, r.y) for r in
               skyline2d(df, "x", "y", "pid").collect()}
        want = {(p, x, y) for (p, x, y) in pts
                if not any((dx <= x and dy <= y and (dx < x or dy < y))
                           for (_, dx, dy) in pts)}
        assert got == want and got


class TestSketchAlgebra:
    def test_kmv_exact_when_sets_smaller_than_k(self, spark):
        """Sets with < k distinct members: the sketch IS the set, every
        estimate must equal its exact counterpart."""
        from kafka_connect_streams_spark.operators.frequency import (
            kmv_report)

        rows = ([("A", i) for i in range(30)]
                + [("B", i) for i in range(20, 50)])
        df = spark.createDataFrame(rows, "s string, e long")
        r = kmv_report(df, "s", "e", k=64).collect()[0]
        assert (r.exact_a, r.exact_b, r.exact_union,
                r.exact_intersect) == (30, 30, 50, 10)
        assert (r.est_a, r.est_b, r.est_union,
                r.est_intersect) == (30, 30, 50, 10)
        assert r.within_bound

    def test_kmv_bound_holds_on_large_sets(self, spark):
        from kafka_connect_streams_spark.operators.frequency import (
            kmv_report)

        rows = ([("A", i) for i in range(3000)]
                + [("B", i) for i in range(1500, 4500)])
        df = spark.createDataFrame(rows, "s string, e long") \
                  .repartition(16)
        r = kmv_report(df, "s", "e", k=64).collect()[0]
        assert (r.exact_a, r.exact_union, r.exact_intersect) \
            == (3000, 4500, 1500)
        assert r.within_bound  # 4·RSE @ k=64 ≈ ±50%


class TestBloomSemijoin:
    def test_counts_and_soundness(self, spark):
        from kafka_connect_streams_spark.operators.membership import (
            bloom_semijoin_report)

        build = spark.createDataFrame(
            [(i,) for i in range(0, 200)], "k long")
        probe = spark.createDataFrame(
            [(i,) for i in range(100, 1100)], "k long")
        r = bloom_semijoin_report(build, "k", probe, "k").collect()[0]
        assert r.n_probe == 1000 and r.n_true == 100
        assert r.no_false_negatives and r.n_bloom_pass >= r.n_true
        assert r.n_false_pos == r.n_bloom_pass - r.n_true
        assert r.fp_e6 == r.n_false_pos * 1_000_000 // 900


class TestInvertedIndex:
    def test_postings_reconstruct_doc_lists(self, spark):
        from collections import defaultdict

        from kafka_connect_streams_spark.operators.indexing import (
            inverted_index)

        docs = [(i, f"alpha w{i % 7} beta w{i % 3}") for i in range(40)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = inverted_index(df, "text", "doc_id", block_size=16) \
            .collect()
        want = defaultdict(set)
        for i, t in docs:
            for w in t.split():
                want[(w, i // 16)].add(i)
        got = {}
        for r in rows:
            gaps = [int(g) for g in r.postings.split(",")]
            ids, acc = [], 0
            for g in gaps:
                acc += g
                ids.append(acc)
            assert r.df == len(ids) and ids == sorted(ids)
            got[(r.word, r.block)] = set(ids)
        assert got == {k: v for k, v in want.items()}


class TestBpeMerges:
    def test_matches_python_reference(self, spark):
        """3 rounds ≡ a Python BPE trainer with the same conventions:
        all-position pair counts, no self-merges, (count DESC, lhs,
        rhs) tie order, per-position merge application."""
        from collections import Counter

        from kafka_connect_streams_spark.operators.bpe import bpe_merges

        docs = [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the hat of the cat",
             "a rat ate the oat", "that cat s hat", "thee see thee"])]
        df = spark.createDataFrame(docs, "doc_id long, text string")

        wf = Counter(w for _, t in docs for w in t.split())
        syms = {w: list(w) for w in wf}
        want = []
        for r in range(1, 4):
            pc = Counter()
            for w, s in syms.items():
                for i in range(len(s) - 1):
                    if s[i] != s[i + 1]:
                        pc[(s[i], s[i + 1])] += wf[w]
            if not pc:
                break
            (a, b), c = min(pc.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            for w, s in syms.items():
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                syms[w] = ns
            n_after = sum(wf[w] * len(s) for w, s in syms.items())
            want.append((r, a, b, c, n_after))

        got = [(r.round, r.lhs, r.rhs, r.pair_count, r.n_tokens_after)
               for r in bpe_merges(spark, df, "text", "doc_id",
                                   rounds=3).collect()]
        assert got == want and len(got) == 3


class TestBpeEncode:
    @staticmethod
    def _py_encode(text, merges):
        """Python reference encoder: \\W+ split, per-word sequential
        greedy merge application (equivalent to the per-position form
        because lhs ≠ rhs forbids overlaps), md5-affine 48-bit ids."""
        import hashlib
        import re
        toks = []
        for w in re.split(r"\W+", (text or "").lower()):
            if not w:
                continue
            s = list(w)
            for a, b in merges:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                s = ns
            toks.extend(s)
        ids = [int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
               for t in toks]
        return len(toks), ids

    def test_matches_python_reference(self, spark):
        """Chained merges (a learned token feeding a later merge),
        NULL/empty docs, and the id hashing all match the Python
        encoder exactly."""
        from kafka_connect_streams_spark.operators.bpe import bpe_encode
        merges = [("t", "h"), ("th", "e"), ("a", "t")]
        docs = [(0, "the cat sat on the mat"), (1, "that hat thee"),
                (2, None), (3, ""), (4, "a"), (5, "atthe  that!")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, list(r.token_ids))
               for r in bpe_encode(df, "text", "doc_id",
                                   merges).collect()}
        want = {i: self._py_encode(t, merges) for i, t in docs}
        assert got == want
        assert got[2] == (0, [])  # NULL text ≡ empty doc

    def test_matches_python_reference_random(self, spark):
        """Hypothesis leg: arbitrary merge tables (lhs ≠ rhs, including
        multi-char tokens produced by earlier merges) over random
        corpora — the in-row fold ≡ the sequential greedy encoder."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from kafka_connect_streams_spark.operators.bpe import bpe_encode

        WORD = st.text(alphabet="abc", min_size=1, max_size=6)
        DOC = st.lists(WORD, min_size=0, max_size=5).map(" ".join)
        TOK = st.text(alphabet="abc", min_size=1, max_size=2)
        MERGE = st.tuples(TOK, TOK).filter(lambda p: p[0] != p[1])

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.lists(DOC, min_size=1, max_size=4),
               st.lists(MERGE, min_size=0, max_size=3))
        def run(docs, merges):
            # let earlier merges feed later ones, as training would
            chain = []
            for a, b in merges:
                chain.append((a, b))
                if len(chain) >= 2:
                    prev = chain[-2]
                    if prev[0] + prev[1] != b:
                        chain[-1] = (prev[0] + prev[1], b)
            chain = [(a, b) for a, b in chain if a != b]
            df = spark.createDataFrame(
                [(i, d) for i, d in enumerate(docs)],
                "doc_id long, text string")
            got = {r.doc_id: (r.n_tokens, list(r.token_ids))
                   for r in bpe_encode(df, "text", "doc_id",
                                       chain).collect()}
            want = {i: self._py_encode(d, chain)
                    for i, d in enumerate(docs)}
            assert got == want, (docs, chain)

        run()


class TestZorderCrossEngine:
    def test_zorder_key_matches_generated_sql_bit_for_bit(self, spark):
        """The Spark Column builder and the SQL-text generator must stay
        in lockstep — the oracle depends on it."""
        import random

        import duckdb

        from kafka_connect_streams_spark.operators.layout import (
            zorder_key, zorder_sql)

        rng = random.Random(11)
        pts = [(rng.randrange(1 << 12), rng.randrange(1 << 12))
               for _ in range(200)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = [r.z for r in df.select(
            zorder_key(F.col("x"), F.col("y"), bits=12).alias("z"))
            .collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                    + ",".join(f"({x},{y})" for x, y in pts)
                    + ") v(x, y)")
        want = [r[0] for r in con.execute(
            f"SELECT {zorder_sql('x', 'y', bits=12)} FROM t").fetchall()]
        assert got == want


class TestBpeMergesProperty:
    """Hypothesis leg for bpe_merges: the Spark trainer ≡ the Python
    reference (all-position pair counts, no self-merges, the
    (count DESC, lhs, rhs) tie order, per-position application) on
    random small corpora — ties and short/1-char words included."""

    def test_matches_python_reference_random(self, spark):
        from collections import Counter

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from kafka_connect_streams_spark.operators.bpe import bpe_merges

        WORD = st.text(alphabet="abc", min_size=1, max_size=5)
        DOC = st.lists(WORD, min_size=1, max_size=6).map(" ".join)

        def reference(docs, rounds=2):
            wf = Counter(w for t in docs for w in t.split())
            syms = {w: list(w) for w in wf}
            out = []
            for r in range(1, rounds + 1):
                pc = Counter()
                for w, s in syms.items():
                    for i in range(len(s) - 1):
                        if s[i] != s[i + 1]:
                            pc[(s[i], s[i + 1])] += wf[w]
                if not pc:
                    break
                (a, b), c = min(
                    pc.items(),
                    key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
                for w, s in syms.items():
                    ns, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            ns.append(a + b)
                            i += 2
                        else:
                            ns.append(s[i])
                            i += 1
                    syms[w] = ns
                out.append((r, a, b, c,
                            sum(wf[w] * len(s) for w, s in syms.items())))
            return out

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.lists(DOC, min_size=1, max_size=5))
        def run(docs):
            df = spark.createDataFrame(
                [(i, d) for i, d in enumerate(docs)],
                "doc_id long, text string")
            got = [(r.round, r.lhs, r.rhs, r.pair_count, r.n_tokens_after)
                   for r in bpe_merges(spark, df, "text", "doc_id",
                                       rounds=2).collect()]
            assert got == reference(docs), docs

        run()


class TestHeavyHittersProperty:
    """Hypothesis leg: MG two-pass output is exact under adversarial
    skew and tiny k — including the all-same-word and all-distinct
    extremes where the candidate machinery degenerates."""

    def test_exact_under_random_skew(self, spark):
        from collections import Counter

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from kafka_connect_streams_spark.operators.frequency import (
            heavy_hitters_exact)

        WORD = st.sampled_from(["x", "y", "z", "w1", "w2", "w3"])

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.lists(WORD, min_size=1, max_size=120),
               st.integers(min_value=2, max_value=6))
        def run(words, k):
            docs = [" ".join(words[i:i + 7])
                    for i in range(0, len(words), 7)]
            df = spark.createDataFrame(
                [(i, d) for i, d in enumerate(docs)],
                "doc_id long, text string").repartition(5)
            got = {(r.word, r.cnt) for r in
                   heavy_hitters_exact(df, "text", k).collect()}
            exact = Counter(words)
            want = {(w, c) for w, c in exact.items()
                    if c * k > len(words)}
            assert got == want, (words, k)

        run()


class TestBlockDedup:
    """block_dedup vs a sequential Python reference: first global
    occurrence (by doc_id, block_id) of each block survives, documents
    rebuild from survivors in block order."""

    @staticmethod
    def _reference(docs, size):
        import hashlib
        import re as _re
        seen, out = set(), {}
        for doc_id, text in sorted(docs):
            toks = [t for t in _re.split(r"\W+", (text or "").lower())
                    if t]
            if not toks:
                continue
            nb = -(-len(toks) // size)
            kept = []
            for i in range(nb):
                b = " ".join(toks[i * size:(i + 1) * size])
                if b not in seen:
                    seen.add(b)
                    kept.append(b)
            ktext = " ".join(kept)
            out[doc_id] = (nb, len(kept), len(ktext.split()),
                           hashlib.md5(ktext.encode()).hexdigest())
        return out

    def test_matches_python_reference_fixed(self, spark):
        from kafka_connect_streams_spark.operators.text import block_dedup
        docs = [
            (1, "a b c d e f"),          # blocks: "a b c", "d e f"
            (2, "a b c x y z"),          # first block dup of doc 1
            (3, "d e f a b c"),          # both blocks already seen
            (4, "q r"),                  # short single block
            (5, "a b c d e f q r"),      # everything already seen
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: (r.n_blocks, r.kept_blocks, r.kept_tokens,
                          r.kept_fp)
               for r in block_dedup(df, "text", "doc_id",
                                    size=3).collect()}
        assert got == self._reference(docs, 3)
        assert got[3][1] == 0 and got[5][1] == 0   # fully deduped docs

    def test_hot_boilerplate_fingerprint_correct_under_skew(self, spark):
        """The scenario the r12 migration exists for: thousands of docs
        share ONE boilerplate block (a single hot fingerprint). The
        groupBy-min first-occurrence must stay correct — exactly one
        global survivor of the hot block, every doc's unique block
        kept — for both shapes, with the decision identical between
        them. (Under the old row_number window, this fingerprint's rows
        all landed on one reducer; the aggregate collapses them
        map-side and AQE can split the probe join.)"""
        from kafka_connect_streams_spark.operators.text import block_dedup
        boiler = "terms of service apply all rights reserved inc"  # 8 toks
        docs = [(i, boiler + " " + " ".join(
            f"u{i}w{j}" for j in range(8))) for i in range(2000)]
        df = (spark.createDataFrame(docs, "doc_id long, text string")
              .repartition(16))
        for shape in ("inline", "fp_rejoin"):
            got = {r.doc_id: (r.n_blocks, r.kept_blocks, r.kept_tokens)
                   for r in block_dedup(df, "text", "doc_id", size=8,
                                        shape=shape).collect()}
            assert len(got) == 2000, shape
            assert got[0] == (2, 2, 16), (shape, got[0])
            for i in range(1, 2000):
                assert got[i] == (2, 1, 8), (shape, i, got[i])

    def test_matches_python_reference_random(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from kafka_connect_streams_spark.operators.text import block_dedup

        WORD = st.sampled_from(["a", "b", "c", "d"])
        DOC = st.lists(WORD, min_size=0, max_size=10).map(" ".join)

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.lists(DOC, min_size=1, max_size=6))
        def run(texts):
            docs = [(i, t) for i, t in enumerate(texts)]
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {r.doc_id: (r.n_blocks, r.kept_blocks, r.kept_tokens,
                              r.kept_fp)
                   for r in block_dedup(df, "text", "doc_id",
                                        size=2).collect()}
            assert got == self._reference(docs, 2), docs

        run()

    def test_fp_rejoin_shape_is_output_identical(self, spark, sf_dir):
        """The extreme-scale fp-only shape must be row-identical to the
        inline shape on real corpus data (round-7 verdict #5), including
        fully-deduped and single-block docs."""
        from kafka_connect_streams_spark.operators.text import block_dedup
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = sorted(map(tuple, block_dedup(
            docs, "text", "doc_id", size=8).collect()))
        b = sorted(map(tuple, block_dedup(
            docs, "text", "doc_id", size=8, shape="fp_rejoin").collect()))
        assert a == b
        import pytest
        with pytest.raises(ValueError, match="shape"):
            block_dedup(docs, "text", "doc_id", shape="bogus")


class TestVocabConcentration:
    def test_matches_counter_reference(self, spark):
        from collections import Counter

        from kafka_connect_streams_spark.operators.text import (
            vocab_concentration)
        docs = [
            ("web", "the the the cat sat on the mat"),
            ("web", "the dog sat"),
            ("book", "unique words only here now"),
            ("book", None),
        ]
        df = spark.createDataFrame(docs, "source string, text string")
        got = {r.stratum: (r.n_tokens, r.vocab, r.hapax, r.top_mass,
                           r.ttr_e9, r.hapax_ratio_e9, r.top_share_e9)
               for r in vocab_concentration(df, "text", "source",
                                            top=2).collect()}
        import re as _re
        want = {}
        by_src: dict = {}
        for src, text in docs:
            c = by_src.setdefault(src, Counter())
            c.update(t for t in _re.split(r"\W+", (text or "").lower())
                     if t)
        for src, c in by_src.items():
            n = sum(c.values())
            vocab = len(c)
            hapax = sum(1 for v in c.values() if v == 1)
            top_mass = sum(v for _, v in sorted(
                c.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
            want[src] = (n, vocab, hapax, top_mass,
                         vocab * 10**9 // n, hapax * 10**9 // vocab,
                         top_mass * 10**9 // n)
        assert got == want


class TestCosinePairTopk:
    def test_matches_brute_force(self, spark):
        from collections import Counter

        from kafka_connect_streams_spark.operators.indexing import (
            cosine_pair_topk)
        docs = [
            (1, "apple banana apple cherry"),
            (2, "apple banana banana"),
            (3, "cherry dog emu"),
            (4, "fox grape"),            # no shared terms with 1-3
            (5, "apple banana cherry dog emu fox grape"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r.id_a, r.id_b): (r.dot, r.na, r.nb, r.cos_sq_e9)
               for r in cosine_pair_topk(df, "text", "doc_id",
                                         k=100, max_df=50).collect()}
        import re as _re
        vecs = {i: Counter(t for t in
                           _re.split(r"\W+", (txt or "").lower()) if t)
                for i, txt in docs}
        want = {}
        ids = sorted(vecs)
        for i in ids:
            for j in ids:
                if i >= j:
                    continue
                dot = sum(vecs[i][t] * vecs[j][t] for t in vecs[i])
                if dot == 0:
                    continue          # non-colliding pairs never pair up
                na = sum(v * v for v in vecs[i].values())
                nb = sum(v * v for v in vecs[j].values())
                want[(i, j)] = (dot, na, nb,
                                dot * dot * 10**9 // (na * nb))
        assert got == want
        assert (1, 4) not in got      # disjoint vocab → no candidate row

    def test_max_df_prunes_stopword_fanout(self, spark):
        """A term above max_df must not generate candidate pairs (and is
        excluded from norms, keeping dot/norm consistent)."""
        from kafka_connect_streams_spark.operators.indexing import (
            cosine_pair_topk)
        # 'common' appears in every doc; rare terms pair only 1-2
        docs = [(i, f"common r{i // 2}") for i in range(6)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r.id_a, r.id_b): (r.dot, r.na, r.nb)
               for r in cosine_pair_topk(df, "text", "doc_id",
                                         k=100, max_df=2).collect()}
        # only the rare-term pairs survive: (0,1), (2,3), (4,5)
        assert set(got) == {(0, 1), (2, 3), (4, 5)}
        assert all(v == (1, 1, 1) for v in got.values())

    def test_repetitive_tf_does_not_overflow_ranking_key(self, spark):
        """ADVICE r7: a rare term repeated ~311+ times in two docs pushes
        dot²·1e9 past int64 (max_df caps document frequency, not term
        frequency — think log spam / boilerplate). The DECIMAL(38,0)
        ranking key must stay exact where bigint arithmetic would wrap
        silently under non-ANSI Spark."""
        from kafka_connect_streams_spark.operators.indexing import (
            cosine_pair_topk)
        n = 2000                       # dot = 4e6, dot²·1e9 ≈ 1.6e22
        docs = [(1, " ".join(["zzyzx"] * n)),
                (2, " ".join(["zzyzx"] * n))]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        [r] = cosine_pair_topk(df, "text", "doc_id", k=5).collect()
        assert (r.dot, r.na, r.nb) == (n * n, n * n, n * n)
        assert r.cos_sq_e9 == 10**9   # identical docs → cos² = 1 exactly


class TestAttribution:
    def test_matches_python_reference(self, spark, tmp_path):
        """First/last-touch within the 7-day lookback vs a brute-force
        reference over a crafted event log (touches before, inside, and
        outside the window; a user with no touches)."""
        import datetime as dt

        from kafka_connect_streams_spark import queries as Q

        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        D = dt.timedelta
        rows = [
            # user 1: touches at -8d (outside), -3d, -1h; purchase at 0
            (1, base - D(days=8), 1, "click", 0.0, "{}"),
            (2, base - D(days=3), 1, "view", 0.0, "{}"),
            (3, base - D(hours=1), 1, "click", 0.0, "{}"),
            (4, base, 1, "purchase", 9.0, "{}"),
            # user 2: purchase with NO touches in window
            (5, base - D(days=9), 2, "click", 0.0, "{}"),
            (6, base, 2, "purchase", 5.0, "{}"),
            # user 3: error events never count as touches
            (7, base - D(days=1), 3, "error", 0.0, "{}"),
            (8, base, 3, "purchase", 1.0, "{}"),
        ]
        sf = tmp_path / "sf"
        sf.mkdir()
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string") \
            .write.parquet(str(sf / "events.parquet"))
        got = {r.event_id: (r.first_touch_us, r.last_touch_us,
                            r.n_touches)
               for r in Q.q_attribution(spark, str(sf)).collect()}

        def us(t):
            return int(t.replace(tzinfo=dt.timezone.utc).timestamp()
                       * 1_000_000)

        assert got == {
            4: (us(base - D(days=3)), us(base - D(hours=1)), 2),
            6: (None, None, 0),
            8: (None, None, 0),
        }

    def test_plan_has_no_join(self, spark, sf_dir):
        """Attribution must be ONE per-user window pass — a self-join
        (purchases x touches) would expand per-pair at 100 TB."""
        from kafka_connect_streams_spark import queries as Q
        plan = Q.q_attribution(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" not in plan, plan


class TestScd2Asof:
    def test_snapshot_is_one_row_per_user_containing_t(self, spark,
                                                       sf_dir):
        import datetime as dt

        from kafka_connect_streams_spark import queries as Q
        T = dt.datetime(2024, 1, 15)
        rows = Q.q_scd2_asof(spark, sf_dir).collect()
        users = [r.user_id for r in rows]
        assert len(users) == len(set(users)) > 0
        for r in rows:
            assert r.valid_from <= T
            assert r.valid_to is None or r.valid_to > T

    def test_matches_history_filter(self, spark, sf_dir):
        import datetime as dt

        from kafka_connect_streams_spark import queries as Q
        T = dt.datetime(2024, 1, 15)
        hist = Q.q_scd2_history(spark, sf_dir).collect()
        want = {(r.user_id, r.version) for r in hist
                if r.valid_from <= T and (r.valid_to is None
                                          or r.valid_to > T)}
        got = {(r.user_id, r.version) for r in
               Q.q_scd2_asof(spark, sf_dir).collect()}
        assert got == want


class TestZonemapPrune:
    def test_zorder_prunes_more_and_results_agree(self, spark):
        """The point of the report: identical selected rows under both
        layouts, but the z-order layout skips (strictly, on this data)
        more rows for the y-selective predicate. Pinned to sf0.01: at
        sf0.001 the 256-287 partkey band is above the tiny part table's
        key space, so both layouts degenerate to full pruning (report
        still correct, but the inequality is vacuous)."""
        from kafka_connect_streams_spark import queries as Q
        rows = {r.layout: r for r in
                Q.q_zonemap_prune(spark,
                                  "/root/testdata/sf0.01").collect()}
        lin, z = rows["linear_x"], rows["zorder"]
        assert lin.rows_selected == z.rows_selected
        assert z.rows_skipped > lin.rows_skipped
        assert lin.rows_skipped + lin.rows_scanned \
            == z.rows_skipped + z.rows_scanned


class TestCdcMaterialize:
    def test_tombstone_semantics(self, spark, tmp_path):
        """Last-writer-wins with tombstones: a key whose final op is a
        delete is absent; a delete followed by an upsert resurrects;
        op counts include tombstones."""
        import datetime as dt

        from kafka_connect_streams_spark import queries as Q

        base = dt.datetime(2024, 1, 10)
        D = dt.timedelta
        rows = [
            # user 1: upsert, delete, upsert -> present (resurrected)
            (1, base, 1, "view", 0.0, "{}"),
            (2, base + D(1), 1, "error", 0.0, "{}"),
            (3, base + D(2), 1, "click", 0.0, "{}"),
            # user 2: upsert then delete -> absent
            (4, base, 2, "view", 0.0, "{}"),
            (5, base + D(1), 2, "error", 0.0, "{}"),
            # user 3: same-ts tie broken by event_id (7 wins)
            (6, base, 3, "view", 0.0, "{}"),
            (7, base, 3, "signup", 0.0, "{}"),
        ]
        sf = tmp_path / "sf"
        sf.mkdir()
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string") \
            .write.parquet(str(sf / "events.parquet"))
        got = {r.user_id: (r.last_value, r.n_changes, r.n_deletes)
               for r in Q.q_cdc_materialize(spark, str(sf)).collect()}
        assert got == {1: ("click", 3, 1), 3: ("signup", 2, 0)}


class TestHardNegatives:
    def test_cross_label_and_k_invariants(self, spark, sf_dir):
        from collections import Counter

        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_hard_negatives(spark, sf_dir).collect()
        assert rows, "no anchors sampled"
        per_anchor = Counter(r.q_id for r in rows)
        assert all(n <= 3 for n in per_anchor.values())
        for r in rows:
            assert r.q_label != r.c_label    # negatives only
            assert r.q_id != r.c_id
        # ranks are 1..n and cosine non-increasing within an anchor
        by_a = {}
        for r in rows:
            by_a.setdefault(r.q_id, []).append((r.rank, r.cosine))
        for a, rs in by_a.items():
            rs.sort()
            assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
            assert all(rs[i][1] >= rs[i + 1][1]
                       for i in range(len(rs) - 1))

    def test_recall_eval_against_exact_ground_truth(self, spark, sf_dir):
        """The bucketed miner's recall vs the scale-guarded exact top-3:
        sane bounds, and every approx hit really is an exact pair."""
        from kafka_connect_streams_spark import queries as Q
        [r] = Q.q_hard_negatives_recall(spark, sf_dir).collect()
        assert r.n_anchors > 0 and r.exact_pairs > 0
        assert 0 <= r.hits <= r.exact_pairs
        assert abs(r.recall - r.hits / r.exact_pairs) < 1e-12
        # multiprobe × 4 tables must beat a single selective bucket on
        # this corpus (the whole point of the OR-amplification)
        assert r.recall > 0.2, r

    def test_cosine_pairs_guard_refuses_quadratic_work(self, spark):
        """cosine_pairs with max_pairs set must raise instead of planning
        an over-budget cross join (round-7 verdict: callers could bypass
        topk_cosine's guard)."""
        import pytest

        from kafka_connect_streams_spark.operators.similarity import (
            cosine_pairs)
        vecs = spark.range(200).selectExpr(
            "id", "array(CAST(id AS FLOAT), 1.0F) AS embedding")
        with pytest.raises(ValueError, match="max_pairs"):
            cosine_pairs(vecs, vecs, max_pairs=100)


class TestGlobalIndex:
    def test_contiguous_and_equal_to_naive_window(self, spark, sf_dir):
        """Two-pass distributed ranking must equal row_number() over the
        global (bucket, h, id) order bit-for-bit, and the index set must
        be exactly 0..N-1 (contiguous, no gaps, no dups)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from kafka_connect_streams_spark.operators.layout import (
            global_index)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = global_index(docs, "doc_id", buckets=64)
        n = docs.count()
        idxs = [r.global_idx for r in got.select("global_idx").collect()]
        assert sorted(idxs) == list(range(n))
        h = F.md5(F.col("doc_id").cast("string"))
        naive = (docs.select(
            "doc_id", h.alias("_h"),
            (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 64)
            .alias("bucket"))
            .withColumn("global_idx",
                        F.row_number().over(
                            Window.orderBy("bucket", "_h", "doc_id"))
                        .cast("bigint") - 1)
            .select("doc_id", "bucket", "global_idx"))
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, naive.collect()))


class TestLshTuning:
    def test_sweep_monotonicity_and_bounds(self, spark, sf_dir):
        """More rows per band -> strictly-harder collisions: candidate
        count must be non-increasing down the sweep; recall/precision in
        [0,1]; hits never exceed either count; bands*rows == 16."""
        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_lsh_tuning(spark, sf_dir).collect()
        assert [r.rows_per_band for r in rows] == [1, 2, 4, 8]
        cands = [r.n_candidates for r in rows]
        assert cands == sorted(cands, reverse=True)
        for r in rows:
            assert r.bands * r.rows_per_band == 16
            assert 0 <= r.hits <= min(r.n_candidates, r.true_pairs)
            assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0

    def test_mismatched_setting_raises(self, spark, sf_dir):
        import pytest

        from kafka_connect_streams_spark.operators.dedup import lsh_tuning
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with pytest.raises(ValueError, match="!= k"):
            lsh_tuning(docs, "text", "doc_id", settings=((3, 5),))


class TestBootstrapCi:
    def test_replicates_deterministic_and_calibrated(self, spark, sf_dir):
        """32 Poisson resamples: ci_rank is a permutation of 1..32,
        every replicate's effective n is within 5 sigma of N (Poisson(1)
        per row -> Var(n_eff) = N), every estimate is within 5% of the
        true mean, and the whole result is bit-stable across runs
        (weights are pure md5 functions of (row, replicate))."""
        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_bootstrap_ci(spark, sf_dir).collect()
        assert len(rows) == 32
        assert sorted(r.ci_rank for r in rows) == list(range(1, 33))
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = o.count()
        true_mean = o.agg(F.avg("o_totalprice")).first()[0]
        for r in rows:
            assert abs(r.n_eff - n) <= 5 * n ** 0.5
            assert abs(r.est_mean - true_mean) / true_mean < 0.05
        again = Q.q_bootstrap_ci(spark, sf_dir).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestCopurchasePairs:
    def test_equals_naive_self_join(self, spark, sf_dir):
        """The in-row basket pair expansion must equal the naive
        distinct-pair self-join bit-for-bit, including the top-100
        tiebreak (n_pair DESC, p1, p2) and the lift arithmetic."""
        from pyspark.sql.window import Window

        from kafka_connect_streams_spark import queries as Q
        got = Q.q_copurchase_pairs(spark, sf_dir).collect()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        op = li.select(F.col("l_orderkey").alias("okey"),
                       F.col("l_partkey").alias("pk")).distinct()
        a = op.select("okey", F.col("pk").alias("p1"))
        b = op.select("okey", F.col("pk").alias("p2"))
        pp = (a.join(b, "okey").filter(F.col("p1") < F.col("p2"))
              .groupBy("p1", "p2")
              .agg(F.count("*").cast("bigint").alias("n_pair")))
        pc = op.groupBy("pk").agg(F.count("*").cast("bigint").alias("n_p"))
        n_orders = op.select("okey").distinct().count()
        naive = (pp.join(pc.select(F.col("pk").alias("p1"),
                                   F.col("n_p").alias("n_p1")), "p1")
                 .join(pc.select(F.col("pk").alias("p2"),
                                 F.col("n_p").alias("n_p2")), "p2")
                 .withColumn("lift",
                             (F.col("n_pair") * F.lit(n_orders))
                             .cast("double")
                             / (F.col("n_p1") * F.col("n_p2")))
                 .select("p1", "p2", "n_pair", "n_p1", "n_p2", "lift")
                 .orderBy(F.desc("n_pair"), "p1", "p2").limit(100)
                 .collect())
        assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
        for r in got:
            assert r.p1 < r.p2
            assert r.n_pair <= min(r.n_p1, r.n_p2)
            assert r.lift > 0


class TestSortedNeighborhood:
    def test_rank_equals_global_row_number(self, spark, sf_dir):
        """The order-preserving two-pass rank must equal
        row_number() OVER (ORDER BY key, id) - 1 exactly — prefix-string
        buckets are monotone, so bucket order == key order."""
        from pyspark.sql.window import Window

        from kafka_connect_streams_spark.operators.dedup import (
            _order_preserving_rank)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = docs.select(
            "doc_id",
            F.lower(F.coalesce(F.col("text"), F.lit(""))).alias("_pk"))
        got = {r.doc_id: r._r for r in
               _order_preserving_rank(base, "_pk", "doc_id").collect()}
        naive = {r.doc_id: r.rn for r in base.withColumn(
            "rn", F.row_number().over(Window.orderBy("_pk", "doc_id"))
            .cast("bigint") - 1).collect()}
        assert got == naive

    def test_reverse_pass_catches_suffix_duplicates(self, spark):
        """A planted pair sharing a long suffix but diverging in the
        first character sorts far apart forwards and adjacent reversed
        — the multi-pass union must surface it; pairs are unique with
        id_a < id_b and every survivor honors the distance gate."""
        from kafka_connect_streams_spark.operators.dedup import (
            sorted_neighborhood_pairs)
        filler = [(i, f"{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)} "
                   f"unique row number {i} with its own distinct tail "
                   f"{i * 31}") for i in range(40)]
        planted = [(100, "aaa the shared long suffix that never changes"),
                   (101, "zzz the shared long suffix that never changes")]
        df = spark.createDataFrame(filler + planted,
                                   "doc_id long, text string")
        got = sorted_neighborhood_pairs(df, "text", "doc_id",
                                        window=2).collect()
        pairs = {(r.id_a, r.id_b) for r in got}
        assert (100, 101) in pairs
        assert len(pairs) == len(got)  # no duplicate pair rows
        for r in got:
            assert r.id_a < r.id_b
            assert r.edit_distance * 5 <= r.max_len

    def test_banded_verify_equals_full_distance(self, spark):
        """The threshold-form levenshtein verify must be bit-identical
        to filtering the FULL distance — including the band=0 edge
        (identical strings shorter than 5 chars, where max_len div 5
        is 0 and the banded form must return 0, not -1) and the
        just-above-band rejection."""
        from kafka_connect_streams_spark.operators.dedup import (
            sorted_neighborhood_pairs)
        rows = [(1, "abc"), (2, "abc"),          # dist 0, band 0: keep
                (3, "abd"),                       # dist 1 > band 0: drop
                (10, "x" * 40), (11, "x" * 32 + "y" * 8),  # dist 8 == band
                (20, "q" * 40), (21, "q" * 31 + "z" * 9)]  # dist 9 > band 8
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted_neighborhood_pairs(df, "text", "doc_id", window=7)
        kept = {(r.id_a, r.id_b): r.edit_distance for r in got.collect()}
        assert kept[(1, 2)] == 0
        assert (1, 3) not in kept and (2, 3) not in kept
        assert kept[(10, 11)] == 8
        assert (20, 21) not in kept
        assert all(d >= 0 for d in kept.values())

    def test_non_ascii_combining_chars_match_duckdb_oracle(self, spark):
        """Engine portability with combining characters (r8 ADVICE):
        Spark's ``reverse`` walks code points while DuckDB's walks
        grapheme clusters, so the pre-fix reverse key ordered
        'cafe\\u0301'-style texts differently per engine. Derived SNM
        keys now ASCII-fold first (SNM_PASS_KEYS), so the 3-pass pair
        set must match the registered DuckDB oracle bit-for-bit on a
        corpus where every text carries a combining accent. Edit
        DIFFS between texts are ASCII-only so the levenshtein verify
        agrees too (DuckDB's levenshtein is byte-level, Spark's
        code-point-level — they only diverge when the edited
        characters themselves are multi-byte)."""
        import duckdb

        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.operators.dedup import (
            sorted_neighborhood_pairs)
        acc = "e\u0301"  # decomposed: e + COMBINING ACUTE (2 code points)
        rows = [(i, f"{chr(97 + i % 7)}{chr(97 + (i * 5) % 11)} "
                 f"fill{acc}r row {i} tail caf{acc} {i * 13}")
                for i in range(24)]
        rows += [(100, f"aa the shared suffix caf{acc} never changes"),
                 (101, f"zz the shared suffix caf{acc} never changes")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.id_a, r.id_b, r.n_passes, r.edit_distance, r.max_len)
               for r in sorted_neighborhood_pairs(
                   df, "text", "doc_id", window=8,
                   pass_names=("fwd", "rev", "init_len")).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = {tuple(r) for r in
                con.execute(Q.ORACLE["snm_multikey"]).fetchall()}
        assert got == want
        assert any(p[:2] == (100, 101) for p in got)


class TestQuantileExact:
    def test_equals_naive_window_selection(self, spark, sf_dir):
        """The two-pass histogram selection must equal the naive
        global-sort row_number pick bit-for-bit, for every (group,
        pct) — including the tie-heavy DECIMAL domain."""
        from pyspark.sql.window import Window

        from kafka_connect_streams_spark import queries as Q
        got = {(r.priority, r.pct): r.value
               for r in Q.q_quantile_exact(spark, sf_dir).collect()}
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .select(F.col("o_orderpriority").alias("priority"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("v")))
        w = Window.partitionBy("priority").orderBy("v")
        ranked = (o.withColumn("rk", F.row_number().over(w))
                  .withColumn("n", F.count("*").over(
                      Window.partitionBy("priority"))))
        naive = {}
        for pct in (25, 50, 75, 90, 99):
            rows = ranked.filter(
                F.col("rk") == F.expr(f"(n * {pct} + 99) div 100")
            ).collect()
            for r in rows:
                naive[(r.priority, pct)] = float(r.v)
        assert got == naive

    def test_duplicate_heavy_groups(self, spark):
        """With massive ties the bucket-local row_number order is
        arbitrary but the selected VALUE must still be the unique
        rank-value (percentile_disc semantics)."""
        from kafka_connect_streams_spark.operators.layout import (
            grouped_exact_quantiles)
        rows = ([("a", 10)] * 30 + [("a", 20)] * 30 + [("a", 30)] * 40
                + [("b", 5)])
        df = spark.createDataFrame(rows, "grp string, v long")
        got = {(r.grp, r.pct): r.value for r in
               grouped_exact_quantiles(df, "grp", "v",
                                       bucket_width=4).collect()}
        # group a: N=100 → ranks 25,50,75,90,99 → 10,20,30,30,30
        assert got[("a", 25)] == 10 and got[("a", 50)] == 20
        assert got[("a", 75)] == 30 and got[("a", 99)] == 30
        # group b: N=1 → every pct picks the single row
        assert all(got[("b", p)] == 5 for p in (25, 50, 75, 90, 99))


class TestQuantileSketch:
    def test_interval_brackets_exact_quantile(self, spark, sf_dir):
        """The error-bound contract: for every (group, pct) the exact
        percentile_disc value must land inside the sketch's
        [est_lo, est_hi] interval, and the interval must be exactly
        err_bound wide."""
        from kafka_connect_streams_spark import queries as Q
        exact = {(r.priority, r.pct): int(round(r.value * 100))
                 for r in Q.q_quantile_exact(spark, sf_dir).collect()}
        sk = Q.q_quantile_sketch(spark, sf_dir).collect()
        assert {(r.priority, r.pct) for r in sk} == set(exact)
        for r in sk:
            v = exact[(r.priority, r.pct)]
            assert r.est_lo <= v <= r.est_hi, (r, v)
            assert r.est_hi - r.est_lo == r.err_bound == 49999

    def test_sketch_is_mergeable(self, spark, sf_dir):
        """The monoid law the 1000-executor story depends on: the
        sketch of a union equals the bucket-wise SUM of the shards'
        sketches — so per-shard sketches fold to the same answer as
        one global pass, for any split."""
        from kafka_connect_streams_spark.operators.frequency import (
            quantile_sketch)
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .where(F.col("o_totalprice").isNotNull())
             .select(F.col("o_orderpriority").alias("priority"),
                     F.expr("cast(cast(o_totalprice as decimal(18,2))"
                            " * 100 as bigint)").alias("cents")))
        whole = {(r.g, r.bucket): r.c for r in
                 quantile_sketch(o, "priority", "cents",
                                 width=50000).collect()}
        shards = [o.where(F.col("cents") % 3 == i) for i in range(3)]
        merged: dict = {}
        for sh in shards:
            for r in quantile_sketch(sh, "priority", "cents",
                                     width=50000).collect():
                merged[(r.g, r.bucket)] = \
                    merged.get((r.g, r.bucket), 0) + r.c
        assert merged == whole


class TestKcore:
    def test_multi_round_peeling(self, spark):
        """A K5 clique with a pendant chain: the chain peels one node
        per round (each removal exposes the next), the clique survives
        with its internal degrees — the multi-round cascade the
        operator exists for."""
        from kafka_connect_streams_spark.operators.graph import kcore
        clique = [(a, b) for a in range(5) for b in range(5) if a < b]
        chain = [(4, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(clique + chain, "a long, b long")
        got = {r.node: r.deg for r in kcore(df, k=3, rounds=8).collect()}
        assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}

    def test_unconverged_raises(self, spark):
        """A chain long enough that ``rounds`` peels cannot reach the
        fixpoint must raise, never return a partial peel."""
        import pytest

        from kafka_connect_streams_spark.operators.graph import kcore
        chain = [(i, i + 1) for i in range(10)]
        df = spark.createDataFrame(chain, "a long, b long")
        with pytest.raises(ValueError, match="did not converge"):
            kcore(df, k=2, rounds=2)

    def test_empty_core(self, spark):
        """k above the max degree peels everything — empty result, no
        convergence error (the empty graph IS the fixpoint)."""
        from kafka_connect_streams_spark.operators.graph import kcore
        df = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
        assert kcore(df, k=5, rounds=8).count() == 0


class TestRrfFusion:
    def test_score_formula_and_rank_contract(self, spark, sf_dir):
        """rrf_e9 must equal the integer formula from the per-system
        ranks, fused_rank must be the dense 1..20 total order, and
        docs present in BOTH runs must carry both rank columns."""
        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_rrf_fusion(spark, sf_dir).collect()
        assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 20
        prev = None
        for r in rows:
            want = 0
            if r.lex_rank is not None:
                want += 10 ** 9 // (60 + r.lex_rank)
            if r.sem_rank is not None:
                want += 10 ** 9 // (60 + r.sem_rank)
            assert r.rrf_e9 == want
            assert r.lex_rank is not None or r.sem_rank is not None
            if prev is not None:
                assert r.rrf_e9 <= prev
            prev = r.rrf_e9


class TestHllDistinct:
    def test_estimates_within_bound_at_sf(self, spark, sf_dir):
        """At corpus cardinalities (≫ 2.5·m) every per-flag estimate
        must sit inside the 4·RSE band and the flag must agree with a
        recomputation from the reported exact fields."""
        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_hll_distinct(spark, sf_dir).collect()
        assert len(rows) == 3
        for r in rows:
            rel = abs(r.hll_est - r.n_true) / r.n_true
            assert r.within_4rse == (rel <= 0.26)
            assert r.within_4rse, (r.set_key, rel)
            assert 1 <= r.v_registers <= 256
            # the exact harmonic denominator is bounded by the
            # all-empty (m·2^53) and all-saturated (m) extremes
            assert 256 <= r.s_scaled <= 256 * (1 << 53)

    def test_small_set_flagged_not_trusted(self, spark):
        """Below ~2.5·m distincts the raw estimate biases toward
        alpha·m (no linear-counting branch, by design) — the 4·RSE
        flag must report False rather than pretending accuracy."""
        from kafka_connect_streams_spark.operators.frequency import (
            hll_report)
        df = spark.createDataFrame([("x", i) for i in range(3)],
                                   "s string, e long")
        r = hll_report(df, "s", "e").collect()[0]
        assert r.n_true == 3 and r.v_registers == 3
        assert not r.within_4rse

    def test_merge_is_register_max(self, spark):
        """Sketching two halves separately and folding their register
        tables by max must give the SAME s_scaled as sketching the
        union — the mergeability contract that makes the sketch
        distributable."""
        from kafka_connect_streams_spark.operators.frequency import (
            hll_report)
        rows = [("u", i) for i in range(2000)]
        whole = spark.createDataFrame(rows, "s string, e long")
        h1 = spark.createDataFrame(rows[:1000], "s string, e long")
        h2 = spark.createDataFrame(rows[1000:], "s string, e long")
        got = hll_report(whole, "s", "e").collect()[0]
        merged = hll_report(h1.unionByName(h2), "s", "e").collect()[0]
        assert got.s_scaled == merged.s_scaled
        assert got.hll_est == merged.hll_est


class TestJlProjection:
    def test_expectation_identity_and_concentration(self, spark, sf_dir):
        """For ±1 signs E[‖Δy‖²] = k·‖Δx‖² exactly — check the
        measured ratios center near 1e6 (JL concentration at k=16 has
        RSE ≈ 35%, so the MEAN over pairs must land well inside one
        RSE) and every field satisfies the exact identity chain."""
        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_jl_projection(spark, sf_dir).collect()
        assert rows, "probe pairs must exist at every SF"
        ratios = []
        for r in rows:
            assert r.id_b == r.id_a + 1
            assert r.dist2_orig > 0 and r.dist2_proj >= 0
            assert r.ratio_e6 == r.dist2_proj * 62500 // r.dist2_orig
            ratios.append(r.ratio_e6)
        mean = sum(ratios) / len(ratios)
        assert 650_000 < mean < 1_350_000, ratios

    def test_projection_matches_manual_weights(self, spark):
        """One hand-built vector: y_p must equal the driver-side
        hashlib weight fold — the same md5 family the oracle and
        hyperplane_signatures use."""
        from kafka_connect_streams_spark.operators.similarity import (
            _plane_weights, jl_projection)
        vec = [0.5, -0.25, 0.125, -0.0625]
        rows = [(0, vec), (1, [v / 2 for v in vec])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = jl_projection(df, "vec_id", "embedding",
                            out_dims=4, pair_stride=1).collect()[0]
        qa = [round(v * 10000) for v in vec]
        qb = [round(v / 2 * 10000) for v in vec]
        d2o = sum((a - b) ** 2 for a, b in zip(qa, qb))
        d2p = 0
        for p in range(4):
            w = _plane_weights(p, 4)
            ya = sum(wi * x for wi, x in zip(w, qa))
            yb = sum(wi * x for wi, x in zip(w, qb))
            d2p += (ya - yb) ** 2
        assert got.dist2_orig == d2o and got.dist2_proj == d2p
        assert got.ratio_e6 == d2p * 250000 // d2o


class TestBpePacking:
    def test_matches_sequential_packing_of_real_tokens(self, spark, sf_dir):
        """The bucketed window assignment must equal the naive
        sequential walk: per bucket, docs in doc_id order accumulate
        REAL bpe_encode token counts, and a doc's pack is
        floor(prior_cum / budget) — recomputed in plain Python from
        bpe_encode's own output."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables
        from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                               bpe_merges)
        got = {(r.bucket, r.seq): (r.n_docs, r.pack_tokens)
               for r in Q.q_bpe_packing(spark, sf_dir).collect()}
        docs = load_tables(spark, sf_dir)["documents"]
        mt = bpe_merges(spark, docs, "text", "doc_id", rounds=3).collect()
        merges = [(r.lhs, r.rhs) for r in sorted(mt, key=lambda r: r.round)]
        enc = bpe_encode(docs, "text", "doc_id", merges).collect()
        import hashlib
        from collections import defaultdict
        per_bucket = defaultdict(list)
        for r in enc:
            b = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4],
                    16) % 32
            per_bucket[b].append((r.doc_id, r.n_tokens))
        want: dict = {}
        for b, rows in per_bucket.items():
            cum = 0
            for _, n in sorted(rows):
                seq = cum // 4096
                nd, pt = want.get((b, seq), (0, 0))
                want[(b, seq)] = (nd + 1, pt + n)
                cum += n
        assert got == want

    def test_conserves_every_token(self, spark, sf_dir):
        """No token is lost or double-counted: the packs' token mass
        equals the corpus encode's token mass."""
        from kafka_connect_streams_spark import queries as Q
        packs = Q.q_bpe_packing(spark, sf_dir).agg(
            F.sum("pack_tokens").alias("t"), F.sum("n_docs").alias("d")
        ).collect()[0]
        enc = Q.q_bpe_encode(spark, sf_dir).agg(
            F.sum("n_tokens").alias("t"), F.count("*").alias("d")
        ).collect()[0]
        assert packs.t == enc.t and packs.d == enc.d


class TestClusterBalancedSample:
    def test_equals_naive_per_cluster_head(self, spark, sf_dir):
        """The bin-offset semi-filter must reproduce the naive
        per-cluster md5-order head exactly: same members, same ranks,
        recomputed in plain Python from the assignment itself."""
        import hashlib

        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables
        from kafka_connect_streams_spark.operators.similarity import (
            _coarse_assign, _quantized, kmeans_coarse_centroids)
        got = {(r.list, r.vec_id): r.rank_in_list
               for r in Q.q_cluster_balanced_sample(spark, sf_dir).collect()}
        emb = (load_tables(spark, sf_dir)["embeddings"]
               .select(F.col("vec_id").alias("id"), "embedding"))
        coarse = kmeans_coarse_centroids(emb, n_lists=8, iters=3)
        asg = emb.select(
            "id",
            _coarse_assign(_quantized(F.col("embedding")), coarse)[0]["j"]
            .alias("list")).collect()
        from collections import defaultdict
        by_list = defaultdict(list)
        for r in asg:
            by_list[r.list].append(
                (hashlib.md5(str(r.id).encode()).hexdigest(), r.id))
        want = {}
        for lst, rows in by_list.items():
            for rank, (_, vid) in enumerate(sorted(rows)[:8], start=1):
                want[(lst, vid)] = rank
        assert got == want

    def test_quota_and_rank_contract(self, spark, sf_dir):
        """At most 8 rows per cluster, ranks contiguous from 1."""
        from collections import defaultdict

        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_cluster_balanced_sample(spark, sf_dir).collect()
        ranks = defaultdict(list)
        for r in rows:
            ranks[r.list].append(r.rank_in_list)
        for lst, rs in ranks.items():
            assert sorted(rs) == list(range(1, len(rs) + 1)), (lst, rs)
            assert len(rs) <= 8


class TestCurriculumOrder:
    def test_difficulty_is_exact_decile_bucket(self, spark, sf_dir):
        """Every document's difficulty must equal the count of exact
        percentile_disc decile bounds (ceil-rank convention) strictly
        below its n_chars — bounds recomputed by a plain Python sort."""
        import math

        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.catalog import load_tables
        docs = {r.doc_id: r.n_chars
                for r in load_tables(spark, sf_dir)["documents"]
                .where(F.col("n_chars").isNotNull()).collect()}
        vals = sorted(docs.values())
        n = len(vals)
        bounds = [vals[math.ceil(n * p / 100) - 1]
                  for p in range(10, 100, 10)]
        out = Q.q_curriculum_order(spark, sf_dir).collect()
        assert len(out) == n
        for r in out:
            assert r.difficulty == sum(
                1 for b in bounds if docs[r.doc_id] > b), r

    def test_pos_contiguous_and_hash_ordered(self, spark, sf_dir):
        """Within every (difficulty, shard): positions are 1..n and
        follow (md5(doc_id), doc_id) order."""
        import hashlib
        from collections import defaultdict

        from kafka_connect_streams_spark import queries as Q
        groups = defaultdict(list)
        for r in Q.q_curriculum_order(spark, sf_dir).collect():
            groups[(r.difficulty, r.shard)].append(r)
        for key, rows in groups.items():
            rows.sort(key=lambda r: r.pos)
            assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
            hashes = [(hashlib.md5(str(r.doc_id).encode()).hexdigest(),
                       r.doc_id) for r in rows]
            assert hashes == sorted(hashes), key


class TestBpeGeneralization:
    def test_holdout_unseen_words_still_encode(self, spark):
        """The eval's load-bearing property: words that appear ONLY in
        the holdout split (the training never saw them) still encode
        through the train-derived merge table, and the per-split folds
        equal the Python reference encoder run with those merges."""
        import hashlib
        import re

        from kafka_connect_streams_spark.operators.bpe import (bpe_encode,
                                                                bpe_merges)
        docs = [(i, t) for i, t in enumerate(
            ["the cat the hat", "the thin thing", "then the lathe",
             "that theft tithe", "bathe the moth", "myth of the month",
             "zq zq vex", "the fox with zeal", "jumble quartz",
             "the depth of the", "wobble xylem", "the theme the"])]
        split = {i: ("train" if int(hashlib.md5(str(i).encode())
                                    .hexdigest()[:4], 16) % 100 < 80
                     else "holdout") for i, _ in docs}
        assert set(split.values()) == {"train", "holdout"}
        train_words = {w for i, t in docs if split[i] == "train"
                       for w in re.split(r"\W+", t.lower()) if w}
        hold_words = {w for i, t in docs if split[i] == "holdout"
                      for w in re.split(r"\W+", t.lower()) if w}
        assert hold_words - train_words  # the eval's raison d'être

        df = spark.createDataFrame(docs, "doc_id long, text string") \
                  .withColumn("n_chars", F.length("text"))
        train_df = df.where(
            (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 4), 16, 10).cast("int") % 100) < 80)
        mt = bpe_merges(spark, train_df, "text", "doc_id",
                        rounds=3).collect()
        merges = [(r.lhs, r.rhs)
                  for r in sorted(mt, key=lambda r: r.round)]
        enc = {r.doc_id: r.n_tokens for r in
               bpe_encode(df, "text", "doc_id", merges).collect()}

        want: dict = {}
        for i, t in docs:
            n, _ = TestBpeEncode._py_encode(t, merges)
            s = split[i]
            d, c, tok = want.get(s, (0, 0, 0))
            want[s] = (d + 1, c + len(t), tok + n)
        got = {}
        for s in ("train", "holdout"):
            ids = [i for i, _ in docs if split[i] == s]
            got[s] = (len(ids), sum(len(t) for i, t in docs if i in ids),
                      sum(enc[i] for i in ids))
        assert got == want


class TestEmbeddingPrototypes:
    @staticmethod
    def _py_protos(rows):
        """Python reference: quantize, per-label floor-average."""
        import math
        from collections import defaultdict
        acc: dict = defaultdict(lambda: None)
        cnt: dict = defaultdict(int)
        for lb, vec in rows:
            q = [math.floor(float(x) * 10000.0 + 0.5) for x in vec]
            if acc[lb] is None:
                acc[lb] = [0] * len(q)
            acc[lb] = [a + b for a, b in zip(acc[lb], q)]
            cnt[lb] += 1
        return {lb: [math.floor(s / cnt[lb]) for s in acc[lb]]
                for lb in acc}

    def test_prototype_is_floor_average(self, spark, sf_dir):
        from kafka_connect_streams_spark.operators.similarity import (
            label_prototypes)
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .where(F.col("label").isNotNull())
               .select(F.col("label").cast("int").alias("label"),
                       "embedding"))
        labels, protos = label_prototypes(emb, "label")
        rows = [(r.label, list(r.embedding)) for r in emb.collect()]
        want = self._py_protos(rows)
        assert labels == sorted(want)
        assert protos == want

    def test_compactness_matches_python_cosines(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from kafka_connect_streams_spark import queries as Q
        got = {r.label: (r.n_members, r.mean_cos_e6, r.min_cos_e6)
               for r in Q.q_embedding_prototypes(spark, sf_dir).collect()}
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .where(F.col("label").isNotNull())
               .select(F.col("label").cast("int").alias("label"),
                       "embedding"))
        rows = [(r.label, list(r.embedding)) for r in emb.collect()]
        protos = self._py_protos(rows)
        e6 = defaultdict(list)
        for lb, vec in rows:
            q = [math.floor(float(x) * 10000.0 + 0.5) for x in vec]
            c = protos[lb]
            dot = sum(a * b for a, b in zip(q, c))
            nv = sum(a * a for a in q)
            pn = sum(a * a for a in c)
            e6[lb].append(math.floor(dot / math.sqrt(nv * pn) * 1000000))
        # mean uses TRUNCATING integer division on both engines
        # (Spark div == DuckDB //), so mirror truncation, not floor
        want = {}
        for lb, v in e6.items():
            s = sum(v)
            trunc = s // len(v) if s >= 0 else -((-s) // len(v))
            want[lb] = (len(v), trunc, min(v))
        assert got == want


class TestLabelNoise:
    def test_nearest_matches_python_argmax(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from kafka_connect_streams_spark import queries as Q
        got = {(r.label, r.nearest_label): r.n_members
               for r in Q.q_label_noise(spark, sf_dir).collect()}
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .where(F.col("label").isNotNull())
               .select(F.col("label").cast("int").alias("label"),
                       "embedding"))
        rows = [(r.label, list(r.embedding)) for r in emb.collect()]
        protos = TestEmbeddingPrototypes._py_protos(rows)
        labels = sorted(protos)
        pns = {lb: sum(a * a for a in protos[lb]) for lb in labels}
        want: dict = defaultdict(int)
        for lb, vec in rows:
            q = [math.floor(float(x) * 10000.0 + 0.5) for x in vec]
            nv = sum(a * a for a in q)
            best = max(
                labels,
                key=lambda p: (sum(a * b for a, b in zip(q, protos[p]))
                               / math.sqrt(nv * pns[p]), -p))
            want[(lb, best)] += 1
        assert got == dict(want)
        # every member is counted exactly once
        assert sum(got.values()) == len(rows)


class TestPackSpans:
    def test_spans_reconstruct_docs_and_fill_packs_exactly(
            self, spark, sf_dir):
        """The exact-fill contract: per document the spans are
        contiguous from token 0 and sum to its token count; per
        (bucket, pack) the spans sum to exactly 2048 tokens for every
        pack except each bucket's last."""
        from collections import defaultdict

        from kafka_connect_streams_spark import queries as Q
        rows = Q.q_pack_spans(spark, sf_dir).collect()
        per_doc = defaultdict(list)
        per_pack = defaultdict(int)
        for r in rows:
            per_doc[r.doc_id].append((r.start_tok, r.n_tok_in_pack))
            per_pack[(r.bucket, r.seq)] += r.n_tok_in_pack
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id",
                        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                                        lambda x: F.length(x) > 0))
                        .cast("bigint").alias("n_tok")).collect())
        want_tok = {r.doc_id: r.n_tok for r in docs if r.n_tok > 0}
        assert set(per_doc) == set(want_tok)
        for did, spans in per_doc.items():
            spans.sort()
            assert spans[0][0] == 0
            pos = 0
            for start, n in spans:
                assert start == pos and n > 0, (did, spans)
                pos += n
            assert pos == want_tok[did], (did, spans)
        last_per_bucket = {}
        for (b, s) in per_pack:
            last_per_bucket[b] = max(last_per_bucket.get(b, -1), s)
        for (b, s), tot in per_pack.items():
            if s < last_per_bucket[b]:
                assert tot == 2048, (b, s, tot)
            else:
                assert 0 < tot <= 2048, (b, s, tot)


class TestLabelPrototypesEdges:
    def test_null_first_embedding_and_custom_vec_col(self, spark):
        """r10 ADVICE: the dim probe must skip NULL/empty sampled rows
        (the old limit-1 collect raised TypeError on a NULL first
        embedding) and honor a non-default vector column name."""
        from kafka_connect_streams_spark.operators.similarity import (
            label_prototypes)
        df = spark.createDataFrame(
            [(None, 0), ([1.0, 2.0], 0), ([3.0, 4.0], 1), ([], 1)],
            "vec array<float>, label int")
        labels, protos = label_prototypes(df, "label", vec_col="vec")
        assert labels == [0, 1]
        # NULL/empty vecs contribute NULL components (sum skips them)
        # but still count as members — the oracle's comp CTE divides by
        # count(*) per label, so floor(30000/2), floor(40000/2)
        assert protos[1] == [15000, 20000]
        assert protos[0] == [10000 // 2, 20000 // 2]

    def test_all_null_vectors_yield_empty(self, spark):
        from kafka_connect_streams_spark.operators.similarity import (
            label_prototypes)
        df = spark.createDataFrame(
            [(None, 0)], "vec array<float>, label int")
        assert label_prototypes(df, "label", vec_col="vec") == ([], {})

    def test_mixed_null_label_is_skipped_not_crashed(self, spark):
        """r11 ADVICE: one label whose rows are ALL NULL/empty next to a
        label with data used to TypeError (int(None)) — the NULL-sum
        group row still reached the comprehension. It must be skipped;
        the data-bearing label keeps its prototype."""
        from kafka_connect_streams_spark.operators.similarity import (
            label_prototypes)
        df = spark.createDataFrame(
            [(None, 0), ([], 0), ([1.0, 2.0], 1)],
            "vec array<float>, label int")
        labels, protos = label_prototypes(df, "label", vec_col="vec")
        assert labels == [1]
        assert protos == {1: [10000, 20000]}

    def test_shorter_vectors_zero_fill_not_dropped(self, spark):
        """Review finding: a label with real data but SHORTER vectors
        than the probed dim (every row NULL at some component) must
        keep its prototype with that component zero-filled — not be
        silently dropped by an all-components-non-null guard."""
        from kafka_connect_streams_spark.operators.similarity import (
            label_prototypes)
        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0, 4.0], 0), ([1.0, 2.0], 1)],
            "vec array<float>, label int")
        labels, protos = label_prototypes(df, "label", vec_col="vec")
        assert labels == [0, 1]
        assert protos[0] == [10000, 20000, 30000, 40000]
        assert protos[1] == [10000, 20000, 0, 0]


def test_zero_norm_prototype_scores_cos_zero(spark, tmp_path):
    """r10 ADVICE: an all-zero prototype or member must score cos := 0
    (not NaN) in both prototype queries — engines disagree on NaN
    ordering/floor, so the guard is the portability fix."""
    from kafka_connect_streams_spark import queries as Q

    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        (spark.read.parquet(f"{src}/{t}.parquet").limit(0)
         .write.mode("overwrite").parquet(str(tmp_path / f"{t}.parquet")))
    zero = [0.0] * 64
    one = [1.0] * 64
    emb = spark.createDataFrame(
        [(1, zero, 0), (2, zero, 0), (3, one, 1), (4, one, 1)],
        "vec_id long, embedding array<float>, label int")
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    comp = {r.label: (r.mean_cos_e6, r.min_cos_e6)
            for r in Q.q_embedding_prototypes(
                spark, str(tmp_path)).collect()}
    assert comp[0] == (0, 0), comp          # zero-norm label: cos := 0
    assert comp[1] == (1000000, 1000000)
    noise = {(r.label, r.nearest_label): r.n_members
             for r in Q.q_label_noise(spark, str(tmp_path)).collect()}
    # zero-norm members score 0 against BOTH prototypes -> tie -> the
    # lowest label wins the argmax for label-0 members
    assert noise[(0, 0)] == 2 and noise[(1, 1)] == 2, noise


class TestKAnonymize:
    def test_release_groups_meet_k(self, spark, sf_dir):
        """The anonymity property itself, on real data: every released
        (level, QI) group has >= k members, except the level-2
        remainder which is a single fully-suppressed group; levels
        partition the input ids exactly."""
        from kafka_connect_streams_spark import queries as Q
        out = Q.QUERIES["k_anonymize"](spark, sf_dir).collect()
        n_in = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        assert len(out) == n_in
        assert len({r.c_custkey for r in out}) == n_in
        from collections import Counter
        groups = Counter(
            (r.anon_level, r.c_mktsegment, r.c_nationkey, r.bal_bucket)
            for r in out)
        for (lvl, *qi), n in groups.items():
            if lvl == 2:
                assert qi == ["*", "*", "*"]
            else:
                assert n >= 5, (lvl, qi, n)
        for r in out:
            if r.anon_level == 0:
                assert "*" not in (r.c_mktsegment, r.c_nationkey,
                                   r.bal_bucket)
            elif r.anon_level == 1:
                assert r.c_mktsegment != "*"
                assert (r.c_nationkey, r.bal_bucket) == ("*", "*")
        assert r.group_size is not None

    def test_planted_recoding_levels(self, spark):
        """Planted fixture: a 5-row full-QI group releases at level 0;
        a segment with 5 scattered rows generalizes to level 1; a
        segment with fewer suppresses to level 2 with the remainder
        group size."""
        from kafka_connect_streams_spark.operators.aggregations import (
            k_anonymize)
        rows = ([(i, "A", 1, 10) for i in range(5)]          # level 0
                + [(10 + i, "B", i, 20 + i) for i in range(5)]  # level 1
                + [(20 + i, "C", i, 30 + i) for i in range(2)])  # level 2
        df = spark.createDataFrame(
            rows, "id bigint, seg string, nat int, bal bigint")
        out = {r.id: r for r in k_anonymize(
            df, "id", ["seg", "nat", "bal"], coarse_n=1, k=5).collect()}
        assert all(out[i].anon_level == 0 and out[i].group_size == 5
                   for i in range(5))
        assert all(out[10 + i].anon_level == 1
                   and out[10 + i].seg == "B"
                   and (out[10 + i].nat, out[10 + i].bal) == ("*", "*")
                   for i in range(5))
        assert all(out[20 + i].anon_level == 2
                   and out[20 + i].group_size == 2
                   and out[20 + i].seg == "*" for i in range(2))
        import pytest as _pytest
        with _pytest.raises(ValueError):
            k_anonymize(df, "id", ["seg", "nat"], coarse_n=2, k=5)

    def test_l_diversity_flags_homogeneous_group(self, spark):
        """The homogeneity attack case: a group that is k-anonymous but
        shares ONE sensitive value must report n_sensitive=1 and
        l_diverse=false; a varied group passes."""
        from kafka_connect_streams_spark.operators.aggregations import (
            l_diversity_report)
        rows = ([(i, "A", 1, 10, 777) for i in range(5)]       # homogeneous
                + [(10 + i, "B", 1, 10, i) for i in range(5)])  # diverse
        df = spark.createDataFrame(
            rows, "id bigint, seg string, nat int, bal bigint, sens bigint")
        out = {(r.anon_level, r.seg): r for r in l_diversity_report(
            df, "id", ["seg", "nat", "bal"], "sens",
            coarse_n=1, k=5, l_threshold=3).collect()}
        a, b = out[(0, "A")], out[(0, "B")]
        assert (a.n_sensitive, a.l_diverse) == (1, False)
        assert (b.n_sensitive, b.l_diverse) == (5, True)
        assert a.group_size == b.group_size == 5

    def test_null_qi_rows_survive_and_group(self, spark):
        """NULL is a legitimate QI value: a k-sized all-NULL-QI group
        releases at level 0 (the count join must be null-safe — a plain
        equi-join silently drops every NULL-QI row from the release)."""
        from kafka_connect_streams_spark.operators.aggregations import (
            k_anonymize)
        rows = ([(i, "A", 1, 10) for i in range(5)]
                + [(10 + i, None, None, None) for i in range(5)]
                + [(20, "C", 2, 30)])
        df = spark.createDataFrame(
            rows, "id bigint, seg string, nat int, bal bigint")
        out = {r.id: r for r in k_anonymize(
            df, "id", ["seg", "nat", "bal"], coarse_n=1, k=5).collect()}
        assert len(out) == 11  # the release partitions the input
        assert all(out[10 + i].anon_level == 0
                   and out[10 + i].group_size == 5
                   and out[10 + i].seg is None for i in range(5))
        assert out[20].anon_level == 2

    def test_t_closeness_flags_skewed_group(self, spark):
        """The skewness attack case l-diversity misses: a group with 3
        DISTINCT sensitive values that is 80% one value passes
        l-diversity (l=3) but must fail t-closeness, while a group
        matching the corpus distribution passes. Expected l1_e9 values
        are recomputed with a pure-Python integer replica of the e9
        fixed-point arithmetic (n_gs·10⁹ // n_g − n_s·10⁹ // N summed
        as absolute values over the domain, NULL a domain cell of its
        own)."""
        from kafka_connect_streams_spark.operators.aggregations import (
            l_diversity_report, t_closeness_report)
        # group A: skewed 8/1/1 over {0,1,2}; group B: 30 near-uniform
        # rows that dominate (and so shape) the corpus distribution;
        # one NULL sensitive row lands in B (its own domain cell)
        a = [(i, "A", 1, 10, ([0] * 8 + [1, 2])[i]) for i in range(10)]
        b_sens = [0] * 10 + [1] * 10 + [2] * 9 + [None]
        b = [(10 + i, "B", 1, 10, b_sens[i]) for i in range(30)]
        rows = a + b
        df = spark.createDataFrame(
            rows, "id bigint, seg string, nat int, bal bigint, sens bigint")
        ldiv = {r.seg: r for r in l_diversity_report(
            df, "id", ["seg", "nat", "bal"], "sens",
            coarse_n=1, k=5, l_threshold=3).collect()}
        assert ldiv["A"].l_diverse and ldiv["B"].l_diverse  # both pass l
        out = {r.seg: r for r in t_closeness_report(
            df, "id", ["seg", "nat", "bal"], "sens",
            coarse_n=1, k=5, t_l1_e9=400_000_000).collect()}
        # pure-Python reference over the 4-cell domain {0,1,2,NULL}
        from collections import Counter
        corpus = Counter(r[4] for r in rows)
        n_tot = len(rows)
        for seg, grp in (("A", a), ("B", b)):
            gc = Counter(r[4] for r in grp)
            exp = sum(abs(gc.get(v, 0) * 10**9 // len(grp)
                          - n_s * 10**9 // n_tot)
                      for v, n_s in corpus.items())
            assert out[seg].l1_e9 == exp, (seg, out[seg].l1_e9, exp)
            assert out[seg].group_size == len(grp)
        assert not out["A"].t_close      # 80%-one-value skew caught
        assert out["B"].t_close          # corpus-shaped group passes


class TestDPCounts:
    def _py_release(self, groups: dict, eps_e3=1000, bound=16,
                    seed="dp-seed"):
        """Pure-Python twin: md5-keyed 48-bit uniform → inverse-CDF
        lookup → clamp — the exact arithmetic both engines spell."""
        import hashlib as _h

        from kafka_connect_streams_spark.operators.aggregations import (
            dp_noise_cdf)
        cum = dp_noise_cdf(eps_e3, bound)
        out = {}
        for key, n in groups.items():
            ks = ":".join([seed] + [str(k) for k in key])
            u = int(_h.md5(ks.encode()).hexdigest()[:12], 16)
            k = next((i - bound for i in range(len(cum) - 1)
                      if u < cum[i]), bound)
            out[key] = max(0, n + k)
        return out

    def test_noise_cdf_shape(self):
        """Monotone thresholds ending exactly at the 48-bit scale, with
        the symmetric two-sided-geometric mass: the zero-noise bucket
        is the largest and P(k) = P(−k) to fixed-point rounding."""
        from kafka_connect_streams_spark.operators.aggregations import (
            DP_NOISE_SCALE, dp_noise_cdf)
        cum = dp_noise_cdf(1000, 16)
        assert len(cum) == 33 and cum[-1] == DP_NOISE_SCALE
        assert all(a < b for a, b in zip(cum, cum[1:]))
        w = [cum[0]] + [b - a for a, b in zip(cum, cum[1:])]
        assert w[16] == max(w)                       # mode at 0
        for i in range(15):
            assert abs(w[i] - w[32 - i]) <= 2, i     # symmetry
        # expected |noise| at eps=1: 2a/(1-a^2) ~ 0.8509 — the utility
        # calibration the q_dp_utility docstring quotes
        import math
        a = math.exp(-1.0)
        exp_abs = sum(abs(i - 16) * wi for i, wi in enumerate(w)) \
            / DP_NOISE_SCALE
        assert abs(exp_abs - 2 * a / (1 - a * a)) < 1e-3

    def test_release_matches_python_and_is_deterministic(self, spark):
        from kafka_connect_streams_spark.operators.aggregations import (
            dp_counts)
        rows = [("A", i % 3) for i in range(30)] + [("B", 7)] \
            + [("C", None)] * 2
        df = spark.createDataFrame(rows, "seg string, nat int")
        got = {(r.seg, r.nat): r.released
               for r in dp_counts(df, ["seg", "nat"]).collect()}
        groups = {}
        for seg, nat in rows:
            groups[(seg, "" if nat is None else nat)] = \
                groups.get((seg, "" if nat is None else nat), 0) + 1
        want = self._py_release(groups)
        assert got == {(s, None if n == "" else n): v
                       for (s, n), v in want.items()}
        assert all(v >= 0 for v in got.values())
        # keyed PRNG: same seed reproduces, fresh seed re-draws
        again = {(r.seg, r.nat): r.released
                 for r in dp_counts(df, ["seg", "nat"]).collect()}
        assert again == got
        other = {(r.seg, r.nat): r.released
                 for r in dp_counts(df, ["seg", "nat"],
                                    seed="other").collect()}
        assert other != got

    def test_zero_clamp_is_reachable_and_applied(self, spark):
        """A size-1 group whose draw lands negative must release 0, not
        a negative count: hunt a key whose md5 uniform falls in the
        negative-noise mass (~43% of draws, so the first few keys
        suffice) and pin the clamp on it."""
        import hashlib as _h

        from kafka_connect_streams_spark.operators.aggregations import (
            dp_counts, dp_noise_cdf)
        cum = dp_noise_cdf(1000, 16)
        key = next(
            k for k in range(1000)
            if int(_h.md5(f"dp-seed:{k}".encode()).hexdigest()[:12], 16)
            < cum[15])                               # noise <= -1
        df = spark.createDataFrame([(key,)], "k int")
        [r] = dp_counts(df, ["k"]).collect()
        assert r.released == 0

    def test_utility_report_matches_per_group_errors(self, spark, sf_dir):
        import kafka_connect_streams_spark.queries as Q
        rel = Q.QUERIES["dp_utility"](spark, sf_dir).collect()[0]
        from kafka_connect_streams_spark.operators.aggregations import (
            dp_counts)
        t = Q.load_tables(spark, sf_dir)
        per = dp_counts(t["customer"], ["c_mktsegment", "c_nationkey"],
                        keep_true=True).collect()
        errs = [abs(r.released - r.true_count) for r in per]
        assert rel.n_groups == len(per)
        assert rel.sum_abs_err == sum(errs)
        assert rel.max_abs_err == max(errs)
        assert rel.n_exact == sum(1 for e in errs if e == 0)


class TestOPH:
    def _py_sig(self, texts: dict, k=16):
        """Pure-Python one-permutation signature with rotation
        densification — the arithmetic twin of oph_signatures_wide."""
        import hashlib as _h
        import re as _re

        from kafka_connect_streams_spark.operators.dedup import (
            MINHASH_P, OPH_DENSE_C)
        out = {}
        for doc, text in texts.items():
            toks = [t for t in _re.split(r"\W+", (text or "").lower()) if t]
            sh = {" ".join(toks[i:i + 3])
                  for i in range(max(len(toks) - 2, 1))} - {""}
            bins = {}
            for s in sh:
                h0 = int(_h.md5(s.encode()).hexdigest()[:12], 16) % MINHASH_P
                b = h0 % k
                bins[b] = min(bins.get(b, h0), h0)
            if not sh:
                continue
            sig = []
            for j in range(k):
                for d in range(k):
                    src = (j + d) % k
                    if src in bins:
                        sig.append(bins[src] + d * OPH_DENSE_C)
                        break
            out[doc] = sig
        return out

    def test_signature_matches_python_reference(self, spark):
        from kafka_connect_streams_spark.operators.dedup import (
            oph_signatures_wide, shingles)
        texts = {0: "the quick brown fox jumps over the lazy dog",
                 1: "the quick brown fox jumps over the lazy dog",
                 2: "spark query table window merge batch agg row",
                 3: "a b",          # 1 shingle -> 15 empty bins borrow
                 4: ""}             # no shingles -> no row
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id bigint, text string")
        sh = shingles(df, "text", "doc_id", 3)
        got = {r.doc_id: list(r.sig)
               for r in oph_signatures_wide(sh, "doc_id").collect()}
        want = self._py_sig(texts)
        assert got == want
        assert 4 not in got                      # empty doc emits no row
        assert got[0] == got[1] != got[2]        # dup-identical signatures
        # doc 3: exactly one real bin; every slot decodes back to it
        # via the offset arithmetic (the densification disjointness)
        from kafka_connect_streams_spark.operators.dedup import (
            OPH_DENSE_C)
        base_bin = {v % OPH_DENSE_C for v in got[3]}
        assert len(base_bin) == 1
        dists = sorted(v // OPH_DENSE_C for v in got[3])
        assert dists == list(range(16))          # one borrow per distance

    def test_estimator_and_banding_compatibility(self, spark):
        """The densified signature rides the classic banding/estimator
        machinery unchanged: identical docs pair at est_jaccard 1.0,
        disjoint docs never share a band key."""
        from kafka_connect_streams_spark.operators.dedup import (
            oph_lsh_dedup)
        rows = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "one two three four five six seven eight nine")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {(r.id_a, r.id_b): r.est_jaccard
               for r in oph_lsh_dedup(df, "text", "doc_id",
                                      threshold=0.25).collect()}
        assert got == {(0, 1): 1.0}

    def test_oph_agreement_with_classic_on_corpus(self, spark, sf_dir):
        """The measured number the driver row records: at sf0.001 the
        two thresholded pair sets must substantially overlap (the
        cheaper signature is a different estimator, not a different
        algorithm — sf0.1 measures 256/257 common)."""
        import kafka_connect_streams_spark.queries as Q
        [r] = Q.QUERIES["oph_recall"](spark, sf_dir).collect()
        assert r.n_minhash > 0 and r.n_oph > 0
        assert r.n_common >= 0.8 * r.n_minhash
        assert r.n_common >= 0.8 * r.n_oph


class TestHilbertLayout:
    def test_hilbert_py_bijective_and_unit_adjacent(self):
        """The curve contract itself: xy→d is a bijection on the grid
        and consecutive d are ALWAYS 4-neighbors — the property Morton
        lacks (z-order jumps) and the whole reason the layout exists."""
        from kafka_connect_streams_spark.operators.layout import (
            hilbert_py)
        bits, n = 5, 32
        inv = {}
        for x in range(n):
            for y in range(n):
                inv[hilbert_py(x, y, bits)] = (x, y)
        assert sorted(inv) == list(range(n * n))
        assert all(
            abs(inv[d][0] - inv[d + 1][0])
            + abs(inv[d][1] - inv[d + 1][1]) == 1
            for d in range(n * n - 1))

    def test_spark_and_duckdb_spellings_match_python(self, spark):
        """All three unrollings of the same walk are bit-identical on a
        planted point set covering quadrant boundaries."""
        import duckdb

        from kafka_connect_streams_spark.operators.layout import (
            hilbert_py, with_hilbert)
        from kafka_connect_streams_spark.queries import (
            _hilbert_keyed_sql)
        pts = [(0, 0), (4095, 4095), (0, 4095), (4095, 0),
               (2048, 2047), (2047, 2048), (1234, 3456), (7, 4088)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.x, r.y): r.hkey
               for r in with_hilbert(df, F.col("x"), F.col("y"),
                                     12).collect()}
        want = {(x, y): hilbert_py(x, y, 12) for x, y in pts}
        assert got == want
        con = duckdb.connect()
        con.execute("create table pts as select * from (values "
                    + ", ".join(f"({x}, {y})" for x, y in pts)
                    + ") t(x, y)")
        duck = {(x, y): hd for x, y, _, _, hd in con.sql(
            _hilbert_keyed_sql(12)).fetchall()}
        assert duck == want

    def test_file_spans_are_equal_frequency_and_rank_exact(self, spark):
        """layout_file_spans' two-pass ranking equals the global
        row_number contract: files hold N/n_files (±1) rows and the
        per-file spans match a sequential reference walk."""
        from kafka_connect_streams_spark.operators.layout import (
            layout_file_spans)
        rows = [(i, (i * 37) % 101, (i * 53) % 97) for i in range(101)]
        df = spark.createDataFrame(
            [(k, x, y) for k, x, y in rows], "key long, x long, y long")
        got = {r.file: (r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y)
               for r in layout_file_spans(df, "key", n_files=8,
                                          range_shift=4).collect()}
        ordered = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
        import collections
        files = collections.defaultdict(list)
        for rank, (k, x, y) in enumerate(ordered):
            files[rank * 8 // len(rows)].append((x, y))
        want = {f: (len(v),
                    min(x for x, _ in v), max(x for x, _ in v),
                    min(y for _, y in v), max(y for _, y in v))
                for f, v in files.items()}
        assert got == want
        sizes = {n for n, *_ in got.values()}
        assert max(sizes) - min(sizes) <= 1


class TestClusteredWrite:
    def test_real_files_preserve_the_hilbert_advantage(
            self, spark, tmp_path):
        """End-to-end through REAL parquet: write the sf0.01 point set
        clustered by each key (range exchange + in-partition sort),
        read the files back by input_file_name, derive per-file
        min-max spans — the actual zonemap stats — and count
        un-prunable (file, query) pairs under the fixed 4×4 tiling.
        The simulated A/B's conclusion must survive physical file
        placement: hilbert touches no more pairs than zorder, and both
        file counts land near the requested 32."""
        from kafka_connect_streams_spark.operators.layout import (
            with_hilbert, write_clustered, zorder_key)
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        pts = li.select(
            F.datediff(F.col("l_shipdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).cast("long")
            .alias("x"),
            F.col("l_partkey").bitwiseAND(4095).cast("long").alias("y"))
        zk = pts.withColumn("zkey",
                            zorder_key(F.col("x"), F.col("y"), 12))
        hk = with_hilbert(pts, F.col("x"), F.col("y"), 12)
        touched = {}
        n_files = {}
        for name, df, key in (("zorder", zk, "zkey"),
                              ("hilbert", hk, "hkey")):
            path = str(tmp_path / name)
            write_clustered(df, path, key, n_files=32)
            spans = (spark.read.parquet(path)
                     .withColumn("_f", F.input_file_name())
                     .groupBy("_f")
                     .agg(F.min("x").alias("min_x"),
                          F.max("x").alias("max_x"),
                          F.min("y").alias("min_y"),
                          F.max("y").alias("max_y"))
                     .collect())
            n_files[name] = len(spans)
            cnt = 0
            for r in spans:
                for qx in range(4):
                    for qy in range(4):
                        if (r.min_x <= qx * 1024 + 1023
                                and r.max_x >= qx * 1024
                                and r.min_y <= qy * 1024 + 1023
                                and r.max_y >= qy * 1024):
                            cnt += 1
            touched[name] = cnt
        assert 16 <= n_files["zorder"] <= 40
        assert 16 <= n_files["hilbert"] <= 40
        # the simulated advantage survives real placement
        assert touched["hilbert"] <= touched["zorder"], (touched,
                                                         n_files)
        # and real clustering actually prunes: far fewer than all pairs
        assert touched["zorder"] < n_files["zorder"] * 16 * 0.5


class TestSaltedListJoin:
    """r15: the IVF probe⋈lists hot-key salting must be result-invisible
    (guide §2.5 — the salt only re-shapes the shuffle)."""

    def test_salted_join_equals_plain_join(self, spark):
        from kafka_connect_streams_spark.operators.similarity import (
            _salted_list_join)
        probes = spark.createDataFrame(
            [(q, l) for q in range(7) for l in (q % 3, (q + 1) % 3)],
            "q_id bigint, list bigint")
        lists = spark.createDataFrame(
            [(c, c % 3) for c in range(40)] + [(100, 7)],  # 7: no probe
            "c_id bigint, list bigint")
        got = sorted(map(tuple, _salted_list_join(probes, lists, "list")
                         .collect()))
        want = sorted(map(tuple, probes.join(lists, "list")
                          .select("q_id", "c_id").collect()))
        assert got == want and len(got) > 0

    def test_ivf_plan_carries_the_salted_key(self, spark, sf_dir):
        """The probe⋈lists join key must include the salt so the hot
        16-key exchange spreads IVF_JOIN_SALT-fold at scale."""
        from kafka_connect_streams_spark import queries as Q
        from kafka_connect_streams_spark.plans.explain import physical_plan
        plan = physical_plan(Q.QUERIES["ann_ivf_cosine"](spark, sf_dir),
                             mode="simple")
        assert "_ivf_salt" in plan
