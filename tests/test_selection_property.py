"""Property tests for the round-8 selection/sketch kernels against
independent Python reference implementations: the two-pass histogram
quantile selection vs sorted-list indexing, and the banded
sorted-neighborhood pairing vs the brute-force rank-window definition.
Hypothesis drives randomized inputs through Spark and compares exactly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VALS = st.integers(min_value=-1000, max_value=1000)


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]), VALS),
                min_size=1, max_size=40),
       st.sampled_from([3, 16, 64]))
def test_grouped_exact_quantiles_matches_sorted_selection(spark, rows,
                                                          width):
    """For ANY multiset (duplicates, negatives — negatives exercise the
    floor bucketing) and ANY bucket width, the two-pass selection must
    pick exactly sorted(vals)[ceil(pct·N/100) - 1] per group."""
    from kafka_connect_streams_spark.operators.layout import (
        grouped_exact_quantiles)
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {(r.grp, r.pct): r.value
           for r in grouped_exact_quantiles(df, "grp", "v",
                                            bucket_width=width).collect()}
    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    want = {}
    for g, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for pct in (25, 50, 75, 90, 99):
            want[(g, pct)] = vals[(n * pct + 99) // 100 - 1]
    assert got == want


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=6),
                min_size=2, max_size=16, unique=True))
def test_sorted_neighborhood_pairing_matches_bruteforce(spark, texts):
    """The banded block join must produce EXACTLY the pairs within
    `window` positions of each other in (key, id) sort order, for all
    three pass keys (fwd / rev / init_len) — compared against the
    quadratic definition, before the distance filter (window large
    enough that the verify keeps identical-enough short strings out on
    its own)."""
    from kafka_connect_streams_spark.operators.dedup import (
        sorted_neighborhood_pairs)
    w = 3
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b, r.n_passes)
           for r in sorted_neighborhood_pairs(
               df, "text", "doc_id", window=w,
               pass_names=("fwd", "rev", "init_len")).collect()}

    def band_pairs(key):
        order = sorted(rows, key=lambda r: (key(r[1]), r[0]))
        out = set()
        for i, (ida, _) in enumerate(order):
            for j in range(i + 1, min(i + 1 + w, len(order))):
                idb = order[j][0]
                out.add((min(ida, idb), max(ida, idb)))
        return out

    fwd = band_pairs(lambda t: t.lower())
    rev = band_pairs(lambda t: t.lower()[::-1])
    il = band_pairs(lambda t: t.lower()[:1]
                    + str(len(t)).rjust(6, "0") + t.lower())
    want = set()
    for p in fwd | rev | il:
        ta, tb = texts[p[0]], texts[p[1]]

        def lev(a, b):
            import functools

            @functools.lru_cache(maxsize=None)
            def d(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                           d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
            return d(len(a), len(b))

        if lev(ta, tb) * 5 <= max(len(ta), len(tb)):
            want.add((p[0], p[1],
                      (p in fwd) + (p in rev) + (p in il)))
    assert got == want


def _mmr_reference(qvecs, cvecs, k, n_cand, lam):
    """Sequential MMR over quantized int vectors — floor-e6 cosine,
    integer-percent λ, ties → lowest candidate id."""
    import math

    def quant(v):
        return [math.floor(x * 10000.0 + 0.5) for x in v]

    def cos_e6(a, b):
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        if na == 0 or nb == 0:
            return 0
        d = sum(x * y for x, y in zip(a, b))
        return math.floor(d / math.sqrt(na * nb) * 1e6)

    out = []
    cq = {i: quant(v) for i, v in cvecs.items()}
    for qid, qv in sorted(qvecs.items()):
        qq = quant(qv)
        rel = sorted(((cos_e6(qq, cv), cid) for cid, cv in cq.items()),
                     key=lambda t: (-t[0], t[1]))[:n_cand]
        if not rel:
            continue
        sel = [rel[0]]
        pool = rel[1:]
        while len(sel) < k and pool:
            best = None
            for r, cid in pool:
                ms = max(cos_e6(cq[cid], cq[sid]) for _, sid in sel)
                mmr = lam * r - (100 - lam) * ms
                if best is None or (-mmr, cid) < best[0]:
                    best = ((-mmr, cid), (r, cid))
            sel.append(best[1])
            pool = [p for p in pool if p[1] != best[1][1]]
        out.extend((qid, rnd + 1, cid, r)
                   for rnd, (r, cid) in enumerate(sel))
    return sorted(out)


VEC = st.lists(st.floats(min_value=-1.0, max_value=1.0,
                         allow_nan=False, width=32),
               min_size=4, max_size=4)


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(VEC, min_size=2, max_size=10))
def test_mmr_diversify_matches_python_reference(spark, vecs):
    """Pins the greedy MMR contract end to end — e6-floor cosine,
    integer λ=70 mix, argmax ties → lowest id — including zero vectors
    and fewer-candidates-than-k pools."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.similarity import (
        mmr_diversify)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    q = df.filter(F.col("id") % 3 == 0)
    c = df.filter(F.col("id") % 3 != 0)
    got = sorted((r.q_id, r.round, r.c_id, r.rel_e6)
                 for r in mmr_diversify(q, c, k=3, n_cand=4,
                                        lam_pct=70).collect())
    qvecs = {i: v for i, v in rows if i % 3 == 0}
    cvecs = {i: v for i, v in rows if i % 3 != 0}
    assert got == _mmr_reference(qvecs, cvecs, k=3, n_cand=4, lam=70), rows


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd"]),
                         min_size=0, max_size=8).map(" ".join),
                min_size=1, max_size=5))
def test_ngram_novelty_matches_python_reference(spark, docs):
    """First-occurrence attribution by lowest doc_id over distinct
    3-grams, with the shingles() short-doc convention (a doc shorter
    than n yields its full text as one gram)."""
    import re

    from kafka_connect_streams_spark.operators.text import ngram_novelty
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_distinct_grams, r.novel_grams, r.novelty_e6)
           for r in ngram_novelty(df, "text", "doc_id", n=3).collect()}
    grams = {}
    for i, text in enumerate(docs):
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        gs = {" ".join(toks[j:j + 3])
              for j in range(max(len(toks) - 2, 1))}
        gs = {g for g in gs if g}
        if gs:
            grams[i] = gs
    first = {}
    for i in sorted(grams):
        for g in grams[i]:
            first.setdefault(g, i)
    want = {}
    for i, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == i)
        want[i] = (len(gs), novel, novel * 10**6 // len(gs))
    assert got == want, docs


def test_mmr_k1_returns_top_relevance_only(spark):
    """k=1 edge: Spark's sequence(2, 1) auto-steps DOWN ([2, 1]) and
    would run phantom greedy rounds; the guard makes k=1 exactly the
    relevance argmax and k=0 a ValueError."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.similarity import (
        mmr_diversify)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "id long, embedding array<float>")
    q = df.filter(F.col("id") == 0)
    c = df.filter(F.col("id") != 0)
    got = [(r.round, r.c_id)
           for r in mmr_diversify(q, c, k=1, n_cand=3).collect()]
    assert got == [(1, 1)]
    import pytest

    with pytest.raises(ValueError):
        mmr_diversify(q, c, k=0)
