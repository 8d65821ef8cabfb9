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
