"""Property test: repetition_signals ≡ a pure-Python reference.

Hypothesis drives randomized token sequences through the Spark operator and
an independent Python computation of the same closed-form signals
(distinct-token ratio, top-token share, duplicate-bigram fraction, all e9
fixed-point), catching tokenization and integer-division edge cases the
fixed examples miss.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_streams_spark.operators.text import repetition_signals

WORD = st.sampled_from(["alpha", "beta", "gamma", "x9", "spam", "a"])
DOC = st.lists(WORD, min_size=1, max_size=12).map(" ".join)


def _reference(text: str) -> dict:
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    n = len(toks)
    distinct = len(set(toks))
    top = max(toks.count(t) for t in set(toks))
    # bigrams with the shingles() short-doc convention: floor sequence at 0
    idx = range(0, max(n - 2, 0) + 1)
    bigrams = [" ".join(toks[i:i + 2]) for i in idx]
    nb, ndb = len(bigrams), len(set(bigrams))
    return {
        "n_tokens": n, "n_distinct": distinct,
        "distinct_ratio_e9": distinct * 10**9 // n,
        "top_token_share_e9": top * 10**9 // n,
        "dup_bigram_frac_e9": ((nb - ndb) * 10**9 // nb) if nb else 0,
    }


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(DOC, min_size=1, max_size=5))
def test_repetition_signals_match_python_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in
           repetition_signals(df, "text", "doc_id").collect()}
    for i, text in enumerate(docs):
        want = _reference(text)
        have = {k: got[i][k] for k in want}
        assert have == want, (text, have, want)


CHUNK_WORD = st.sampled_from(["aa", "b", "cc9", "dd", "e"])
CHUNK_DOC = st.lists(CHUNK_WORD, min_size=0, max_size=40).map(" ".join)


def _chunk_reference(text: str, size: int, stride: int) -> list[tuple]:
    import hashlib
    toks = [t for t in text.split() if t]
    if not toks:
        return []
    n = len(toks)
    n_extra = max(0, -(-(n - size) // stride))  # ceil((n-size)/stride), ≥0
    out = []
    for k in range(n_extra + 1):
        chunk = toks[k * stride:k * stride + size]
        out.append((k, len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest()))
    return out


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(CHUNK_DOC, min_size=1, max_size=5),
       st.sampled_from([(4, 3), (8, 8), (5, 2), (16, 12)]))
def test_chunk_documents_match_python_reference(spark, docs, size_stride):
    from kafka_connect_streams_spark.operators.text import chunk_documents
    size, stride = size_stride
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got: dict = {}
    for r in chunk_documents(df, "text", "doc_id",
                             size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_tokens, r.chunk_fp))
    for i, text in enumerate(docs):
        want = _chunk_reference(text, size, stride)
        assert sorted(got.get(i, [])) == want, (text, size, stride)


BUDGET_WORD = st.sampled_from(["w", "xx", "yyy"])
BUDGET_DOC = st.lists(BUDGET_WORD, min_size=0, max_size=30).map(" ".join)
STRATUM = st.sampled_from(["s0", "s1", "hot"])


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(STRATUM, BUDGET_DOC), min_size=1, max_size=12),
       st.sampled_from([0, 5, 25, 10_000]))
def test_token_budget_sample_matches_naive_reference(spark, rows, budget):
    """Bin-accelerated budget sample ≡ the naive per-stratum running-sum
    walk, on adversarial shapes: empty docs, one-doc strata, a dominant
    'hot' stratum, budget 0 (nothing kept) and a budget larger than any
    stratum (everything kept)."""
    import hashlib
    from kafka_connect_streams_spark.operators.text import token_budget_sample
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, stratum string, text string")
    got = {r.doc_id: (r.n_tok, r.cum_tok) for r in
           token_budget_sample(df, "text", "doc_id", "stratum",
                               budget=budget).collect()}
    by_s: dict = {}
    for i, (s, t) in enumerate(rows):
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_s.setdefault(s, []).append((h, i, len(t.split())))
    want = {}
    for s, items in by_s.items():
        cum = 0
        for h, i, n in sorted(items):
            cum += n
            if cum <= budget:
                want[i] = (n, cum)
    assert got == want, (rows, budget, got, want)
