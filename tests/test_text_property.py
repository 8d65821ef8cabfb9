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
