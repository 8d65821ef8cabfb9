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


# ---------------------------------------------------------------------------
# linear_classifier_score ≡ Python md5 reference
# ---------------------------------------------------------------------------

def _linear_reference(text: str) -> tuple[int, int, str]:
    import hashlib
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    score = 0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 64
        score += ((b + 71) * 2654435761) % 2001 - 1000
    return len(toks), score, ("keep" if score >= 0 else "drop")


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(DOC, min_size=1, max_size=5))
def test_linear_classifier_matches_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.text import (
        linear_classifier_score)
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           linear_classifier_score(df, "text", "doc_id").collect()}
    for i, text in enumerate(docs):
        n, score, label = _linear_reference(text)
        r = got[i]
        assert (r.n_tokens, r.score, r.label) == (n, score, label), text


# ---------------------------------------------------------------------------
# boilerplate_removal ≡ Python span-removal reference
# ---------------------------------------------------------------------------

def _boilerplate_reference(docs: list[str], n: int, min_docs: int):
    tokd = {i: [t for t in re.split(r"\W+", d.lower()) if t]
            for i, d in enumerate(docs)}
    gram_docs: dict[str, set[int]] = {}
    for i, toks in tokd.items():
        for p in range(len(toks) - n + 1):
            gram_docs.setdefault(" ".join(toks[p:p + n]), set()).add(i)
    bp = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for i, toks in tokd.items():
        cov: set[int] = set()
        for p in range(len(toks) - n + 1):
            if " ".join(toks[p:p + n]) in bp:
                cov.update(range(p, p + n))
        clean = " ".join(t for q, t in enumerate(toks) if q not in cov)
        out[i] = (len(toks), len(cov), clean)
    return out


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=0, max_size=9).map(" ".join),
                min_size=1, max_size=6))
def test_boilerplate_removal_matches_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.text import boilerplate_removal
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           boilerplate_removal(df, "text", "doc_id",
                               n=3, min_docs=2).collect()}
    want = _boilerplate_reference(docs, 3, 2)
    assert set(got) == set(want)
    for i, (nw, nr, clean) in want.items():
        r = got[i]
        assert (r.n_words, r.n_removed, r.clean_text) == (nw, nr, clean), (
            i, docs[i], (r.n_words, r.n_removed, r.clean_text), want[i])


# ---------------------------------------------------------------------------
# lm_doc_score ≡ Python bigram-LM reference
# ---------------------------------------------------------------------------

def _lm_reference(docs: list[str]):
    tokd = {i: [t for t in re.split(r"\W+", d.lower()) if t]
            for i, d in enumerate(docs)}
    bcnt: dict[tuple[str, str], int] = {}
    for toks in tokd.values():
        for a, b in zip(toks, toks[1:]):
            bcnt[(a, b)] = bcnt.get((a, b), 0) + 1
    wstart: dict[str, int] = {}
    for (a, _), c in bcnt.items():
        wstart[a] = wstart.get(a, 0) + c
    out = {}
    for i, toks in tokd.items():
        grams = list(zip(toks, toks[1:]))
        if not grams:
            continue
        ps = [bcnt[g] * 10**9 // wstart[g[0]] for g in grams]
        out[i] = (len(grams),
                  sum(1 for g in grams if bcnt[g] == 1),
                  sum(ps) // len(grams), min(ps))
    return out


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(DOC, min_size=1, max_size=6))
def test_lm_doc_score_matches_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.text import lm_doc_score
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in lm_doc_score(df, "text", "doc_id").collect()}
    want = _lm_reference(docs)
    assert set(got) == set(want)
    for i, (nb, ns, avg, mn) in want.items():
        r = got[i]
        assert (r.n_bigrams, r.n_singleton, r.avg_p_e9, r.min_p_e9) == (
            nb, ns, avg, mn), (i, docs[i])


# ---------------------------------------------------------------------------
# gopher_rules ≡ Python rule-gate reference
# ---------------------------------------------------------------------------

def _gopher_reference(text: str):
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    n = len(toks)
    chars = sum(len(t) for t in toks)
    nd = len(set(toks))
    top = max((toks.count(t) for t in set(toks)), default=0)
    bg = [" ".join(toks[i:i + 2]) for i in range(0, max(n - 2, 0) + 1)]
    avg_e3 = (chars * 1000) // n if n else 0
    dr = nd * 10**9 // n if n else 0
    ts = top * 10**9 // n if n else 0
    db = ((len(bg) - len(set(bg))) * 10**9 // len(bg)) if n else 0
    reasons = [r for r, bad in [
        ("too_short", n < 20), ("too_long", n > 100000),
        ("weird_token_length", n > 0 and (avg_e3 < 1500 or avg_e3 > 12000)),
        ("low_diversity", dr < 2 * 10**8), ("top_heavy", ts > 3 * 10**8),
        ("repetitive", db > 5 * 10**8)] if bad]
    fr = ",".join(reasons)
    return (n, avg_e3, dr, ts, db, fr, fr == "")


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=0, max_size=30).map(" ".join),
                min_size=1, max_size=5))
def test_gopher_rules_match_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.text import gopher_rules
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df, "text", "doc_id").collect()}
    for i, text in enumerate(docs):
        n, avg, dr, ts, db, fr, keep = _gopher_reference(text)
        r = got[i]
        assert (r.n_tokens, r.avg_tok_len_e3, r.distinct_ratio_e9,
                r.top_token_share_e9, r.dup_bigram_frac_e9, r.fail_reasons,
                r.keep) == (n, avg, dr, ts, db, fr, keep), (text,)


# ---------------------------------------------------------------------------
# winnow_pairs ≡ Python winnowing reference (Schleimer et al.)
# ---------------------------------------------------------------------------

def _winnow_reference(docs, k=3, w=4, min_shared=2, max_doc_freq=50):
    import hashlib

    def fps(text):
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        if len(toks) < k:
            return set()
        hs = [int(hashlib.md5(" ".join(toks[i:i + k]).encode())
                  .hexdigest()[:8], 16)
              for i in range(len(toks) - k + 1)]
        return {min(hs[j:j + w])
                for j in range(0, max(len(hs) - w, 0) + 1)}

    fp = {i: fps(d) for i, d in enumerate(docs)}
    docfreq = {}
    for s in fp.values():
        for f in s:
            docfreq[f] = docfreq.get(f, 0) + 1
    out = {}
    ids = sorted(fp)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            shared = {f for f in fp[x] & fp[y] if docfreq[f] <= max_doc_freq}
            if len(shared) >= min_shared:
                out[(x, y)] = (len(shared),
                               len(shared) * 10**9
                               // min(len(fp[x]), len(fp[y])))
    return out


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=0, max_size=14).map(" ".join),
                min_size=2, max_size=6))
def test_winnow_pairs_match_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.dedup import winnow_pairs
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.n_shared, r.containment_e9)
           for r in winnow_pairs(df, "text", "doc_id").collect()}
    assert got == _winnow_reference(docs), docs


def test_winnowing_guarantee_shared_span_yields_shared_fingerprint(spark):
    """The winnowing property: any shared word span of length ≥ w+k-1
    (= 6 here) MUST contribute at least one shared fingerprint."""
    from kafka_connect_streams_spark.operators.dedup import (
        winnow_fingerprints)
    span = "alpha beta gamma delta epsilon zeta"          # 6 shared words
    docs = [(0, "xx yy " + span + " zz"), (1, span + " qq rr ss tt")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnow_fingerprints(df, "text", "doc_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 6-word span must share a print"


def test_null_text_fails_quality_gates_as_empty(spark):
    """NULL text must behave as an EMPTY document: zero tokens, dropped by
    the rule gate with too_short — never keep=true via all-NULL rule
    comparisons (the trap: CASE WHEN NULL < 20 is unknown, so every rule
    silently passes a NULL doc)."""
    from kafka_connect_streams_spark.operators.text import (
        gopher_rules, linear_classifier_score, token_stats)
    df = spark.createDataFrame([(0, "a good doc right here"), (1, None),
                                (2, "")], "doc_id long, text string")
    g = {r.doc_id: r for r in gopher_rules(df, "text", "doc_id").collect()}
    assert g[1].n_tokens == 0
    assert g[1].keep is False and "too_short" in g[1].fail_reasons
    assert g[2].keep is False
    lc = {r.doc_id: r
          for r in linear_classifier_score(df, "text", "doc_id").collect()}
    assert lc[1].n_tokens == 0 and lc[1].score == 0
    ts = {r.doc_id: r for r in token_stats(df, "text", "doc_id").collect()}
    assert ts[1].word_tokens == 0


# ---------------------------------------------------------------------------
# minhash / simhash ≡ Python md5 references
# ---------------------------------------------------------------------------

_MINHASH_P = 2_147_483_647
_MINHASH_GOLD = 2_654_435_769


def _h48(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _shingle_reference(text: str, n: int = 3) -> set:
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    grams = {" ".join(toks[i:i + n])
             for i in range(0, max(len(toks) - n, 0) + 1)}
    return {g for g in grams if g}


def _minhash_reference(text: str, k: int = 16) -> list:
    sig = [None] * k
    for g in _shingle_reference(text):
        h0 = _h48(g) % _MINHASH_P
        for s in range(k):
            hs = (h0 * (2 * s + 1) + s * _MINHASH_GOLD) % _MINHASH_P
            if sig[s] is None or hs < sig[s]:
                sig[s] = hs
    return sig


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=1, max_size=10).map(" ".join),
                min_size=1, max_size=4))
def test_minhash_signatures_match_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.dedup import (
        minhash_signatures_wide, shingles)
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    sh = shingles(df, "text", "doc_id", n=3)
    got = {r.doc_id: list(r.sig)
           for r in minhash_signatures_wide(sh, "doc_id", k=16).collect()}
    for i, text in enumerate(docs):
        want = _minhash_reference(text)
        if want[0] is None:
            assert i not in got          # empty shingle set → no signature
        else:
            assert got[i] == want, (text, got[i], want)


def _simhash_reference(text: str, bits: int = 16) -> int:
    toks = {t for t in re.split(r"\W+", text.lower()) if t}
    votes = [0] * bits
    for t in toks:
        h = _h48(t)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum((1 << b) for b in range(bits) if votes[b] > 0)


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=1, max_size=10).map(" ".join),
                min_size=1, max_size=4))
def test_simhash_matches_python_reference(spark, docs):
    from kafka_connect_streams_spark.operators.dedup import simhash
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: r.simhash
           for r in simhash(df, "text", "doc_id", bits=16).collect()}
    for i, text in enumerate(docs):
        assert got[i] == _simhash_reference(text), text


def _rolling_reference(docs: list[str], k: int) -> dict:
    """Sequential rolling-window exact-substring dedup: first occurrence
    in (doc_id, pos) order wins; tokens covered by any later-occurrence
    window are removed."""
    seen: set[str] = set()
    out = {}
    for did, text in enumerate(docs):
        toks = [t for t in re.split(r"\W+", (text or "").lower()) if t]
        n = len(toks)
        if n == 0:
            continue
        nwin = max(n - k + 1, 0)
        dup_pos = []
        for p in range(nwin):
            fp = " ".join(toks[p:p + k])
            if fp in seen:
                dup_pos.append(p)
            else:
                seen.add(fp)
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        kept = [toks[i] for i in range(n) if i not in covered]
        out[did] = (nwin, len(dup_pos), len(kept), " ".join(kept))
    return out


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=0, max_size=14).map(" ".join),
                min_size=1, max_size=5))
def test_block_dedup_rolling_matches_python_reference(spark, docs):
    """k=3 over a 3-word alphabet forces dense window collisions —
    within-doc repetition, cross-doc spans, and full-coverage docs."""
    import hashlib

    from kafka_connect_streams_spark.operators.text import (
        block_dedup_rolling)
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.dup_windows, r.kept_tokens, r.kept_fp)
           for r in block_dedup_rolling(df, "text", "doc_id", k=3).collect()}
    want = _rolling_reference(docs, k=3)
    assert set(got) == set(want)
    for did, (nw, dw, kt, ktext) in want.items():
        fp = hashlib.md5(ktext.encode()).hexdigest()
        assert got[did] == (nw, dw, kt, fp), (docs[did], got[did], want[did])


def _rolling_minspan_reference(docs: list[str], k: int,
                               min_span: int) -> dict:
    """Sequential reference for the Lee-et-al. minimum match length:
    duplicate windows merge into maximal covered intervals; only
    intervals spanning >= min_span tokens remove text."""
    seen: set[str] = set()
    out = {}
    for did, text in enumerate(docs):
        toks = [t for t in re.split(r"\W+", (text or "").lower()) if t]
        n = len(toks)
        if n == 0:
            continue
        nwin = max(n - k + 1, 0)
        dup_pos = []
        for p in range(nwin):
            fp = " ".join(toks[p:p + k])
            if fp in seen:
                dup_pos.append(p)
            else:
                seen.add(fp)
        # merge [p, p+k) intervals; apply the span threshold
        intervals = []
        for p in dup_pos:
            if intervals and p <= intervals[-1][1]:
                intervals[-1][1] = max(intervals[-1][1], p + k)
            else:
                intervals.append([p, p + k])
        covered = set()
        for lo, hi in intervals:
            if hi - lo >= min_span:
                covered.update(range(lo, hi))
        kept = [toks[i] for i in range(n) if i not in covered]
        out[did] = (nwin, len(dup_pos), len(kept), " ".join(kept))
    return out


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=0, max_size=16).map(" ".join),
                min_size=1, max_size=5))
def test_block_dedup_minspan_matches_python_reference(spark, docs):
    """k=3, min_span=5 over a 3-word alphabet: dense collisions where
    some merged islands sit under the threshold (kept) and some over
    (removed) — pins the merge-then-cut semantics bit-for-bit."""
    import hashlib

    from kafka_connect_streams_spark.operators.text import (
        block_dedup_rolling)
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.dup_windows, r.kept_tokens, r.kept_fp)
           for r in block_dedup_rolling(df, "text", "doc_id",
                                        k=3, min_span=5).collect()}
    want = _rolling_minspan_reference(docs, k=3, min_span=5)
    assert set(got) == set(want)
    for did, (nw, dw, kt, ktext) in want.items():
        fp = hashlib.md5(ktext.encode()).hexdigest()
        assert got[did] == (nw, dw, kt, fp), (docs[did], got[did], want[did])


def test_minspan_guarantees(spark):
    """The two sides of the Lee-et-al. threshold contract (k=4,
    min_span=8): (a) a duplicated span SHORTER than min_span — here 5
    tokens, one 4-window island of span 5 — is NEVER removed; (b) a
    shared span of >= min_span tokens is still removed in FULL; and the
    detection counters (dup_windows) are threshold-independent."""
    from kafka_connect_streams_spark.operators.text import (
        block_dedup_rolling)
    short = "p q r s t"                       # 5 shared tokens < 8
    long_ = "c1 c2 c3 c4 c5 c6 c7 c8 c9"     # 9 shared tokens >= 8
    df = spark.createDataFrame(
        [(0, short + " u0 v0 w0 x0 " + long_),
         (1, short + " u1 v1 w1 x1 " + long_)],
        "doc_id long, text string")
    base = {r.doc_id: r for r in block_dedup_rolling(
        df, "text", "doc_id", k=4).collect()}
    cut = {r.doc_id: r for r in block_dedup_rolling(
        df, "text", "doc_id", k=4, min_span=8).collect()}
    # doc 0 is the first occurrence: untouched either way (18 tokens)
    assert base[0].kept_tokens == cut[0].kept_tokens == 18
    # without the threshold doc 1 loses both shared spans (5 + 9)
    assert base[1].kept_tokens == 18 - 5 - 9
    # with min_span=8 only the 9-token span is removed; the 5-token
    # island (hi - lo = 5 < 8) survives in full
    assert cut[1].kept_tokens == 18 - 9
    # detection is threshold-independent
    assert base[1].dup_windows == cut[1].dup_windows > 0


def test_rolling_catches_straddling_duplicate_block_dedup_misses(spark):
    """The guarantee the operator exists for: a 10-token span shared
    between two docs, block-aligned in doc a but straddling doc b's
    8-token block boundary. block_dedup removes NOTHING from b (no
    complete aligned block matches); rolling (k=8, stride 1) detects
    the 3 shared 8-windows and removes the whole span."""
    from kafka_connect_streams_spark.operators.text import (
        block_dedup, block_dedup_rolling)
    span = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [("a", span + " alpha beta"),
         ("b", "xx yy " + span + " zz")],
        "doc_id string, text string")
    blk = {r.doc_id: r.kept_tokens
           for r in block_dedup(df, "text", "doc_id", size=8).collect()}
    rol = {r.doc_id: r.kept_tokens
           for r in block_dedup_rolling(df, "text", "doc_id", k=8).collect()}
    assert blk["b"] == 13, "straddling span must escape fixed blocks"
    assert rol["b"] == 3, "rolling must remove the shared 10-token span"
    assert rol["a"] == 12 and blk["a"] == 12, "first occurrence survives"


def _bm25_multiterm_reference(docs: list[str], n_terms: int, k: int):
    import math
    toks = {i: [t for t in re.split(r"\W+", (d or "").lower()) if t]
            for i, d in enumerate(docs)}
    toks = {i: t for i, t in toks.items() if t}
    if not toks:
        return []
    n_docs = len(toks)
    l_total = sum(len(t) for t in toks.values())
    df_: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df_[term] = df_.get(term, 0) + 1
    qterms = sorted(df_, key=lambda t: (-df_[t], t))[:n_terms]
    idf = {t: math.floor(1e6 * math.log((2 * n_docs + 2)
                                        / (2 * df_[t] + 1)))
           for t in qterms}
    scored = []
    for i, t in toks.items():
        dl = len(t)
        hit = [q for q in qterms if q in t]
        if not hit:
            continue
        score = 0
        for q in hit:
            tf = t.count(q)
            num = 20 * tf * l_total
            den = num + 6 * l_total + 18 * dl * n_docs
            score += idf[q] * math.floor(num / den * 1e9)
        scored.append((i, len(hit), dl, score))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return scored[:k]


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(WORD, min_size=0, max_size=12).map(" ".join),
                min_size=1, max_size=6))
def test_bm25_multiterm_matches_python_reference(spark, docs):
    """Pins the fixed-point contract end to end: idf_e6 flooring,
    tfsat_e9 as a single IEEE division, and the order-insensitive
    BIGINT Σ — against a sequential Python scorer."""
    from kafka_connect_streams_spark.operators.text import bm25_multiterm
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = [(r.doc_id, r.n_terms_hit, r.dl, r.score_fp)
           for r in bm25_multiterm(df, "text", "doc_id",
                                   n_terms=3, k=4).collect()]
    assert got == _bm25_multiterm_reference(docs, n_terms=3, k=4), docs


QI_ROW = st.tuples(st.sampled_from(["A", "B", None]),
                   st.one_of(st.none(), st.integers(0, 2)),
                   st.integers(0, 1))


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(QI_ROW, min_size=1, max_size=30),
       st.integers(2, 4))
def test_k_anonymize_release_property(spark, rows, k):
    """Hypothesis pin of the k-anonymity release invariants against a
    sequential Python reference on arbitrary small QI tables: (1) the
    output partitions the input ids exactly; (2) every released
    non-suppressed group has >= k members; (3) the level assignment
    equals the reference two-level local recoding (level 0 = full-QI
    count >= k, level 1 = coarse count AMONG the level-0 failures
    >= k, else level 2)."""
    from collections import Counter
    from kafka_connect_streams_spark.operators.aggregations import (
        k_anonymize)
    data = [(i, seg, nat, bal) for i, (seg, nat, bal) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id bigint, seg string, nat int, bal int")
    out = {r.id: r for r in k_anonymize(
        df, "id", ["seg", "nat", "bal"], coarse_n=1, k=k).collect()}
    assert sorted(out) == [d[0] for d in data]
    # reference recoding
    full = Counter((s, n, b) for _, s, n, b in data)
    fails = [(i, s) for i, s, n, b in data if full[(s, n, b)] < k]
    coarse = Counter(s for _, s in fails)
    want = {}
    for i, s, n, b in data:
        if full[(s, n, b)] >= k:
            want[i] = (0, full[(s, n, b)])
        elif coarse[s] >= k:
            want[i] = (1, coarse[s])
        else:
            want[i] = (2, sum(c for c in coarse.values() if c < k))
    got = {i: (r.anon_level, r.group_size) for i, r in out.items()}
    # level-2 group size is the count of level-2 rows
    n2 = sum(1 for v in want.values() if v[0] == 2)
    want = {i: (lvl, n2 if lvl == 2 else gs)
            for i, (lvl, gs) in want.items()}
    assert got == want
    groups = Counter((r.anon_level, r.seg, r.nat, r.bal)
                     for r in out.values())
    for (lvl, *_), n in groups.items():
        assert lvl == 2 or n >= k


LANG = st.sampled_from(["en", "de", "fr", None])
LANGID_TEXT = st.one_of(
    st.none(),
    st.text(alphabet="abcx ", min_size=0, max_size=12))


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(LANG, LANGID_TEXT), min_size=1, max_size=8))
def test_langid_ngram_matches_python_reference(spark, rows):
    """Hypothesis pin of the trained char-trigram langid classifier
    against a sequential pure-Python replica of the whole pipeline
    (bucket hashing, e9 rate training, score sums, max-score +
    min-language tie-break): per-doc predictions and winning scores
    must match exactly, including the '??' fallback for docs shorter
    than one trigram and the convention that NULL-lang rows train
    nothing (the equi-join drops them in both engines) but still get
    predictions."""
    import hashlib
    from collections import Counter
    from kafka_connect_streams_spark.operators.text import langid_ngram

    docs = [(i, lang, text) for i, (lang, text) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id bigint, lang string, "
                                     "text string")
    got = {r.doc_id: (r.lang, r.pred_lang, r.score_e9)
           for r in langid_ngram(df, "text", "doc_id", "lang").collect()}

    def grams(text):
        t = (text or "").lower()
        return [t[i:i + 3] for i in range(len(t) - 2)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % 1024

    bl, lt, doc_b = Counter(), Counter(), {}
    for i, lang, text in docs:
        c = Counter(bucket(g) for g in grams(text))
        doc_b[i] = c
        if lang is not None:  # NULL-lang rows train nothing
            for b, n in c.items():
                bl[(b, lang)] += n
                lt[lang] += n
    rates = {(b, lg): bl[(b, lg)] * 10**9 // lt[lg] for (b, lg) in bl}
    for i, lang, text in docs:
        scores: dict = {}
        for (b, lg), r in rates.items():
            if b in doc_b[i]:
                scores[lg] = scores.get(lg, 0) + doc_b[i][b] * r
        if scores:
            mx = max(scores.values())
            want = (lang, min(lg for lg, s in scores.items() if s == mx),
                    mx)
        else:
            want = (lang, "??", 0)
        assert got[i] == want, (i, text, got[i], want)
