"""Property test: asof_join ≡ pandas merge_asof (backward, exact-match-ok).

pandas.merge_asof is an independent, widely-trusted reference implementation
of as-of semantics — hypothesis drives randomized inputs through both engines
and compares the joined frames exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_streams_spark.operators.joins import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=30)


@st.composite
def asof_inputs(draw):
    left = draw(st.lists(st.tuples(KEYS, TS), min_size=1, max_size=8))
    # right side unique on (key, ts) — the documented determinism precondition
    right = draw(st.lists(st.tuples(KEYS, TS), min_size=0, max_size=8,
                          unique=True))
    return left, right


@pytest.mark.slow
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_inputs())
def test_asof_join_matches_pandas_merge_asof(spark, pair):
    left_rows, right_rows = pair
    lpdf = pd.DataFrame(
        [{"k": k, "t": t, "lv": f"L{i}"} for i, (k, t) in enumerate(left_rows)])
    rpdf = pd.DataFrame(
        [{"k": k, "t": t, "rv": f"R{k}_{t}"} for (k, t) in right_rows],
        columns=["k", "t", "rv"])

    expected = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable").astype({"k": "int64", "t": "int64"})
        if len(rpdf) else rpdf,
        on="t", by="k", direction="backward", allow_exact_matches=True,
    ).set_index("lv")["rv"].to_dict() if len(rpdf) else {
        row["lv"]: None for _, row in lpdf.iterrows()}

    left = (spark.createDataFrame(lpdf)
            .selectExpr("k", "timestamp_micros(t * 1000) AS t", "lv"))
    if len(rpdf):
        right = (spark.createDataFrame(rpdf)
                 .selectExpr("k", "timestamp_micros(t * 1000) AS t", "rv"))
    else:
        right = spark.createDataFrame([], "k bigint, t timestamp_ntz, rv string")

    got = {r.lv: r.rv for r in asof_join(
        left, right, key="k", ts="t", right_cols=["rv"]).collect()}

    normalized = {k: (None if pd.isna(v) else v) for k, v in expected.items()}
    assert got == normalized
