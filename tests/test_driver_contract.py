"""Guards for the driver contract that don't need a SparkSession.

Two failure classes shipped driver-red in past rounds while every local
test was green:

- round 4: DuckDB ``sum()`` over integers returns HUGEINT, which the
  driver's pandas fetch renders as float64 — the value hash sees ``3.0``
  vs Spark's ``3``. Six queries went red from this single cause.
- round 4: bench.py's stdout JSON line outgrew the driver's 2000-char
  stdout tail and the round recorded ``parsed: null`` — no bench value.

Both are mechanically checkable without running a single query, so pin
them here where any registry or headline edit trips them immediately.
"""

from __future__ import annotations

import json
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
SF_DIR = "/root/testdata/sf0.001"


def test_no_oracle_emits_hugeint_columns():
    """Every oracle's output schema must be HUGEINT-free: DESCRIBE each of
    the registered twins and fail with the exact offending columns."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = {}
    for name, sql in e.oracle_sql().items():
        desc = con.execute("DESCRIBE " + sql).fetchall()
        huge = [d[0] for d in desc if "HUGEINT" in str(d[1]).upper()]
        if huge:
            offenders[name] = huge
    assert not offenders, (
        f"CAST these oracle columns to BIGINT (driver pandas-fetch trap): "
        f"{offenders}")


#: queries DELIBERATELY registered without an oracle — the iterative-
#: algorithm exemption (driver runs a rows-only check; exactness is pinned
#: by a bit-exact reference test instead). Anything else missing an oracle
#: is an accident this guard must catch.
ORACLE_EXEMPT: set[str] = set()  # round 5: the Lloyd loop unrolled into SQL


def test_every_query_in_driver_window_has_an_oracle():
    """The first-50 window is what the driver hashes; a window entry
    without an oracle twin silently downgrades to a rows-only check."""
    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    window = list(queries)[:50]
    missing = [n for n in window
               if n not in oracles and n not in ORACLE_EXEMPT]
    assert not missing, f"window queries without oracle SQL: {missing}"


def test_bench_contract_line_fits_driver_stdout_tail():
    """Worst-case render of the bench JSON line must stay under the
    driver's 2000-char stdout tail (with margin) — adding headline
    queries without checking this is how round 4 lost its bench value."""
    import bench

    line = json.dumps({
        "metric": "headline_queries_total_wallclock",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 9999.999 for name in bench.HEADLINE},
        "sf": 0.1,
    })
    assert len(line) <= 1800, (
        f"bench line would be {len(line)} chars at worst-case widths; "
        "trim HEADLINE or move keys to stderr")


import pytest  # noqa: E402


@pytest.mark.slow
def test_every_query_tolerates_empty_tables(spark, tmp_path):
    """Registry-wide robustness: every registered query must run (and
    return an empty-or-valid result, not crash) when every input table is
    EMPTY — the filter-matched-nothing / fresh-partition case a 100 TB
    pipeline hits constantly. Round-5 catch: the PQ family indexed an
    empty codebook sample; samplers now return [] and the entry points
    return a typed empty relation."""
    from kafka_connect_streams_spark import queries as Q

    src = "/root/testdata/sf0.001"
    tables = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")
    for t in tables:
        (spark.read.parquet(f"{src}/{t}.parquet").limit(0)
         .write.mode("overwrite").parquet(str(tmp_path / f"{t}.parquet")))
    from tools.check import nonscalar_cols

    failures = []
    nonscalar = []
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, str(tmp_path))
            # driver-contract mirror (round-10 bpe_encode red row): the
            # driver's pandas sort_values canonicalizer cannot sort
            # array/map/struct cells — every registered output schema
            # must be scalar-only
            bad = nonscalar_cols(df.schema)
            if bad:
                nonscalar.append((name, bad))
            df.collect()
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures.append((name, str(exc).splitlines()[0][:120]))
    assert not failures, failures
    assert not nonscalar, (
        "registered queries with driver-unsortable output columns: "
        f"{nonscalar}")


def test_gate_rejects_nonscalar_output_schema(spark):
    """tools/check.py must refuse (locally) any query whose Spark output
    schema contains array/map/struct columns — the exact class of red
    the driver produced for bpe_encode in round 10 while the local gate
    passed. A synthetic array-output frame is the rejection fixture."""
    from tools.check import nonscalar_cols

    df = spark.range(1).selectExpr(
        "id", "array(1, 2) AS ids", "map('a', 1) AS m",
        "named_struct('x', 1) AS s", "cast(id as string) AS ok")
    assert nonscalar_cols(df.schema) == ["ids", "m", "s"]
    assert nonscalar_cols(df.select("id", "ok").schema) == []


def test_empty_array_join_convention_matches_duckdb(spark):
    """Pin the bpe_encode serialization convention cross-engine: Spark
    ``array_join([], ',')`` is '' while DuckDB ``array_to_string([],
    ',')`` is NULL — the oracle MUST coalesce to '' so empty/NULL-text
    documents hash identically (md5('') on both sides)."""
    import duckdb

    s = spark.sql(
        "SELECT array_join(transform(array(), t -> cast(t as string)), "
        "',') AS j, md5(array_join(cast(array() as array<string>), ',')) "
        "AS h").collect()[0]
    assert s.j == ""
    con = duckdb.connect()
    raw, fixed, h = con.execute(
        "SELECT array_to_string(CAST([] AS VARCHAR[]), ','), "
        "coalesce(array_to_string(CAST([] AS VARCHAR[]), ','), ''), "
        "md5(coalesce(array_to_string(CAST([] AS VARCHAR[]), ','), ''))"
    ).fetchone()
    assert raw is None, "DuckDB changed empty array_to_string semantics"
    assert fixed == ""
    assert h == s.h


def test_doc_counts_match_registry():
    """README/SURVEY query counts must track the registry — count drift
    is a recurring review finding (round-4 verdict); this pins the two
    load-bearing sentences to ``len(QUERIES)``."""
    import re

    from kafka_connect_streams_spark import queries as Q

    n = len(Q.QUERIES)
    readme = open("/root/repo/README.md").read()
    m = re.search(r"queries\.py\s+(\d+) registered queries", readme)
    assert m and int(m.group(1)) == n, (
        f"README says {m and m.group(1)} registered queries; registry has {n}")
    survey = open("/root/repo/SURVEY.md").read()
    for pat in (r"widens the surface to (\d+) registered queries",
                r"close-out numbers: (\d+) registered queries"):
        m = re.search(pat, survey)
        assert m and int(m.group(1)) == n, (pat, m and m.group(1), n)


def test_compare_bench_refuses_cross_mode():
    """BENCH_r01–r09 are count-mode (Catalyst pruned unused columns);
    r10+ are noop-mode (full evaluation). tools/compare_bench.py must
    refuse a comparison crossing the boundary (exit 2) unless
    explicitly forced — a raw r09-vs-r10 ratio measures the force-mode
    switch, not performance."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.compare_bench import bench_round, main

    assert bench_round("BENCH_r09.json") == 9
    assert bench_round("/x/BENCH_r10.json") == 10
    assert bench_round("raw_line.json") is None
    assert main(["/root/repo/BENCH_r09.json",
                 "/root/repo/BENCH_r10.json"]) == 2
    assert main(["/root/repo/BENCH_r10.json",
                 "/root/repo/BENCH_r10.json"]) == 0


def test_no_oracle_emits_nonscalar_columns():
    """Symmetric mirror of the Spark-side probe: DESCRIBE every oracle
    and fail on LIST/STRUCT/MAP output columns — a DuckDB list cell
    crashes the driver's pandas sort_values exactly like a Spark array
    did in round 10."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = {}
    for name, sql in e.oracle_sql().items():
        desc = con.execute("DESCRIBE " + sql).fetchall()
        bad = [d[0] for d in desc
               if "[]" in str(d[1]) or
               str(d[1]).upper().startswith(("STRUCT", "MAP"))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"serialize these oracle columns to scalars "
        f"(driver sort_values trap): {offenders}")
    # the probe itself must reject a synthetic list column
    got = con.execute("DESCRIBE SELECT [1, 2] AS xs, 1 AS ok").fetchall()
    assert any("[]" in str(d[1]) for d in got)


def test_bm25_idf_floor_margins_are_wide_at_all_sfs():
    """bm25_multiterm's only cross-engine libm exposure is
    floor(1e6·ln(x)) on the <=4 per-term idf inputs. A 1-ULP
    Java-vs-libm ln difference (~2e-9 at e6 scale) can only flip the
    floor if the value sits that close to an integer — verify the
    actual margins at every SF are >= 1e-3, six orders of magnitude of
    headroom, so the hash can never go red from ln rounding."""
    import math

    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'")
        rows = con.execute("""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split_regex(lower(coalesce(text, '')),
                                              '\\W+'),
                           x -> length(x) > 0)) AS term
                FROM documents),
            tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term
                   ORDER BY df DESC, term LIMIT 4)
            SELECT df.df, n.n_docs FROM df CROSS JOIN n
        """).fetchall()
        assert rows, sf
        for dfv, n_docs in rows:
            x = 1e6 * math.log((2 * n_docs + 2) / (2 * dfv + 1))
            frac = x - math.floor(x)
            margin = min(frac, 1.0 - frac)
            assert margin > 1e-3, (sf, dfv, n_docs, x, margin)


def test_ksql_geo_floor_margins_are_wide_at_all_sfs():
    """ksql_functions' only cross-engine libm exposure is the
    GEO_DISTANCE haversine floored to 0.1-km units. Spark computes trig
    via java.lang.Math, DuckDB via libm — last-ulp differences bound
    the cross-engine deviation near 1e-13 relative (~2e-8 grid units at
    Earth scale). Verify every distinct coordinate tuple's nonzero
    distance sits >= 1e-5 grid units from a floor boundary at every SF
    (identical points give an EXACT 0.0 on both engines — sin/asin of
    ±0.0 are exact in IEEE — so zero margin there is safe)."""
    import math

    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/orders.parquet'")
        rows = con.execute("""
            SELECT DISTINCT o_orderkey % 89, o_custkey % 179,
                   o_orderkey % 67, o_custkey % 131
            FROM orders WHERE o_orderkey % 29 = 0""").fetchall()
        assert rows, sf
        for la1, lo1, la2, lo2 in rows:
            v = 6371.0 * 2 * math.asin(math.sqrt(
                math.sin((math.radians(la2) - math.radians(la1)) / 2) ** 2
                + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
                * math.sin((math.radians(lo2)
                            - math.radians(lo1)) / 2) ** 2))
            if v == 0.0:
                continue
            x = v * 10
            frac = x - math.floor(x)
            margin = min(frac, 1.0 - frac)
            assert margin > 1e-5, (sf, (la1, lo1, la2, lo2), x, margin)
