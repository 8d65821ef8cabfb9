"""Registry-wide sweep for expression re-evaluation in pushed filters.

The r14 finding (OPTIMIZATION_r14.md, commit 13c6925): Catalyst infers
``isnotnull`` from equi-join keys and plain ``>=`` filters on computed
columns, pushes the predicate below the projection, and re-substitutes
the WHOLE computed expression into a Filter — the most expensive
higher-order-function tree in the plan then evaluates twice per row.
``_nonnull_key`` / ``_nullsafe_ge`` (operators/similarity.py) are the
spellings that stop it.

This sweep builds every registered query's physical plan and reports
any Filter/PushedFilters condition that embeds a higher-order function
(transform/aggregate/zip_with/filter/exists/reduce lambdas) — each hit
is either a duplication bug or a documented deliberate pushdown.

Usage: python tools/sweep_hof_filters.py [sf_dir] [out_path]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_streams_spark.engine import get_spark  # noqa: E402
from kafka_connect_streams_spark import queries as Q  # noqa: E402

#: HOF markers in condition text: these only appear when a lambda-bearing
#: expression tree was substituted into the predicate.
HOF = re.compile(r"\b(transform|aggregate|zip_with|exists|reduce)\(|"
                 r"\bfilter\(lambdafunction|\blambdafunction\(")


def scan_plan(txt: str) -> list[str]:
    """Flagged condition lines from a formatted plan dump."""
    hits = []
    for line in txt.splitlines():
        s = line.strip()
        if (s.startswith("Condition") or s.startswith("PushedFilters")) \
                and HOF.search(s):
            hits.append(s[:400])
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        "plans/r15/sweep_hof_filters.txt"
    spark = get_spark("sweep-hof-filters")
    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:          # noqa: BLE001 — report, keep going
            errors[name] = repr(e)[:200]
            continue
        hits = scan_plan(txt)
        if hits:
            flagged[name] = hits
        print(f"{'HIT ' if hits else 'ok  '} {name}", flush=True)
    with open(out_path, "w") as f:
        f.write(f"# HOF-in-filter sweep over {len(Q.QUERIES)} registered "
                f"queries at {sf_dir}\n"
                f"# flagged: {len(flagged)}  errors: {len(errors)}\n\n")
        for name, hits in sorted(flagged.items()):
            f.write(f"== {name}\n")
            for h in hits:
                f.write(f"   {h}\n")
        for name, err in sorted(errors.items()):
            f.write(f"!! {name}: {err}\n")
    print(f"wrote {out_path}: {len(flagged)} flagged, {len(errors)} errors")


if __name__ == "__main__":
    main()
