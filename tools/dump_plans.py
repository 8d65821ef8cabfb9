"""Dump explain("formatted") for named queries to a directory.

Usage: python tools/dump_plans.py OUTDIR [--suffix SUF] query [query ...]
Plan generation runs the query builder (including any eager training
jobs) but never executes the final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_streams_spark.engine import get_spark  # noqa: E402
from kafka_connect_streams_spark import queries as Q  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    outdir = args.pop(0)
    suffix = ""
    if args and args[0] == "--suffix":
        args.pop(0)
        suffix = args.pop(0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in args:
        df = Q.QUERIES[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
