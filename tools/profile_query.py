"""Per-query profiler for the optimization rounds (guide §1).

For each named query, measures separately:
  - build_s : time for ``QUERIES[name](spark, sf_dir)`` — driver-side plan
    construction INCLUDING any eager training jobs / collects / eager
    localCheckpoints the query runs while building its DataFrame.
  - exec_s  : time for the noop-sink evaluation of the returned plan
    (the same ``_force`` as bench.py).
Repeats each phase ``--repeats`` times after one warm-up and reports
medians, and writes ``explain("formatted")`` to --plans-dir/<name>.txt.

Usage:
    python tools/profile_query.py [--sf SF_DIR] [--repeats N]
        [--plans-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_streams_spark.engine import get_spark  # noqa: E402
from kafka_connect_streams_spark import queries as Q  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    # session warm-up (same as bench.py)
    _force(Q.QUERIES["filter"](spark, args.sf))

    out = {}
    for name in args.queries:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm-up of the full path
        _force(fn(spark, args.sf))
        builds, execs = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = {
            "build_s": round(statistics.median(builds), 3),
            "exec_s": round(statistics.median(execs), 3),
            "total_s": round(statistics.median(builds)
                             + statistics.median(execs), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
