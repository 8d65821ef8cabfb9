"""Diff two bench artifacts per query: ratios, regressions, coverage.

Usage:
    python tools/compare_bench.py BENCH_r05.json BENCH_r06.json [--gate 2.0]

Accepts either a driver artifact ({"parsed": {...}}) or a raw bench.py
JSON line ({"queries": {...}}). Prints the common-set totals and per-query
ratios above the gate — the check every round's verdict performs by hand.
Exit code 1 if any common-set query exceeds the gate (ambient noise often
moves everything together: read the common-set TOTAL ratio first; a lone
query above the gate while the total sits near 1.0 is a real regression).

MODE BOUNDARY: BENCH_r01–r09 were measured with a ``count()`` force,
which lets Catalyst prune every column not feeding an aggregate —
map-only queries were timed WITHOUT their projections (bootstrap_ci 28×
under-reported). From r10 on, bench.py forces full evaluation through
the noop sink. The two modes are NOT comparable: this tool refuses any
comparison that crosses the r09/r10 boundary (exit 2) unless
``--force-cross-mode`` is passed, and then every ratio it prints is
mode-confounded — historical r≤9 totals are count-mode artifacts only.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"] or {}
    return doc.get("queries", {})


def bench_round(path: str) -> int | None:
    """Round number from a BENCH_r{N} filename, else None (raw lines)."""
    m = re.search(r"BENCH_r(\d+)", path)
    return int(m.group(1)) if m else None


def main(argv: list[str]) -> int:
    gate = 2.0
    force_cross = "--force-cross-mode" in argv
    if force_cross:
        argv = [a for a in argv if a != "--force-cross-mode"]
    if "--gate" in argv:
        i = argv.index("--gate")
        gate = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    rounds = [bench_round(p) for p in argv[:2]]
    modes = {"count" if r <= 9 else "noop" for r in rounds if r is not None}
    if len(modes) > 1 and not force_cross:
        print("REFUSED: comparing a count-mode artifact (r<=9) against a "
              "noop-mode one (r10+). count() let Catalyst prune unused "
              "columns, so r<=9 timings exclude work r10+ timings include "
              "(measured up to 28x on bootstrap_ci) — the ratio would be "
              "mode, not performance. Compare within one mode, or pass "
              "--force-cross-mode to override knowingly.")
        return 2
    old, new = load(argv[0]), load(argv[1])
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common set: {len(common)} queries  "
          f"old={t_old:.2f}s new={t_new:.2f}s "
          f"ratio={t_new / t_old:.2f}" if t_old else "no common queries")
    only_new = sorted(set(new) - set(old))
    if only_new:
        added = ", ".join(f"{q}={new[q]:.2f}s" for q in only_new)
        print(f"new-only ({len(only_new)}): {added}")
    dropped = sorted(set(old) - set(new))
    if dropped:
        print(f"dropped ({len(dropped)}): {', '.join(dropped)}")
    bad = [(q, old[q], new[q], new[q] / old[q])
           for q in common if old[q] > 0 and new[q] / old[q] > gate]
    for q, a, b, r in sorted(bad, key=lambda x: -x[3]):
        print(f"  REGRESSION {q}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
