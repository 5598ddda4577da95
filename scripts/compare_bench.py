#!/usr/bin/env python
"""Compare two bench.py outputs (first JSON line each): per-query
deltas, ratio, and totals. Usage:
    python scripts/compare_bench.py A.json B.json [min_abs_delta]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.loads(fh.read().strip().split("\n")[0])


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    min_abs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    rows = [(qb[k] - qa[k], qb[k] / qa[k] if qa[k] else 0, k) for k in common]
    rows.sort(reverse=True)
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(
        f"common={len(common)}  A={ta:.1f}s  B={tb:.1f}s  "
        f"delta={tb - ta:+.1f}s  ratio={tb / ta:.3f}"
    )
    print(f"{'delta':>7} {'ratio':>6}  {'A':>6} {'B':>6}  query")
    for d, r, k in rows:
        if abs(d) >= min_abs:
            print(f"{d:7.2f} {r:6.2f}  {qa[k]:6.2f} {qb[k]:6.2f}  {k}")
    import statistics

    geo = statistics.geometric_mean(
        [qb[k] / qa[k] for k in common if qa[k] > 0 and qb[k] > 0]
    )
    print(f"geomean ratio B/A = {geo:.3f}")


if __name__ == "__main__":
    main()
