"""Compare two bench.py JSON results and flag per-query regressions.

Usage:
    python bench.py 2>/dev/null > /tmp/bench_now.json
    python tools/bench_compare.py BENCH_r01.json /tmp/bench_now.json

Accepts either a raw bench.py line ({"metric": ..., "queries": {...}})
or a driver BENCH_r{N}.json wrapper ({"parsed": {...}}). Queries only
present on one side are listed but not flagged. Exit code 1 iff any
shared query slowed past the threshold (default 1.5x, override with
BENCH_REGRESSION_RATIO) — single-box timings jitter, so the threshold
is deliberately loose; investigate plan changes before blaming noise.
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as f:
        obj = json.load(f)
    if "parsed" in obj:
        obj = obj["parsed"] or {}
    if "queries" not in obj and "detail" in obj:
        # round-5+ compact stdout line: full maps live in the detail
        # file (path relative to the repo root / bench.py's dir)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for cand in (obj["detail"], os.path.join(root, obj["detail"])):
            if os.path.exists(cand):
                with open(cand) as f:
                    return json.load(f)
        if "slowest" in obj:
            print(f"note: {path}: detail file missing, comparing the "
                  f"{len(obj['slowest'])} slowest keys only")
            return {**obj, "queries": obj["slowest"]}
    if "queries" not in obj:
        raise SystemExit(f"{path}: no 'queries' key")
    return obj


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    base, now = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(os.environ.get("BENCH_REGRESSION_RATIO", "1.5"))
    bq, nq = base["queries"], now["queries"]
    shared = sorted(set(bq) & set(nq))
    regressions = []
    print(f"{'query':28s} {'base':>8s} {'now':>8s} {'ratio':>7s}")
    for q in shared:
        r = nq[q] / bq[q] if bq[q] else float("inf")
        mark = " <-- REGRESSION" if r > thresh else ""
        if r > thresh:
            regressions.append(q)
        print(f"{q:28s} {bq[q]:8.3f} {nq[q]:8.3f} {r:7.2f}{mark}")
    for q in sorted(set(nq) - set(bq)):
        print(f"{q:28s} {'—':>8s} {nq[q]:8.3f}   (new)")
    for q in sorted(set(bq) - set(nq)):
        print(f"{q:28s} {bq[q]:8.3f} {'—':>8s}   (removed)")
    tot_b = sum(bq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    print(f"\nshared-query total: {tot_b:.2f}s -> {tot_n:.2f}s "
          f"(x{tot_n / tot_b:.2f}); threshold x{thresh}")
    if regressions:
        print(f"REGRESSED: {', '.join(regressions)}")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
