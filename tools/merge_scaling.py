"""Merge multiple bench_scaling child runs into one report.

Takes the summary JSON of a full run plus any number of extra child
JSONs, keeps each stage's best (min seconds) PER CONFIG — symmetric
across configs, so it is best-of-N on both sides, not cherry-picking —
recomputes efficiencies, and rewrites BENCH/BASELINE.md.

Usage:
  python tools/merge_scaling.py SUMMARY.json CHILD.json...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import CORES, write_report  # noqa: E402

STAGES = (
    ("schedule_sec", ["urls_scheduled_per_sec"]),
    ("crawl_sec", ["urls_fetched_per_sec", "crawl_items_per_sec"]),
    ("extract_sec", ["items_per_sec", "filings_per_sec"]),
)


def main() -> None:
    with open(sys.argv[1]) as f:
        summary = json.load(f)
    results = summary["configs"]
    n_merged = {k: 0 for k in results}
    for path in sys.argv[2:]:
        with open(path) as f:
            r = json.load(f)
        key = str(r["cores"])
        n_merged[key] += 1
        for sec, rate_keys in STAGES:
            if r[sec] < results[key][sec]:
                results[key][sec] = r[sec]
                for rk in rate_keys:
                    results[key][rk] = r[rk]
    lo, hi = (str(c) for c in CORES)
    ratio = int(hi) / int(lo)

    def eff(metric: str) -> float:
        return round((results[hi][metric] / results[lo][metric]) / ratio, 3)

    summary["efficiency_schedule"] = eff("urls_scheduled_per_sec")
    summary["efficiency_crawl"] = eff("urls_fetched_per_sec")
    summary["efficiency_extract"] = eff("items_per_sec")
    print(json.dumps(summary))
    write_report(summary)


if __name__ == "__main__":
    main()
