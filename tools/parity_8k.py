"""8-K extraction parity harness.

Runs the pure extraction library over the reference's 553 raw 8-K
fixtures and compares per-item strings byte-for-byte against the
golden JSONs (same comparison as the reference's pytest:
/root/reference/tests/test_extract_items.py:203-324 — missing
expected keys default to "").

Usage:
  python tools/parity_8k.py [--limit N] [--diff FILENAME]
"""

from __future__ import annotations

import csv
import json
import os
import sys
import zipfile
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgar_crawler_spark.extraction import ExtractionOptions, extract_filing
from edgar_crawler_spark.extraction.items import ITEMS_8K, ITEMS_8K_OBSOLETE

FIX = "/root/reference/tests/fixtures"
WORK = "/tmp/ecs_fixtures"


def ensure_unzipped() -> None:
    os.makedirs(WORK, exist_ok=True)
    for zp in (
        f"{FIX}/RAW_FILINGS/8-K.zip",
        f"{FIX}/EXTRACTED_FILINGS/8-K.zip",
    ):
        with zipfile.ZipFile(zp) as z:
            z.extractall(WORK)


def load_metadata() -> list[dict]:
    with open(f"{FIX}/FILINGS_METADATA_TEST.csv", newline="") as f:
        rows = [r for r in csv.DictReader(f) if r["Type"] == "8-K"]
    for r in rows:
        for k, v in r.items():
            if v == "":
                r[k] = None
    return rows


def main() -> int:
    limit = None
    diff_target = None
    args = sys.argv[1:]
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])
    if "--diff" in args:
        diff_target = args[args.index("--diff") + 1]

    ensure_unzipped()
    rows = load_metadata()
    if limit:
        rows = rows[:limit]

    opts = ExtractionOptions(remove_tables=True, include_signature=False)

    n_filings = n_perfect = 0
    item_total = item_ok = 0
    fail_items: Counter = Counter()
    failed_files: list[tuple[str, list[str]]] = []

    for md in rows:
        fname = md["filename"]
        raw_path = os.path.join(WORK, "8-K", fname)
        gold_path = os.path.join(WORK, "8-K", fname.rsplit(".", 1)[0] + ".json")
        if not (os.path.exists(raw_path) and os.path.exists(gold_path)):
            continue
        with open(raw_path, "rb") as f:
            raw = f.read()
        with open(gold_path) as f:
            gold = json.load(f)

        date = md["Date"]
        items = ITEMS_8K if (date and date > "2004-08-23") else ITEMS_8K_OBSOLETE
        wanted = [i for i in items if i != "SIGNATURE"]
        opts.items_to_extract = wanted

        try:
            got = extract_filing(raw, md, opts)
        except Exception as e:  # noqa: BLE001
            got = {"__error__": repr(e)}

        n_filings += 1
        bad = []
        for item in wanted:
            key = f"item_{item}"
            exp = gold.get(key, "")
            act = (got or {}).get(key, "") or ""
            item_total += 1
            if act == exp:
                item_ok += 1
            else:
                bad.append(key)
                fail_items[key] += 1
        if not bad:
            n_perfect += 1
        else:
            failed_files.append((fname, bad))
            if diff_target and fname == diff_target:
                for key in bad:
                    exp = gold.get(key, "")
                    act = (got or {}).get(key, "") or ""
                    print(f"--- {key} expected ({len(exp)} ch) ---")
                    print(repr(exp[:800]))
                    print(f"--- {key} actual ({len(act)} ch) ---")
                    print(repr(act[:800]))
                    # first divergence offset
                    for i, (a, b) in enumerate(zip(exp, act)):
                        if a != b:
                            print(f"first diff at {i}: exp={exp[i-40:i+40]!r} act={act[i-40:i+40]!r}")
                            break

    print(f"\nfilings: {n_filings}  perfect: {n_perfect} "
          f"({100.0*n_perfect/max(n_filings,1):.1f}%)")
    print(f"items:   {item_total}  matched: {item_ok} "
          f"({100.0*item_ok/max(item_total,1):.2f}%)")
    if fail_items:
        print("worst items:", fail_items.most_common(8))
    if failed_files and not diff_target:
        print("sample failures:")
        for fname, bad in failed_files[:10]:
            print(f"  {fname}: {bad}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
