"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at sf0.01,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their stringified form).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgar_crawler_spark.cachereg import release_caches  # noqa: E402
from edgar_crawler_spark.queries import QUERIES  # noqa: E402
from edgar_crawler_spark.session import get_spark  # noqa: E402
from edgar_crawler_spark.tables import TABLE_NAMES  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    lines = sorted("|".join(cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("oracle_check", cores=8)
    failures = []
    checked = 0
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            release_caches()  # pair-gen queries tracked-cache intermediates
        if q.oracle is None:
            print(f"skip  {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            h1 = normalize(s_rows, list(s_cols))
            h2 = normalize(d_rows, d_cols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                srt = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                drt = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sl = sorted(
                    "|".join(str(r[i]) for i in srt) for r in s_rows
                )
                dl = sorted(
                    "|".join(str(r[i]) for i in drt) for r in d_rows
                )
                for a, b in zip(sl, dl):
                    if a != b:
                        problems.append(f"  first diff: spark={a!r} duck={b!r}")
                        break
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name} ({len(s_rows)} rows)")

    # denominator = queries actually run (VERDICT r03 nit: a
    # name-filtered subset used to print len(QUERIES) and read as a
    # full sweep)
    print(f"\n{checked - len(failures)}/{checked} queries agree")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
