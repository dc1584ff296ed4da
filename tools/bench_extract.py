"""Extraction throughput on the REAL 553-file 8-K golden corpus.

bench.py calls `bench_extract(spark)` and reports filings/sec as the
`extract_8k` entry of its JSON line. This is the honest comparison
point against the reference's published ~1.5-2.3 filings/s single-core
rate (/root/reference/extract_items.py:1569 ProcessPool(processes=1);
BASELINE.md) — same bodies, byte-identical output (tools/parity_8k.py).
"""

from __future__ import annotations

import csv
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from edgar_crawler_spark.operators.extract_job import extract_items_job  # noqa: E402

FIX = "/root/reference/tests/fixtures"
WORK = "/tmp/ecs_bench_8k"


def _pages_rows() -> list[tuple]:
    os.makedirs(WORK, exist_ok=True)
    with zipfile.ZipFile(f"{FIX}/RAW_FILINGS/8-K.zip") as z:
        z.extractall(WORK)
    with open(f"{FIX}/FILINGS_METADATA_TEST.csv", newline="") as f:
        meta = {r["filename"]: r for r in csv.DictReader(f) if r["Type"] == "8-K"}
    rows = []
    root = os.path.join(WORK, "8-K")
    for fn in sorted(os.listdir(root)):
        m = meta.get(fn)
        if m is None:
            continue
        with open(os.path.join(root, fn), "rb") as fh:
            body = fh.read()
        rows.append(
            (
                f"file://{fn}",
                body,
                m["CIK"],
                m["Company"],
                m["Type"],
                m["Date"],
                fn,
            )
        )
    return rows


def bench_extract(spark) -> float:
    """Returns elapsed seconds; also prints filings/s to stderr."""
    rows = _pages_rows()
    df = spark.createDataFrame(
        rows,
        "url string, html binary, cik string, company string, "
        "form_type string, filing_date string, filename string",
    ).repartition(int(spark.sparkContext.defaultParallelism))
    df.cache().count()
    # untimed warm pass over one small batch per core: spawns + warms
    # the python workers and the Arrow path so the timed run measures
    # extraction, not interpreter/worker startup (the other bench
    # queries are JVM-only, so workers are cold right before this).
    warm = df.sample(fraction=0.12, seed=1)  # sample keeps ALL
    # partitions populated (limit would collapse to one worker)
    extract_items_job(warm).agg(F.count(F.lit(1))).collect()
    t0 = time.perf_counter()
    n = (
        extract_items_job(df)
        .agg(F.count(F.lit(1)), F.sum("n_items"))
        .collect()
    )
    dt = time.perf_counter() - t0
    df.unpersist()
    print(
        f"extract_8k: {n[0][0]} real filings in {dt:.2f}s = "
        f"{n[0][0] / dt:.1f} filings/s ({n[0][1]} items)",
        file=sys.stderr,
    )
    return dt


if __name__ == "__main__":
    from edgar_crawler_spark.session import get_spark

    bench_extract(get_spark("bench-extract"))
