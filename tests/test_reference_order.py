"""Crawl-order parity vs the reference's control flow (SURVEY.md §4
custom mechanism 2; north rule: "matching the reference's crawl
ordering and URL-seen set under the same seed list").

The oracle reimplements /root/reference/download_filings.py:115-183
verbatim as single-process python: loop years ascending, quarters
ascending, read each quarter TSV in file order, apply the type and
CIK filters, concatenate — that sequence IS the reference visit
order. The Spark side goes through the real source (sources.load_index
per quarter, union, filters) and frontier.reference_order, and must
produce the identical URL sequence.
"""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from edgar_crawler_spark.frontier import reference_order
from edgar_crawler_spark.sources import load_index, select_filings, write_synthetic_index
from edgar_crawler_spark.sources.edgar_index import ARCHIVE_PREFIX


def _single_process_oracle(paths, filing_types, ciks):
    """download_filings.py:115-183 as plain python."""
    out = []
    for _, _, path in sorted(paths):  # year asc, quarter asc
        with open(path, encoding="ISO-8859-1") as f:
            for row in csv.reader(f, delimiter="|"):
                cik, _company, ftype, _date, link = row
                if ftype not in filing_types:
                    continue
                if ciks is not None and cik not in ciks:
                    continue
                out.append(ARCHIVE_PREFIX + link)
    return out


def test_reference_visit_order_parity(spark, tmp_path):
    filing_types = {"8-K", "10-K"}
    paths = []
    for year in (2019, 2020):
        for quarter in (1, 2, 3, 4):
            p = str(tmp_path / f"{year}_QTR{quarter}.tsv")
            write_synthetic_index(p, seed=13, n=120, year=year, quarter=quarter)
            paths.append((year, quarter, p))
    # seed list = half the CIKs appearing in 2019 QTR1
    with open(paths[0][2], encoding="ISO-8859-1") as f:
        all_ciks = [row.split("|")[0] for row in f.read().splitlines()]
    ciks = set(sorted(set(all_ciks))[::2])

    want = _single_process_oracle(paths, filing_types, ciks)
    # CIKs are per-quarter random, so the seed list (drawn from 2019
    # QTR1) keeps ~a quarter-file's worth of rows — enough for order
    assert len(want) > 20

    # Spark side: per-quarter scan with row_seq, union, filters, order
    parts = []
    for year, quarter, p in paths:
        idx = load_index(spark, p)
        # row_seq = ordinal inside the quarter TSV: the accession link
        # is unique and the synthetic generator emits rows in link
        # order only per-file, so recover the ordinal by joining the
        # file's own line order (monotonically_increasing_id on a
        # single-file narrow scan preserves line order per partition;
        # the file is one partition here)
        idx = idx.withColumn("row_seq", F.monotonically_increasing_id())
        parts.append(
            idx.withColumn("year", F.lit(year)).withColumn("quarter", F.lit(quarter))
        )
    union = parts[0]
    for p2 in parts[1:]:
        union = union.unionByName(p2)
    filtered = select_filings(union, filing_types=sorted(filing_types), ciks=sorted(ciks))
    ordered = reference_order(filtered)
    got = [
        r.complete_text_file_link
        for r in ordered.orderBy("visit_seq").select("complete_text_file_link").collect()
    ]
    assert got == want

    # and the type-only (no seed list) variant over the full corpus
    want_all = _single_process_oracle(paths, filing_types, None)
    assert len(want_all) > 300
    got_all = [
        r.complete_text_file_link
        for r in reference_order(select_filings(union, filing_types=sorted(filing_types)))
        .orderBy("visit_seq")
        .select("complete_text_file_link")
        .collect()
    ]
    assert got_all == want_all
