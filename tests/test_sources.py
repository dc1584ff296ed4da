"""EDGAR index source tests (SURVEY.md §2.1 scan surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgar_crawler_spark.sources import (
    INDEX_COLUMNS,
    load_index,
    resolve_seeds,
    select_filings,
    write_synthetic_index,
)


def test_load_index_schema_and_links(spark, tmp_path):
    path = str(tmp_path / "2020_QTR1.tsv")
    oracle = write_synthetic_index(path, seed=5, n=200)
    df = load_index(spark, path)
    assert df.columns == INDEX_COLUMNS
    rows = {r["CIK"]: r for r in df.collect()}
    assert len(rows) == len({o["CIK"] for o in oracle})
    for o in oracle:
        r = rows[o["CIK"]]
        assert r["complete_text_file_link"] == o["complete_text_file_link"]
        assert r["html_index"] == o["html_index"]
        assert r["html_index"].endswith("-index.html")
        # trailing ledger columns are null until the crawl fills them
        assert r["SIC"] is None and r["filename"] is None


def test_select_filings_filters(spark, tmp_path):
    path = str(tmp_path / "idx.tsv")
    oracle = write_synthetic_index(path, seed=7, n=300)
    df = load_index(spark, path)
    want_types = {"8-K", "10-K"}
    got = select_filings(df, filing_types=sorted(want_types)).collect()
    want = [o for o in oracle if o["Type"] in want_types]
    assert len(got) == len(want)
    ciks = sorted({o["CIK"] for o in oracle if o["Type"] == "8-K"})[:5]
    got2 = select_filings(df, filing_types=["8-K"], ciks=ciks).collect()
    want2 = [o for o in oracle if o["Type"] == "8-K" and o["CIK"] in set(ciks)]
    assert {r["CIK"] for r in got2} == {o["CIK"] for o in want2}
    # seed-DataFrame variant (broadcast semi-join path)
    seed_df = spark.createDataFrame([(c,) for c in ciks], "CIK string")
    got3 = select_filings(df, filing_types=["8-K"], ciks=seed_df).collect()
    assert {r["CIK"] for r in got3} == {o["CIK"] for o in want2}


def test_resolve_seeds(spark):
    tickers = spark.createDataFrame(
        [("AAPL", "320193"), ("MSFT", "789019"), ("TSN", "100493")],
        "ticker string, cik string",
    )
    resolved, misses = resolve_seeds(
        spark, ["320193", "msft", "TSN", "NOPE", "99999"], tickers
    )
    got = sorted(r["CIK"] for r in resolved.collect())
    assert got == ["100493", "320193", "789019", "99999"]
    assert [r["seed"] for r in misses.collect()] == ["NOPE"]
