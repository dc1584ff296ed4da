"""EDGAR quarterly master-index source.

Reference semantics being re-expressed
(/root/reference/download_filings.py:226-461):
- the quarterly `master.idx` is pipe-delimited latin-1 with 11 header
  lines; the reference trims the header and synthesizes a 6th column
  `html_index` by rewriting the text link `.txt` -> `-index.html`
  (download_filings.py:296-307);
- on read it gets a FIXED 14-column all-string schema
  (download_filings.py:417-440) — the last 8 columns stay null until
  the crawl fills them;
- two link columns are prefixed `https://www.sec.gov/Archives/`
  (download_filings.py:443-448);
- filing-type and CIK filters run BEFORE any network work
  (download_filings.py:451-455) — manual predicate pushdown that
  Catalyst does for free once expressed declaratively;
- user seeds are CIKs-or-tickers: digits pass through, tickers resolve
  via the SEC ticker map (a broadcast dict at
  download_filings.py:394-411; a broadcast hash join here).

At scale the quarterly TSVs land in a `(year, quarter)`-partitioned
table so year/quarter range predicates become partition pruning
(the reference's loop bounds, download_filings.py:116-121).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# download_filings.py:423-439 — the 14 fixed columns, all strings
INDEX_COLUMNS = [
    "CIK",
    "Company",
    "Type",
    "Date",
    "complete_text_file_link",
    "html_index",
    "Filing Date",
    "Period of Report",
    "SIC",
    "htm_file_link",
    "State of Inc",
    "State location",
    "Fiscal Year End",
    "filename",
]

INDEX_SCHEMA = StructType([StructField(c, StringType()) for c in INDEX_COLUMNS])

# the 5 physical columns of a trimmed master.idx
_RAW_COLUMNS = INDEX_COLUMNS[:5]
_RAW_SCHEMA = StructType([StructField(c, StringType()) for c in _RAW_COLUMNS])

ARCHIVE_PREFIX = "https://www.sec.gov/Archives/"


def load_index(spark: SparkSession, path: str) -> DataFrame:
    """Read trimmed master-index TSV(s) -> the 14-column frame:
    html_index synthesized (.txt -> -index.html), links prefixed,
    trailing ledger columns null."""
    df = spark.read.csv(
        path, sep="|", schema=_RAW_SCHEMA, header=False, encoding="ISO-8859-1"
    )
    html_index = F.concat(
        F.lit(ARCHIVE_PREFIX),
        F.regexp_replace("complete_text_file_link", r"\.txt$", "-index.html"),
    )
    df = df.select(
        "CIK",
        "Company",
        "Type",
        "Date",
        F.concat(F.lit(ARCHIVE_PREFIX), F.col("complete_text_file_link")).alias(
            "complete_text_file_link"
        ),
        html_index.alias("html_index"),
    )
    for c in INDEX_COLUMNS[6:]:
        df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def select_filings(
    index: DataFrame,
    filing_types: list[str] | None = None,
    ciks: list[str] | DataFrame | None = None,
) -> DataFrame:
    """Type + CIK filters before any fetch (download_filings.py:451-455).
    `ciks` may be a python list (-> IN predicate, pushed to the scan)
    or a seed DataFrame with a `CIK` column (-> broadcast semi-join)."""
    df = index
    if filing_types:
        df = df.filter(F.col("Type").isin(filing_types))
    if ciks is not None:
        if isinstance(ciks, DataFrame):
            df = df.join(F.broadcast(ciks.select("CIK")), "CIK", "left_semi")
        else:
            df = df.filter(F.col("CIK").isin([str(c) for c in ciks]))
    return df


def resolve_seeds(
    spark: SparkSession, seeds: list[str], tickers: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """CIK-or-ticker seed resolution (download_filings.py:394-411).
    `tickers` is the SEC map (ticker string, cik string). Returns
    (resolved_seeds[CIK], misses[seed]) — the reference logs misses
    and drops them."""
    seed_df = spark.createDataFrame([(s,) for s in seeds], "seed string")
    is_cik = F.col("seed").rlike(r"^[0-9]+$")
    ciks = seed_df.filter(is_cik).select(F.col("seed").alias("CIK"))
    tick = (
        seed_df.filter(~is_cik)
        .withColumn("ticker", F.lower("seed"))
        .join(F.broadcast(tickers.withColumn("ticker", F.lower("ticker"))),
              "ticker", "left")
    )
    resolved = ciks.unionByName(
        tick.filter(F.col("cik").isNotNull()).select(F.col("cik").alias("CIK"))
    ).dropDuplicates(["CIK"])
    misses = tick.filter(F.col("cik").isNull()).select("seed")
    return resolved, misses


def write_synthetic_index(
    path: str, seed: int, n: int, year: int = 2020, quarter: int = 1
) -> list[dict]:
    """Deterministic trimmed master.idx TSV (test/bench input);
    returns the rows as dicts (the python oracle)."""
    rng = random.Random(seed * 10_000 + year * 10 + quarter)
    rows = []
    with open(path, "w", encoding="ISO-8859-1") as f:
        for i in range(n):
            cik = str(rng.randint(1000, 9999999))
            form = rng.choice(["8-K", "10-K", "10-Q", "4", "S-1"])
            day = rng.randint(1, 28)
            date = f"{year}-{quarter * 3 - 2:02d}-{day:02d}"
            acc = f"{rng.randint(10**9, 10**10 - 1):010d}-{year % 100:02d}-{rng.randint(0, 999999):06d}"
            link = f"edgar/data/{cik}/{acc}.txt"
            rows.append(
                {
                    "CIK": cik,
                    "Company": f"COMPANY {i} & CO",
                    "Type": form,
                    "Date": date,
                    "complete_text_file_link": ARCHIVE_PREFIX + link,
                    "html_index": ARCHIVE_PREFIX + link[:-4] + "-index.html",
                }
            )
            f.write(f"{cik}|COMPANY {i} & CO|{form}|{date}|{link}\n")
    return rows
