"""Bucketed-table layout: shuffle-free co-located joins.

At 100 TB the frontier's fact tables (pages, seen, per-doc stats) are
joined on the same key (url / doc_id) every wave. Hash-bucketing those
tables ON the join key at write time pins each key range to a fixed
file bucket, so every later join/aggregation on that key satisfies its
distribution requirement straight from the scan — zero Exchange, the
single biggest shuffle saving available to a recurring pipeline
(Spark's `bucketBy`, the same layout contract as Hive/Iceberg bucket
transforms; cf. the reference re-reading its whole ledger CSV per run,
/root/reference/download_filings.py:196-215).

The bucket count is chosen once per table for the TARGET scale (e.g.
4096 buckets ≈ 25 GB/bucket at 100 TB) — both sides of a co-located
join must agree on it; a mismatched side falls back to one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally per-bucket sorted)
    managed parquet table. Sorting by the join key additionally lets
    SortMergeJoin skip its per-task sort."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key + count — the plan
    must contain no Exchange (asserted in tests/test_bucketing.py)."""
    return spark.table(left).join(spark.table(right), on, how)
