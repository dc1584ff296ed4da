"""edgar_crawler_spark — a PySpark-native EDGAR crawl/extract analytics engine.

A from-scratch re-expression of the capabilities of
haowenluo/edgar-crawler (reference at /root/reference, read-only) as
distributed DataFrame jobs:

- a crawl frontier + scheduler (URL-seen bloom filter + anti-join,
  per-host politeness token bucket, salted priority queue) over an
  Iceberg/parquet table of Common-Crawl-style web pages,
- the ExtractItems stage (10-K / 10-Q / 8-K ITEM section splitting)
  as vectorized pandas/Arrow UDFs,
- the reference's relational surface (filters, joins, aggregations,
  windows, set ops) as Catalyst-optimized DataFrame queries,
- large-scale training-data-pipeline operators (dedup, similarity
  search, text quality analysis) the reference lacks but a 100 TB
  corpus needs.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
