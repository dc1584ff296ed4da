"""spark-submit entry point for the crawl pipeline.

Packaging + launch (the north rule's deployment shape):

    cd /root/repo && zip -r /tmp/edgar_crawler_spark.zip edgar_crawler_spark
    spark-submit --py-files /tmp/edgar_crawler_spark.zip \\
        jobs/crawl_job.py \\
        --frontier /data/frontier.parquet \\
        --store /data/crawl_store \\
        --n-buckets 256 --wave-size 4096 --host-budget 10 \\
        [--max-waves N] [--resume] [--extract-out /data/extracted]

On a cluster, master/executors come from spark-submit flags; the local
fallback (no master configured) mirrors the sandbox. The store is the
exact-resume checkpoint: re-running with --resume continues from the
last committed snapshot and never re-fetches a seen URL.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="EDGAR crawl frontier job")
    p.add_argument("--frontier", help="parquet of frontier rows "
                   "(url cik company form_type filing_date accession)")
    p.add_argument("--store", required=True, help="snapshot store root")
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--wave-size", type=int, default=4096)
    p.add_argument("--host-budget", type=float, default=10.0,
                   help="requests/sec to the (single) host, divided "
                   "across buckets")
    p.add_argument("--bloom-shards", type=int, default=1024)
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the last committed snapshot "
                   "(ignores --frontier)")
    p.add_argument("--extract-out", default=None,
                   help="if set, run ExtractItems over all crawled "
                   "pages and write results here")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("edgar-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from edgar_crawler_spark.frontier import CrawlJob, SnapshotStore

    store = SnapshotStore(args.store)
    job = CrawlJob(
        spark,
        store,
        n_buckets=args.n_buckets,
        wave_size=args.wave_size,
        host_budget_per_sec=args.host_budget,
        bloom_shards=args.bloom_shards,
    )
    frontier = None
    if not args.resume:
        if not args.frontier:
            p.error("--frontier required unless --resume")
        frontier = spark.read.parquet(args.frontier)
    result = job.run(frontier, max_waves=args.max_waves)

    summary = {
        "waves_run": result.waves_run,
        "n_fetched": result.n_fetched,
        "n_failed": result.n_failed,
        "snapshot_versions": result.versions,
    }
    if args.extract_out and result.n_fetched:
        from edgar_crawler_spark.operators.extract_job import extract_items_job

        extracted = extract_items_job(job.pages())
        extracted.write.mode("overwrite").parquet(args.extract_out)
        summary["extracted_rows"] = spark.read.parquet(args.extract_out).count()

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
