"""Consolidate stage + stateful streaming URL-seen tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from edgar_crawler_spark.operators.consolidate import (
    consolidate,
    summary_stats,
    write_analysis_csv,
)
from edgar_crawler_spark.operators.extract_job import extract_items_job
from edgar_crawler_spark.streaming.stateful import run_url_seen_stream
from edgar_crawler_spark.synth import pages_df


class TestConsolidate:
    def test_consolidate_matches_payload(self, spark, tmp_path):
        pages = pages_df(spark, seed=17, n=30)
        extracted = extract_items_job(pages).cache()
        items = ["item_2.02", "item_9.01", "item_7"]
        cons = consolidate(extracted, items).cache()
        assert cons.count() == 30
        # lengths agree with the byte-identical JSON payload
        for r in cons.join(extracted.select("url", "payload_json"), "url").collect():
            payload = json.loads(r.payload_json)
            for it in items:
                want = payload.get(it) or ""
                assert r[it] == want
                assert r[f"{it}_length"] == len(want)
            assert r.filing_year == int(r.filing_date[:4])

        stats = {r.item: r for r in summary_stats(cons, items).collect()}
        for it in items:
            n_nonempty = cons.filter(F.col(f"`{it}_length`") > 0).count()
            assert stats[it].n_nonempty == n_nonempty
            assert abs(stats[it].coverage_pct - n_nonempty * 100.0 / 30) < 0.01

        out = str(tmp_path / "analysis_csv")
        write_analysis_csv(cons.drop(*items), out)
        back = spark.read.option("header", True).csv(out)
        assert back.count() == 30


class TestStatefulUrlSeen:
    def test_exactly_once_across_batches_and_restarts(self, spark, tmp_path):
        urls_dir = str(tmp_path / "urls")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        batch1 = [(f"https://sec.gov/a/{i}.txt",) for i in range(100)]
        spark.createDataFrame(batch1, "url string").write.mode("append").parquet(urls_dir)
        q = run_url_seen_stream(spark, urls_dir, out_dir, ckpt)
        q.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == 100

        # second delivery: 60 duplicates + 40 new, duplicates also WITHIN
        # the batch — restarted query must emit exactly the 40 new
        batch2 = [(f"https://sec.gov/a/{i}.txt",) for i in range(40, 140)] + [
            (f"https://sec.gov/a/{i}.txt",) for i in range(100, 140)
        ]
        spark.createDataFrame(batch2, "url string").write.mode("append").parquet(urls_dir)
        q = run_url_seen_stream(spark, urls_dir, out_dir, ckpt)
        q.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        assert out.count() == 140
        assert out.select("url").distinct().count() == 140
