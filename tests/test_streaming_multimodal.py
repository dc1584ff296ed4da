"""Streaming jobs + multimodal plumbing tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.frontier import CrawlJob, SnapshotStore
from edgar_crawler_spark.frontier.fetch import SimulatedTransport
from edgar_crawler_spark.operators import multimodal as M
from edgar_crawler_spark.streaming import (
    stream_extract,
    stream_fetch_rate,
    stream_frontier_foreachbatch,
)
from edgar_crawler_spark.synth import pages_df
from edgar_crawler_spark.tables import load_table

SF = "/root/testdata/sf0.001"


class TestMultimodal:
    def test_decode_meta_batch_shape(self, spark):
        docs = load_table(spark, SF, "documents").limit(50)
        meta = M.decode_meta(M.documents_as_media(docs))
        rows = meta.collect()
        assert len(rows) == 50
        for r in rows:
            assert r.format in M.MEDIA_FORMATS
            assert 64 <= r.width <= 64 + 255 and 64 <= r.height <= 64 + 255
            assert 1 <= r.n_frames <= 16 and r.n_bytes > 0

    def test_frame_sample_udtf_shape(self, spark):
        docs = load_table(spark, SF, "documents").limit(30)
        frames = M.sample_frames(M.documents_as_media(docs), every=4)
        pdf = frames.toPandas()
        meta = M.decode_meta(M.documents_as_media(docs)).toPandas()
        want = meta.n_frames.apply(lambda n: len(range(0, n, 4))).sum()
        assert len(pdf) == want
        assert (pdf.frame_idx % 4 == 0).all()
        assert pdf.frame_hash.str.len().eq(32).all()

    def test_real_codec_is_marked_stub(self):
        with pytest.raises(NotImplementedError):
            M.real_codec(b"\xff\xd8\xff")


class TestStreamExtract:
    def test_incremental_exactly_once(self, spark, tmp_path):
        pages_dir = str(tmp_path / "pages")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        pages_df(spark, seed=11, n=40).write.mode("append").parquet(pages_dir)
        q = stream_extract(spark, pages_dir, out_dir, ckpt)
        q.awaitTermination(120)
        got1 = spark.read.parquet(out_dir)
        assert got1.count() == 40
        assert got1.filter(F.col("n_items") > 0).count() == 40

        # append a second batch of NEW pages; only the delta reruns
        pages_df(spark, seed=12, n=25).write.mode("append").parquet(pages_dir)
        q = stream_extract(spark, pages_dir, out_dir, ckpt)
        q.awaitTermination(120)
        got2 = spark.read.parquet(out_dir)
        assert got2.count() == 65  # 40 old (not reprocessed) + 25 new
        assert got2.select("url").distinct().count() == 65

    def test_windowed_fetch_rate_batch_parity(self, spark):
        # run the streaming aggregation logic on a static frame (the
        # streaming plan is identical; watermark is a no-op in batch)
        pages = pages_df(spark, seed=13, n=60).withColumn(
            "status", F.lit("ok")
        ).withColumn("fetched_bytes", F.length("html").cast("long"))
        agg = stream_fetch_rate(
            pages.select("warc_ts", "status", "fetched_bytes")
        )
        pdf = agg.toPandas()
        assert pdf.n_fetched.sum() == 60
        assert (pdf.n_failed == 0).all()
        assert pdf.sum_bytes.sum() > 0


class TestStreamFrontier:
    def test_foreachbatch_waves_exactly_once(self, spark, tmp_path):
        from tests.test_frontier import _frontier_df

        urls_dir = str(tmp_path / "urls")
        ckpt = str(tmp_path / "ckpt")
        store = SnapshotStore(str(tmp_path / "store"))
        job = CrawlJob(
            spark, store, n_buckets=4, wave_size=50,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )

        f1 = _frontier_df(spark, 60, seed=21)
        f1.write.mode("append").parquet(urls_dir)
        q = stream_frontier_foreachbatch(spark, urls_dir, ckpt, job)
        assert q.awaitTermination(180), "stream query did not terminate"
        assert job.pages().count() == 60

        # second discovery batch overlaps the first: only new urls fetch
        f2 = _frontier_df(spark, 90, seed=21)  # superset (same seed)
        f2.write.mode("append").parquet(urls_dir)
        q = stream_frontier_foreachbatch(spark, urls_dir, ckpt, job)
        assert q.awaitTermination(180), "stream query did not terminate"
        pages = job.pages()
        assert pages.count() == 90
        assert pages.select("url").distinct().count() == 90

        # third batch: NON-canonical (/ix?doc=/) variants of already
        # fetched urls — the merge path must canonicalize before the
        # seen filter, so nothing is fetched twice (ADVICE r01 medium).
        from pyspark.sql import functions as F
        f3 = f1.withColumn(
            "url",
            F.regexp_replace("url", r"sec\.gov/", "sec.gov/ix?doc=/"),
        )
        f3.write.mode("append").parquet(urls_dir)
        q = stream_frontier_foreachbatch(spark, urls_dir, ckpt, job)
        assert q.awaitTermination(180), "stream query did not terminate"
        pages = job.pages()
        assert pages.count() == 90
        assert pages.select("url").distinct().count() == 90


class TestStreamDedup:
    def test_watermark_bounded_exact_dedup(self, spark, tmp_path):
        """First occurrence of each content hash passes; duplicates
        within the watermark horizon are dropped — across micro-batch
        boundaries (state store), not just within one batch."""
        from edgar_crawler_spark.streaming import stream_dedup_docs

        src = str(tmp_path / "docs_src")
        out = str(tmp_path / "docs_out")
        ckpt = str(tmp_path / "docs_ckpt")
        schema = "doc_id long, text string, event_ts timestamp"
        from datetime import datetime

        def ts(s_):
            return datetime.fromisoformat(s_)

        # batch 1: A, B, dup(A); batch 2 (later file): dup(B), C
        spark.createDataFrame(
            [(1, "alpha text", ts("2024-01-01 00:00:00")),
             (2, "beta text", ts("2024-01-01 00:00:01")),
             (3, "alpha text", ts("2024-01-01 00:00:02"))],
            schema,
        ).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(4, "beta text", ts("2024-01-01 00:00:03")),
             (5, "gamma text", ts("2024-01-01 00:00:04"))],
            schema,
        ).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # forces >= 2 micro-batches
            .parquet(src)
        )
        q = (
            stream_dedup_docs(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        rows = spark.read.parquet(out).collect()
        kept_texts = sorted(r.text for r in rows)
        assert kept_texts == ["alpha text", "beta text", "gamma text"]
        # exactly one survivor per hash
        assert len({r.text_hash for r in rows}) == len(rows) == 3
