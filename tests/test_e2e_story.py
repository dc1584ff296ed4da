"""The full user story in one test: seed list → crawl (politeness +
URL-seen + snapshots) → byte-exact extraction → training corpus
(dedup → quality → split → packing).

Each stage is tested in depth elsewhere; this pins that they COMPOSE —
the \"switch from the reference\" path a user actually runs, with the
data flowing between stages as DataFrames (never through the driver).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from edgar_crawler_spark.frontier import CrawlJob, SnapshotStore
from edgar_crawler_spark.frontier.fetch import SimulatedTransport
from edgar_crawler_spark.operators.extract_job import extract_items_job
from jobs.corpus_pipeline import build_corpus
from tests.test_frontier import _frontier_df


class TestEndToEndStory:
    def test_crawl_extract_corpus(self, spark, tmp_path):
        n = 80
        job = CrawlJob(
            spark,
            SnapshotStore(str(tmp_path / "e2e")),
            n_buckets=4,
            wave_size=20,
            transport_factory=lambda: SimulatedTransport(transient_pct=10),
        )
        res = job.run(_frontier_df(spark, n))
        assert res.n_fetched == n

        # crawl output -> extraction input (CC-style page rows)
        pages = job.pages().filter(F.col("status") == "ok")
        extracted = extract_items_job(pages)
        ex = extracted.cache()
        assert ex.count() == n
        assert ex.filter(F.col("n_items") > 0).count() == n

        # extraction output -> corpus assembly input: flatten items to
        # one text document per filing
        docs = ex.select(
            F.abs(F.hash("url")).alias("doc_id"),
            F.concat_ws(
                "\n", F.map_values("items")
            ).alias("text"),
            F.lit("en").alias("lang"),
        ).filter(F.length("text") > 0)
        n_docs = docs.count()
        assert n_docs > 0

        corpus = build_corpus(
            spark, docs, min_tokens=1, max_dup_ratio=1.0,
            jaccard_threshold=0.95, contam_ngram=5, pack_budget=512,
        )
        rows = corpus.collect()
        assert 0 < len(rows) <= n_docs
        # every stage's columns present at the end of the line
        assert {"doc_id", "text", "lang", "split",
                "n_tokens", "bin", "bin_offset"} <= set(corpus.columns)
        assert {r.split for r in rows} <= {"train", "validation", "test"}
        # packing addresses are in-range
        assert all(0 <= r.bin_offset < 512 for r in rows)
        ex.unpersist()
