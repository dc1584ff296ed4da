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


class TestStreamSessionize:
    def test_session_windows_emit_on_watermark(self, spark, tmp_path):
        """Per-user session windows (30s gap) aggregate across
        micro-batches and emit exactly once after the watermark
        passes the session close."""
        from datetime import datetime

        from edgar_crawler_spark.streaming import stream_sessionize

        src = str(tmp_path / "ev_src")
        out = str(tmp_path / "ev_out")
        ckpt = str(tmp_path / "ev_ckpt")
        schema = "user_id long, ts timestamp, event_type string"

        def ts(s_):
            return datetime.fromisoformat(s_)

        # user 1: two sessions (gap > 30s between them); user 2: one.
        # batch file 1 = early events, batch file 2 = the tail of user
        # 1's second session + a far-future sentinel that advances the
        # watermark past every real session's close.
        # coalesce(1): ONE part file per write — with
        # maxFilesPerTrigger=1 each PART is a micro-batch, and parts
        # of a single write otherwise share an mtime tick, letting the
        # sentinel's part process before its siblings and late-drop
        # them via the advanced watermark
        spark.createDataFrame(
            [(1, ts("2024-01-01 00:00:00"), "view"),
             (1, ts("2024-01-01 00:00:10"), "click"),
             (2, ts("2024-01-01 00:00:05"), "view"),
             (1, ts("2024-01-01 00:02:00"), "view")],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        # the file source orders batches by modification time; two
        # files written within the same mtime tick can process in
        # either order, and if the sentinel batch ran FIRST the
        # watermark would late-drop the real events — force distinct
        # mtimes so batch order (and thus the watermark walk) is
        # deterministic
        import time as _time

        _time.sleep(2)
        spark.createDataFrame(
            [(1, ts("2024-01-01 00:02:20"), "purchase"),
             (99, ts("2024-01-01 02:00:00"), "sentinel")],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # >= 2 micro-batches
            .parquet(src)
        )
        q = (
            stream_sessionize(stream, gap="30 seconds", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        rows = spark.read.parquet(out).collect()
        # user 1 session A: 2 events (00:00:00-00:00:10); session B: 2
        # events (00:02:00-00:02:20, MERGED across the two batch
        # files); user 2: 1 event. Sentinel session not yet emitted.
        emitted = sorted(
            (r.user_id, r.session_start.strftime("%H:%M:%S"), r.n_events)
            for r in rows
        )
        assert emitted == [
            (1, "00:00:00", 2),
            (1, "00:02:00", 2),
            (2, "00:00:05", 1),
        ]
        # session B absorbed the second batch file's event: it must
        # close 30s after ITS last event, not after the first file's
        b = [r for r in rows if r.user_id == 1 and r.n_events == 2
             and r.session_start.strftime("%H:%M:%S") == "00:02:00"]
        assert b[0].session_end.strftime("%H:%M:%S") == "00:02:50"


class TestSnapshotDiff:
    def test_changelog_between_versions(self, spark, tmp_path):
        from edgar_crawler_spark.frontier.state import SnapshotStore, snapshot_diff

        store = SnapshotStore(str(tmp_path / "snap"))
        v1 = store.commit({
            "t": spark.createDataFrame(
                [("a", 1), ("b", 2), ("c", 3)], "k string, val int")
        })
        v2 = store.commit({
            "t": spark.createDataFrame(
                [("a", 1), ("b", 99), ("d", 4)], "k string, val int")
        })
        diff = snapshot_diff(spark, store, "t", v1, v2, ["k"])
        got = {(r.k, r._change) for r in diff.collect()}
        assert got == {("b", "update"), ("c", "delete"), ("d", "insert")}

    def test_changelog_keys_only_no_payload_shuffle(self, spark, tmp_path):
        """The diff plan shuffles (key, fingerprint) — the payload
        column must not appear in any exchange."""
        import io
        from contextlib import redirect_stdout

        from edgar_crawler_spark.frontier.state import SnapshotStore, snapshot_diff

        store = SnapshotStore(str(tmp_path / "snap2"))
        v1 = store.commit({
            "t": spark.createDataFrame(
                [(f"u{i}", "x" * 50, i) for i in range(200)],
                "url string, payload string, n int")
        })
        v2 = store.commit({
            "t": spark.createDataFrame(
                [(f"u{i}", "x" * 50, i + (i % 7 == 0)) for i in range(150)],
                "url string, payload string, n int")
        })
        diff = snapshot_diff(spark, store, "t", v1, v2, ["url"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            diff.explain("formatted")
        plan = buf.getvalue()
        import re
        for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
            assert "payload" not in m.group(1)
        # semantics: 50 deletes (u150..199) + updates where n changed
        got = {r._change for r in diff.collect()}
        assert got == {"delete", "update"}
        assert diff.filter("_change = 'delete'").count() == 50
        n_upd = sum(1 for i in range(150) if i % 7 == 0)
        assert diff.filter("_change = 'update'").count() == n_upd


class TestStreamAttribution:
    def test_interval_join_across_batches(self, spark, tmp_path):
        """Purchases match views of the same user within the 30s
        horizon — including a view and purchase arriving in DIFFERENT
        micro-batches (the state-store path)."""
        from datetime import datetime

        from edgar_crawler_spark.streaming import stream_attribution

        vdir = str(tmp_path / "views")
        pdir = str(tmp_path / "purch")
        out = str(tmp_path / "attr_out")
        ckpt = str(tmp_path / "attr_ckpt")
        schema = "event_id long, user_id long, ts timestamp"

        def ts(s_):
            return datetime.fromisoformat(s_)

        # views batch 1
        spark.createDataFrame(
            [(10, 1, ts("2024-01-01 00:00:00")),   # in horizon of p100
             (11, 1, ts("2024-01-01 00:05:00")),   # own session, no purchase
             (12, 2, ts("2024-01-01 00:00:05"))],  # user 2
            schema,
        ).write.mode("append").parquet(vdir)
        # purchases arrive in a separate stream; p100 is 20s after view
        # 10 (match), p101 is 45s after view 12 (outside horizon),
        # p102 matches nothing (user 3)
        spark.createDataFrame(
            [(100, 1, ts("2024-01-01 00:00:20")),
             (101, 2, ts("2024-01-01 00:00:50")),
             (102, 3, ts("2024-01-01 00:00:10"))],
            schema,
        ).write.mode("append").parquet(pdir)
        # batch-2 files: a second view+purchase pair for user 2 that
        # must join across batch boundaries, plus watermark movers
        spark.createDataFrame(
            [(13, 2, ts("2024-01-01 00:01:00")),
             (14, 9, ts("2024-01-01 01:00:00"))],  # watermark mover
            schema,
        ).write.mode("append").parquet(vdir)
        spark.createDataFrame(
            [(103, 2, ts("2024-01-01 00:01:10")),
             (104, 9, ts("2024-01-01 01:00:01"))],
            schema,
        ).write.mode("append").parquet(pdir)

        views = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(vdir)
        )
        purchases = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(pdir)
        )
        # watermark wider than the sentinel gap (1h): the two file
        # streams' micro-batches interleave nondeterministically, and
        # a purchases batch carrying the 01:00 sentinel can process
        # BEFORE the views stream's second file — a tight watermark
        # would then late-drop view 13 (a test artifact, not operator
        # behavior; production watermarks bound genuine lateness)
        q = (
            stream_attribution(views, purchases, horizon="30 seconds",
                               watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        got = {(r.purchase_id, r.view_id)
               for r in spark.read.parquet(out).collect()}
        assert got == {(100, 10), (103, 13), (104, 14)}


class TestSentenceUdtf:
    def test_lateral_fanout_matches_python(self, spark):
        import re

        from edgar_crawler_spark.operators.multimodal import make_sentence_udtf

        spark.udtf.register("split_sentences", make_sentence_udtf())
        df = spark.createDataFrame(
            [(0, "One. Two two! Three?  Four"),
             (1, "no terminators here"),
             (2, None)],
            "doc_id long, text string",
        )
        df.createOrReplaceTempView("udtf_docs")
        rows = spark.sql(
            "SELECT doc_id, s.* FROM udtf_docs, "
            "LATERAL split_sentences(text) AS s"
        ).collect()
        got = {(r.doc_id, r.sent_idx): (r.sentence, r.n_chars) for r in rows}
        want = {}
        for did, text in [(0, "One. Two two! Three?  Four"),
                          (1, "no terminators here")]:
            parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text)
                     if p.strip()]
            for i, p in enumerate(parts):
                want[(did, i)] = (p, len(p))
        assert got == want
        assert not any(r.doc_id == 2 for r in rows)  # null row -> no fanout


class TestStreamCorpusIngest:
    def test_incremental_exactly_once_and_replay_idempotent(self, spark, tmp_path):
        from edgar_crawler_spark.frontier.state import SnapshotStore
        from edgar_crawler_spark.streaming.ingest import (
            ingest_batch, read_corpus, stream_corpus_ingest,
        )

        src = str(tmp_path / "raw")
        ckpt = str(tmp_path / "ing_ckpt")
        store = SnapshotStore(str(tmp_path / "ing_store"))
        schema = "doc_id long, text string, lang string"

        # file 1: 3 docs, one in-batch duplicate pair (1, 3)
        spark.createDataFrame(
            [(1, "alpha body", "en"), (2, "beta body", "en"),
             (3, "alpha body", "en")],
            schema,
        ).write.mode("append").parquet(src)
        q = stream_corpus_ingest(spark, src, store, ckpt, schema=schema)
        assert q.awaitTermination(120), "ingest did not terminate"
        c1 = read_corpus(spark, store)
        assert c1.count() == 2
        assert {r.doc_id for r in c1.collect()} == {1, 2}

        # file 2: cross-batch dup of doc 2's content + one new doc
        spark.createDataFrame(
            [(4, "beta body", "en"), (5, "gamma body", "en")],
            schema,
        ).write.mode("append").parquet(src)
        q = stream_corpus_ingest(spark, src, store, ckpt, schema=schema)
        assert q.awaitTermination(120), "ingest did not terminate"
        corpus = read_corpus(spark, store)
        assert {r.doc_id for r in corpus.collect()} == {1, 2, 5}
        # split column present + consistent
        import hashlib

        for r in corpus.collect():
            pct = int(hashlib.md5(f"split|{r.doc_id}".encode())
                      .hexdigest()[:8], 16) % 100
            want = ("train" if pct < 90
                    else "validation" if pct < 95 else "test")
            assert r.split == want

        # replay idempotency: re-processing an already-committed batch
        # (the crash-between-commit-and-checkpoint window) appends 0
        replayed = spark.createDataFrame(
            [(4, "beta body", "en"), (5, "gamma body", "en")],
            schema,
        )
        n = ingest_batch(spark, store, replayed)
        assert n == 0
        assert read_corpus(spark, store).count() == 3


class TestStreamHll:
    def test_streaming_registers_bit_identical_to_batch(self, spark, tmp_path):
        """Per-window streaming HLL registers must equal the batch
        sketch run over that window's rows — same md5/bucket/rho
        contract, max-merged across micro-batches — and the window
        estimates must land within HLL error of the exact counts."""
        import random
        import time as _time
        from datetime import datetime

        from edgar_crawler_spark.operators import sketch as SK
        from edgar_crawler_spark.streaming import stream_hll_registers

        src = str(tmp_path / "hll_src")
        out = str(tmp_path / "hll_out")
        ckpt = str(tmp_path / "hll_ckpt")
        schema = "doc_id long, text string, event_ts timestamp"

        def ts(s_):
            return datetime.fromisoformat(s_)

        rng = random.Random(73)

        def mk_text(n, vocab):
            return " ".join(f"tok{rng.randrange(vocab)}" for _ in range(n))

        # window A (00:00) rows split across two files/micro-batches —
        # the cross-batch max-merge is what's under test; window B at
        # 00:01; a far sentinel advances the watermark past both.
        rows_a1 = [(i, mk_text(40, 300), ts("2024-01-01 00:00:05"))
                   for i in range(8)]
        rows_a2 = [(i + 8, mk_text(40, 300), ts("2024-01-01 00:00:40"))
                   for i in range(8)]
        rows_b = [(i + 16, mk_text(25, 80), ts("2024-01-01 00:01:30"))
                  for i in range(6)]
        spark.createDataFrame(rows_a1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(2)  # distinct mtimes => deterministic batch order
        spark.createDataFrame(
            rows_a2 + rows_b, schema
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(2)
        spark.createDataFrame(
            [(99, "sentinel", ts("2024-01-01 01:00:00"))], schema
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_hll_registers(
                stream, window="1 minute", watermark="1 minute"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        got = spark.read.parquet(out)
        from pyspark.sql import functions as F

        wins = {
            r.win_start.isoformat(): {
                (x.bucket, x.reg)
                for x in got.filter(F.col("win_start") == r.win_start).collect()
            }
            for r in got.select("win_start").distinct().collect()
        }
        assert set(wins) == {"2024-01-01T00:00:00", "2024-01-01T00:01:00"}

        for key, rows in (
            ("2024-01-01T00:00:00", rows_a1 + rows_a2),
            ("2024-01-01T00:01:00", rows_b),
        ):
            batch = spark.createDataFrame(rows, schema).select(
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda x: x != "",
                    )
                ).alias("t")
            )
            expected = {
                (r.bucket, r.reg)
                for r in SK.hll_registers(batch, "t").collect()
            }
            assert wins[key] == expected, key
            exact = batch.distinct().count()
            est = SK.hll_estimate_cols(
                spark.createDataFrame(
                    [(b, g) for b, g in wins[key]], "bucket long, reg long"
                )
            ).collect()[0].est
            assert abs(est - exact) / exact < 0.15, (key, est, exact)


class TestStreamCms:
    def test_windowed_counters_match_batch_sketch(self, spark, tmp_path):
        """Per-window streaming CMS counters must equal the batch
        sketch over that window's rows — counts SUM across
        micro-batches (the CMS merge law), state stays sketch-sized,
        and every probe estimate is >= the window's true count."""
        import random
        import time as _time
        from datetime import datetime

        from pyspark.sql import functions as F

        from edgar_crawler_spark.operators import sketch as SK
        from edgar_crawler_spark.streaming import stream_cms_counters

        src = str(tmp_path / "cms_src")
        out = str(tmp_path / "cms_out")
        ckpt = str(tmp_path / "cms_ckpt")
        schema = "doc_id long, text string, event_ts timestamp"

        def ts(s_):
            return datetime.fromisoformat(s_)

        rng = random.Random(41)

        def mk_text(n, vocab):
            return " ".join(f"w{rng.randrange(vocab)}" for _ in range(n))

        # window A rows split across two files/micro-batches — the
        # cross-batch SUM-merge is what's under test (HLL's analogue
        # merges by max; a double-count bug would pass a max-merge
        # test but fail this one); window B; sentinel closes both.
        rows_a1 = [(i, mk_text(30, 40), ts("2024-01-01 00:00:05"))
                   for i in range(6)]
        rows_a2 = [(i + 6, mk_text(30, 40), ts("2024-01-01 00:00:40"))
                   for i in range(6)]
        rows_b = [(i + 12, mk_text(20, 25), ts("2024-01-01 00:01:30"))
                  for i in range(4)]
        spark.createDataFrame(rows_a1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(2)
        spark.createDataFrame(
            rows_a2 + rows_b, schema
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(2)
        spark.createDataFrame(
            [(99, "sentinel", ts("2024-01-01 01:00:00"))], schema
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_cms_counters(
                stream, window="1 minute", watermark="1 minute"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        got = spark.read.parquet(out)

        wins = {
            r.win_start.isoformat(): {
                (x.row, x.bucket): x.cnt
                for x in got.filter(
                    F.col("win_start") == r.win_start
                ).collect()
            }
            for r in got.select("win_start").distinct().collect()
        }
        assert set(wins) == {"2024-01-01T00:00:00", "2024-01-01T00:01:00"}

        for key, rows in (
            ("2024-01-01T00:00:00", rows_a1 + rows_a2),
            ("2024-01-01T00:01:00", rows_b),
        ):
            batch = spark.createDataFrame(rows, schema).select(
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda x: x != "",
                    )
                ).alias("t")
            )
            expected = {
                (r.row, r.bucket): r.cnt
                for r in SK.cms_counters(batch, "t").collect()
            }
            assert wins[key] == expected, key
            # probe law on the emitted window: est >= true, every token
            counters = spark.createDataFrame(
                [(r, b, c) for (r, b), c in wins[key].items()],
                "row int, bucket long, cnt long",
            )
            true = {
                r.t: r.c
                for r in batch.groupBy("t").agg(
                    F.count(F.lit(1)).alias("c")
                ).collect()
            }
            est = {
                r.t: r.est_cnt
                for r in SK.cms_estimate(
                    counters, batch.distinct(), "t"
                ).collect()
            }
            assert all(est[t] >= c for t, c in true.items()), key


class TestStreamMoments:
    def test_windowed_sums_match_batch_sketch(self, spark, tmp_path):
        """Per-window streaming power sums must equal the batch
        moments sketch over that window's rows (sum-merge across
        micro-batches, double tolerance for addition order)."""
        import time as _time
        from datetime import datetime

        from pyspark.sql import functions as F

        from edgar_crawler_spark.operators import sketch as SK
        from edgar_crawler_spark.streaming import stream_moment_sums

        src = str(tmp_path / "mq_src")
        out = str(tmp_path / "mq_out")
        ckpt = str(tmp_path / "mq_ckpt")
        schema = "doc_id long, n_chars long, event_ts timestamp"

        def ts(s_):
            return datetime.fromisoformat(s_)

        rows_a1 = [(i, 100 + 13 * i, ts("2024-01-01 00:00:05"))
                   for i in range(7)]
        rows_a2 = [(i + 7, 500 + 7 * i, ts("2024-01-01 00:00:40"))
                   for i in range(7)]
        rows_b = [(i + 14, 80 + i, ts("2024-01-01 00:01:30"))
                  for i in range(5)]
        spark.createDataFrame(rows_a1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(2)
        spark.createDataFrame(
            rows_a2 + rows_b, schema
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(2)
        spark.createDataFrame(
            [(99, 1, ts("2024-01-01 01:00:00"))], schema
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_moment_sums(
                stream, window="1 minute", watermark="1 minute"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        got = {
            r.win_start.isoformat(): (r.n, r.s1, r.s2, r.s3)
            for r in spark.read.parquet(out).collect()
        }
        assert set(got) == {"2024-01-01T00:00:00", "2024-01-01T00:01:00"}
        for key, rows in (
            ("2024-01-01T00:00:00", rows_a1 + rows_a2),
            ("2024-01-01T00:01:00", rows_b),
        ):
            batch = spark.createDataFrame(rows, schema).withColumn(
                "g", F.lit("w")
            )
            want = SK.moment_sums_by(batch, ["g"], "n_chars").collect()[0]
            g = got[key]
            assert g[0] == want.n
            for a, b in zip(g[1:], (want.s1, want.s2, want.s3)):
                assert abs(a - b) < 1e-9 * max(1.0, abs(b)), key
