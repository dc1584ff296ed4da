"""Frontier semantics tests (SURVEY.md §5 item 3).

- canonicalization: Spark expression ≡ pure-Python mirror
- bloom: zero false negatives, bounded fpp, roundtrip
- URL-seen: bloom-prefiltered path ≡ exact anti-join
- ordering: reference_order ≡ single-process oracle
- politeness: per-bucket pacing + total host budget never exceeded
- end-to-end crawl: every URL fetched exactly once; kill+resume from
  snapshot refetches nothing and misses nothing; retries recover
  transient failures; requeue_failed re-enqueues permanent ones.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.frontier import (
    BloomFilter,
    CrawlJob,
    ShardedBloom,
    SnapshotStore,
    TokenBucket,
    assign_waves,
    canonicalize_url,
    canonicalize_url_py,
    filter_unseen,
    reference_order,
)
from edgar_crawler_spark.frontier.bloom import shard_of
from edgar_crawler_spark.frontier.fetch import MAX_RETRIES, SimulatedTransport
from edgar_crawler_spark.frontier.seen import build_sharded_bloom
from edgar_crawler_spark.synth import accession_number, filing_url

CANON_CASES = [
    # iXBRL rewrite (download_filings.py:703-705)
    ("https://www.sec.gov/ix?doc=/Archives/edgar/data/320193/a.htm",
     "https://www.sec.gov/Archives/edgar/data/320193/a.htm"),
    # bare 18-digit accession -> dashed normal form
    ("https://www.sec.gov/Archives/edgar/data/320193/000032019324000123.txt",
     "https://www.sec.gov/Archives/edgar/data/320193/0000320193-24-000123.txt"),
    # host case + default port + fragment
    ("HTTPS://WWW.SEC.GOV:443/Archives/x.htm#item7",
     "https://www.sec.gov/Archives/x.htm"),
    ("http://www.sec.gov:80/", "http://www.sec.gov/"),
    # NON-default ports for the scheme are kept: these fetch different bytes
    ("http://www.sec.gov:443/x.htm", "http://www.sec.gov:443/x.htm"),
    ("https://www.sec.gov:80/x.htm", "https://www.sec.gov:80/x.htm"),
    # already canonical: unchanged
    ("https://www.sec.gov/Archives/edgar/data/1/0000000001-20-000001-index.html",
     "https://www.sec.gov/Archives/edgar/data/1/0000000001-20-000001-index.html"),
]


def _frontier_rows(n: int, seed: int = 3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cik = str(rng.randint(1000, 99999))
        acc = accession_number(seed, i)
        rows.append(
            (
                filing_url(cik, acc),
                cik,
                f"CO {i}",
                rng.choice(["8-K", "10-K", "10-Q"]),
                f"{rng.randint(2015, 2024)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
                acc,
            )
        )
    return rows


FRONTIER_SCHEMA = (
    "url string, cik string, company string, form_type string, "
    "filing_date string, accession string"
)


def _frontier_df(spark, n: int, seed: int = 3):
    return spark.createDataFrame(_frontier_rows(n, seed), FRONTIER_SCHEMA)


class TestCanon:
    def test_pure_cases(self):
        for raw, want in CANON_CASES:
            assert canonicalize_url_py(raw) == want, raw

    def test_spark_matches_python(self, spark):
        raws = [c[0] for c in CANON_CASES] + [r[0] for r in _frontier_rows(50)]
        df = spark.createDataFrame([(u,) for u in raws], "url string")
        got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
        assert got == [canonicalize_url_py(u) for u in raws]


class TestBloom:
    def test_no_false_negatives_and_fpp(self):
        keys = [f"https://www.sec.gov/Archives/{i}.txt" for i in range(5000)]
        bf = BloomFilter.empty(len(keys), fpp=0.01)
        bf.add_many(keys)
        assert all(bf.might_contain(k) for k in keys)
        probes = [f"https://other/{i}" for i in range(5000)]
        fp = sum(bf.might_contain(p) for p in probes) / len(probes)
        assert fp < 0.03

    def test_sharded_roundtrip(self):
        keys = [f"u{i}" for i in range(2000)]
        shards: dict[int, BloomFilter] = {}
        for k in keys:
            s = shard_of(k, 8)
            shards.setdefault(s, BloomFilter.empty(300, 0.01)).add(k)
        sb = ShardedBloom(8, shards)
        sb2 = ShardedBloom.from_rows(8, sb.to_rows())
        assert all(sb2.might_contain(k) for k in keys)
        assert len(set(shard_of(k, 8) for k in keys)) == 8  # all shards used

    def test_vectorized_paths_bit_identical(self):
        """add_many / might_contain_many are vectorized; they must be
        BIT-identical to the per-key add / might_contain loops —
        including absent shards (answer False) and shards with
        different geometry."""
        import numpy as np

        keys = [f"https://host{i % 7}.example/p/{i}" for i in range(3000)]
        keys += ["", "é∆-unicode", "a" * 500]
        bf_loop = BloomFilter.empty(1000, 0.01)
        bf_vec = BloomFilter.empty(1000, 0.01)
        for k in keys:
            bf_loop.add(k)
        bf_vec.add_many(keys)
        assert np.array_equal(bf_loop.bits, bf_vec.bits)

        shards: dict[int, BloomFilter] = {}
        for k in keys:
            shards.setdefault(shard_of(k, 16), BloomFilter.empty(300, 0.01)).add(k)
        del shards[sorted(shards)[3]]  # absent-shard path
        sb = ShardedBloom(16, shards)
        probe = keys + [f"unseen-{i}" for i in range(3000)]
        per_key = [sb.might_contain(k) for k in probe]
        assert sb.might_contain_many(probe).tolist() == per_key
        assert sb.might_contain_many([]).shape == (0,)

        het = ShardedBloom(
            4, {0: BloomFilter.empty(100, 0.01), 1: BloomFilter.empty(9999, 0.001)}
        )
        het.shards[0].add("x")
        het.shards[1].add("y")
        pr = ["x", "y", "z", "w"]
        assert het.might_contain_many(pr).tolist() == [het.might_contain(k) for k in pr]

    def test_distributed_build_matches(self, spark):
        df = _frontier_df(spark, 400).repartition(7)
        sb = build_sharded_bloom(df, n_shards=4, fpp=0.01)
        urls = [r.url for r in df.select("url").collect()]
        assert all(sb.might_contain(u) for u in urls)


class TestUrlSeen:
    def test_prefiltered_equals_exact(self, spark):
        frontier = _frontier_df(spark, 300, seed=1)
        # seen = half of frontier + some foreign urls
        seen = (
            frontier.sample(0.5, seed=42)
            .select("url")
            .unionByName(
                spark.createDataFrame(
                    [(f"https://elsewhere/{i}",) for i in range(100)], "url string"
                )
            )
        ).cache()
        bloom = build_sharded_bloom(seen, n_shards=4)
        got = sorted(
            r.url for r in filter_unseen(frontier, seen, bloom).select("url").collect()
        )
        want = sorted(
            r.url
            for r in frontier.join(seen, "url", "left_anti").select("url").collect()
        )
        assert got == want
        assert 0 < len(got) < 300


class TestOrdering:
    def test_reference_order_matches_oracle(self, spark):
        rng = random.Random(9)
        seq: dict[tuple[int, int], int] = {}
        rows = []
        for i in range(500):
            yq = (rng.randint(2018, 2021), rng.randint(1, 4))
            rows.append((yq[0], yq[1], seq.get(yq, 0), f"acc{i}"))
            seq[yq] = seq.get(yq, 0) + 1
        df = spark.createDataFrame(
            rows, "year int, quarter int, row_seq long, accession string"
        ).repartition(8)
        got = [
            r.accession
            for r in reference_order(df).orderBy("visit_seq").collect()
        ]
        want = [a for _, _, _, a in sorted(rows, key=lambda r: (r[0], r[1], r[2]))]
        assert got == want

    def test_assign_waves(self, spark):
        df = assign_waves(_frontier_df(spark, 400), n_buckets=4, wave_size=25)
        pdf = df.toPandas()
        assert set(pdf.host_bucket.unique()) <= set(range(4))
        # wave sizes bounded; within-bucket priority is monotone
        for (_, w), grp in pdf.groupby(["host_bucket", "wave"]):
            assert len(grp) <= 25
        for _, grp in pdf.groupby("host_bucket"):
            g = grp.sort_values("bucket_rank")
            keys = list(
                zip(-g.form_weight, [tuple(-ord(c) for c in d) for d in g.filing_date], g.accession)
            )
            assert keys == sorted(keys)

    def test_murmur_mirror_matches_spark_hash(self, spark):
        """partition_slots inverts HashPartitioning with a pure-Python
        Murmur3; it is only sound if the mirror is EXACT (incl. sign
        and int32 overflow semantics)."""
        from edgar_crawler_spark.frontier.priority import _murmur3_int32

        vals = list(range(-5, 40)) + [2**31 - 1, -(2**31), 123456789, -987654321]
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        got = {r.v: r.h for r in df.select("v", F.hash("v").alias("h")).collect()}
        assert got == {v: _murmur3_int32(v) for v in vals}

    def test_slots_cover_all_residues(self):
        from edgar_crawler_spark.frontier.priority import (
            _murmur3_int32, partition_slots,
        )

        for n in (2, 3, 4, 8, 16, 256, 1024):
            s = partition_slots(n)
            assert s is not None
            assert len({_murmur3_int32(v) % n for v in s}) == n

    def test_one_bucket_per_partition(self, spark):
        """Murmur3 collides on raw bucket ids (0 and 1 of 2 share a
        partition), which would stack two politeness-paced buckets
        behind one task; the _pslot mapping must place every bucket on
        its OWN partition."""
        for n in (2, 4, 8):
            w = assign_waves(_frontier_df(spark, 300), n_buckets=n, wave_size=300)
            got = (
                w.select("host_bucket", F.spark_partition_id().alias("p"))
                .distinct()
                .collect()
            )
            parts: dict[int, set] = {}
            for r in got:
                parts.setdefault(r.host_bucket, set()).add(r.p)
            assert all(len(v) == 1 for v in parts.values())
            flat = [next(iter(v)) for v in parts.values()]
            assert len(set(flat)) == len(parts)

    def test_single_exchange_reused_by_fetch(self, spark):
        """The _pslot repartition must remain the ONLY exchange: the
        window and the fetch groupBy reuse its clustering."""
        from edgar_crawler_spark.frontier.fetch import fetch_wave

        w = assign_waves(_frontier_df(spark, 100), n_buckets=4, wave_size=100)
        plan = fetch_wave(
            w, transport_factory=lambda: SimulatedTransport(transient_pct=0)
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestPoliteness:
    def test_token_bucket_rate(self):
        tb = TokenBucket(rate=2.0, burst=1.0)
        times = [tb.acquire() for _ in range(21)]
        assert times == sorted(times)
        # after the initial burst token, steady state is 1/rate gaps
        gaps = [b - a for a, b in zip(times[1:], times[2:])]
        assert all(g >= 0.5 - 1e-9 for g in gaps)
        assert times[-1] >= 19 * 0.5 - 1e-9

    def test_crawl_respects_host_budget(self, spark, tmp_path):
        job = CrawlJob(
            spark,
            SnapshotStore(str(tmp_path / "store")),
            n_buckets=4,
            wave_size=50,
            host_budget_per_sec=10.0,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job.run(_frontier_df(spark, 200), max_waves=1)
        log = job.pages().select("host_bucket", "sched_ts").toPandas()
        rate = 10.0 / 4
        for _, grp in log.groupby("host_bucket"):
            ts = sorted(grp.sched_ts)
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            # burst=1: beyond the first token every send is paced
            assert all(g >= 1 / rate - 1e-6 for g in gaps[1:] + gaps[:1] if g > 0) or all(
                g >= 1 / rate - 1e-6 for g in gaps[1:]
            )
        # total host throughput over the wave ≤ budget (+ burst slack)
        ts_all = sorted(log.sched_ts)
        span = max(ts_all[-1] - ts_all[0], 1e-9)
        assert (len(ts_all) - 4) / span <= 10.0 + 1e-6


class TestCrawlEndToEnd:
    def test_exactly_once_and_metrics(self, spark, tmp_path):
        n = 150
        job = CrawlJob(
            spark,
            SnapshotStore(str(tmp_path / "s1")),
            n_buckets=4,
            wave_size=20,
            transport_factory=lambda: SimulatedTransport(transient_pct=20),
        )
        res = job.run(_frontier_df(spark, n))
        pages = job.pages().cache()
        assert res.n_fetched == n and res.n_failed == 0
        assert pages.count() == n
        assert pages.select("url").distinct().count() == n
        # retries actually happened and recovered
        assert pages.filter(F.col("attempts") > 1).count() > 0
        assert pages.filter(F.col("status") != "ok").count() == 0
        # bodies are real filings (non-empty, deterministic)
        assert pages.filter(F.length("html") > 100).count() == n
        # lineage metrics exist for every wave×bucket that fetched
        m = job.metrics().toPandas()
        assert m.n_urls.sum() == n
        assert (m.urls_per_sec > 0).all()
        assert set(m.columns) >= {
            "wave", "host_bucket", "partition_id", "n_urls", "n_ok",
            "n_failed", "sum_attempts", "sum_bytes", "t_first", "t_last",
            "urls_per_sec",
        }

    def test_kill_and_resume_exactness(self, spark, tmp_path):
        n = 120
        root = str(tmp_path / "s2")
        job1 = CrawlJob(
            spark, SnapshotStore(root), n_buckets=4, wave_size=10,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        r1 = job1.run(_frontier_df(spark, n), max_waves=2)
        assert 0 < r1.n_fetched < n  # mid-crawl "kill"

        # fresh objects = restarted process; frontier arg ignored on resume
        job2 = CrawlJob(
            spark, SnapshotStore(root), n_buckets=4, wave_size=10,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        r2 = job2.run(_frontier_df(spark, n))
        pages = job2.pages()
        assert r1.n_fetched + r2.n_fetched == n
        assert pages.count() == n  # no double fetch ...
        assert pages.select("url").distinct().count() == n  # ... no miss
        # and byte-determinism across the kill boundary: same url -> same body
        want = {r.url: bytes(r.html) for r in _rerun_reference(spark, tmp_path, n)}
        got = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
        assert got == want

    def test_permanent_failures_requeue(self, spark, tmp_path):
        job = CrawlJob(
            spark, SnapshotStore(str(tmp_path / "s3")), n_buckets=2, wave_size=40,
            transport_factory=lambda: SimulatedTransport(
                transient_pct=0, permanent_pct=10
            ),
        )
        res = job.run(_frontier_df(spark, 80))
        assert res.n_failed > 0
        pages = job.pages()
        failed = pages.filter(F.col("status") != "ok")
        assert failed.filter(F.col("attempts") != MAX_RETRIES + 1).count() == 0
        n_req = job.requeue_failed()
        assert n_req == failed.select("url").distinct().count()
        # after requeue the frontier holds exactly the failed urls
        frontier = job.store.read(spark, "frontier")
        assert frontier.count() == n_req

    def test_requeue_skips_recovered_urls(self, spark, tmp_path):
        """A url that failed, was requeued, and then SUCCEEDED must not
        be requeued again by a later requeue_failed call (the pages
        union holds both its failed and ok rows)."""
        root = str(tmp_path / "s4")
        job = CrawlJob(
            spark, SnapshotStore(root), n_buckets=2, wave_size=40,
            transport_factory=lambda: SimulatedTransport(
                transient_pct=0, permanent_pct=10
            ),
        )
        job.run(_frontier_df(spark, 80))
        n_req = job.requeue_failed()
        assert n_req > 0
        # "network recovers": same store, transport that never fails
        job2 = CrawlJob(
            spark, SnapshotStore(root), n_buckets=2, wave_size=40,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job2.run(_frontier_df(spark, 80))
        assert job2.requeue_failed() == 0  # recovered urls stay fetched
        pages = job2.pages()
        ok = pages.filter(F.col("status") == "ok")
        assert ok.select("url").distinct().count() == 80

    def test_seen_frontier_drains_and_terminates(self, spark, tmp_path):
        """Replayed/overlapping discovery: a frontier whose rows are
        ALL already in seen must terminate run() instead of looping
        forever committing empty waves (ADVICE r01, high)."""
        root = str(tmp_path / "s5")
        job = CrawlJob(
            spark, SnapshotStore(root), n_buckets=2, wave_size=50,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job.run(_frontier_df(spark, 40))
        assert job.pages().count() == 40
        # replay: merge the SAME 40 urls plus 20 new ones into the frontier
        from edgar_crawler_spark.frontier.canon import canonicalize_url
        merged = (
            job.store.read(spark, "frontier")
            .unionByName(
                _frontier_df(spark, 60)  # superset (same seed)
                .withColumn("url", canonicalize_url("url"))
            )
            .dropDuplicates(["url"])
        )
        seen = job.store.read(spark, "seen")
        job.store.commit(
            {"frontier": merged, "seen": seen}, summary={"stage": "replay"}
        )
        res = job.run(max_waves=5)  # bounded: must NOT hit the bound
        assert res.waves_run < 5
        pages = job.pages()
        assert pages.count() == 60  # only the 20 new urls fetched
        assert pages.select("url").distinct().count() == 60
        # pure-replay case: run again with zero new work -> 0 waves
        res2 = job.run(max_waves=5)
        assert res2.waves_run == 0 and res2.n_fetched == 0


class TestCompanyInfoDim:
    def test_dim_grows_lazily_and_survives_resume(self, spark, tmp_path):
        """Reference lazy cache semantics (download_filings.py:572-646):
        the dim grows per wave with only NEW ciks fetched; rows for
        already-known ciks are never rewritten (their
        fetched_at_version is immutable); the dim survives
        kill/resume via the snapshot store."""
        from edgar_crawler_spark.frontier.company import (
            make_company_info_html,
            parse_company_info_html,
        )

        root = str(tmp_path / "ci")
        n = 120
        job1 = CrawlJob(
            spark, SnapshotStore(root), n_buckets=4, wave_size=30,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job1.run(_frontier_df(spark, n), max_waves=2)
        dim1 = {r.cik: r for r in job1.company_info().collect()}
        assert len(dim1) > 0
        # dim holds exactly the ciks fetched so far
        fetched_ciks = {
            r.cik for r in job1.pages().select("cik").distinct().collect()
        }
        assert set(dim1) == fetched_ciks
        # parsed fields round-trip the deterministic company page
        for cik, row in list(dim1.items())[:5]:
            want = parse_company_info_html(make_company_info_html(cik))
            assert row.company_name == want["company_name"]
            assert row.sic == want["sic"]
            assert row.state_of_inc == want["state_of_inc"]
            assert row.fiscal_year_end == want["fiscal_year_end"]

        # "restart the process" and crawl to exhaustion
        job2 = CrawlJob(
            spark, SnapshotStore(root), n_buckets=4, wave_size=30,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job2.run(_frontier_df(spark, n))
        dim2 = {r.cik: r for r in job2.company_info().collect()}
        all_ciks = {
            r.cik for r in job2.pages().select("cik").distinct().collect()
        }
        assert set(dim2) == all_ciks
        assert len(dim2) >= len(dim1)
        # grow-only: pre-resume rows kept their original fetch version
        for cik, row in dim1.items():
            assert dim2[cik].fetched_at_version == row.fetched_at_version
        # exactly one row per cik ever (no refetch, no duplicates)
        counts = (
            job2.company_info().groupBy("cik").count()
            .filter(F.col("count") > 1).count()
        )
        assert counts == 0

    def test_enriched_pages_fill_missing_company(self, spark, tmp_path):
        job = CrawlJob(
            spark, SnapshotStore(str(tmp_path / "ci2")), n_buckets=2,
            wave_size=40,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        job.run(_frontier_df(spark, 40))
        pages = job.pages()
        enriched = job.enriched_pages()
        assert enriched.count() == pages.count()
        # company column filled from dim wherever the fact had null
        assert enriched.filter(F.col("company").isNull()).count() == 0
        # dim attributes joined in
        assert "sic" in enriched.columns
        assert enriched.filter(F.col("sic").isNull()).count() == 0


class TestFusedCrawl:
    def test_fused_equals_two_stage(self, spark):
        """fetch_extract_wave (single python pass) must produce the
        same per-url item sets as fetch_wave -> extract_items_job."""
        import hashlib

        from edgar_crawler_spark.frontier.fetch import (
            fetch_extract_wave,
            fetch_wave,
        )
        from edgar_crawler_spark.frontier.priority import assign_waves
        from edgar_crawler_spark.operators.extract_job import extract_items_job

        waved = assign_waves(_frontier_df(spark, 80, seed=31), 4, wave_size=1000)
        tf = lambda: SimulatedTransport(transient_pct=0)  # noqa: E731
        fused = {
            r.url: (r.n_items, r.items_digest)
            for r in fetch_extract_wave(
                waved, host_budget_per_sec=1e9, n_buckets=4, transport_factory=tf
            ).collect()
        }
        pages = fetch_wave(
            waved, host_budget_per_sec=1e9, n_buckets=4, transport_factory=tf
        )
        two_stage = {}
        for r in extract_items_job(pages).collect():
            items = sorted((k, v) for k, v in (r.items or {}).items() if v)
            digest = hashlib.md5(
                "\x00".join(f"{k}\x01{v}" for k, v in items).encode("utf-8")
            ).hexdigest()
            two_stage[r.url] = (len(items), digest)
        assert fused == two_stage
        assert sum(n for n, _ in fused.values()) > 0


def _rerun_reference(spark, tmp_path, n):
    """Uninterrupted oracle crawl over the same frontier."""
    job = CrawlJob(
        spark, SnapshotStore(str(tmp_path / "oracle")), n_buckets=4, wave_size=1000,
        transport_factory=lambda: SimulatedTransport(transient_pct=0),
    )
    job.run(_frontier_df(spark, n))
    return job.pages().select("url", "html").collect()


class TestRobots:
    def test_robots_denied_urls_never_fetch(self, spark, tmp_path):
        from edgar_crawler_spark.frontier.fetch import RobotsPolicy

        robots_txt = "User-agent: *\nDisallow: /Archives/edgar/data/1\n"
        policy = RobotsPolicy(robots_txt)
        frontier = _frontier_df(spark, 120, seed=41)
        denied_urls = {
            r.url for r in frontier.collect()
            if not policy.allows(r.url)
        }
        assert 0 < len(denied_urls) < 120

        job = CrawlJob(
            spark, SnapshotStore(str(tmp_path / "sr")), n_buckets=4, wave_size=200,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
            robots=policy,
        )
        job.run(frontier)
        pages = job.pages()
        denied_rows = pages.filter(F.col("status") == "robots_denied")
        assert {r.url for r in denied_rows.collect()} == denied_urls
        # denied rows consumed no attempts and carry no body
        assert denied_rows.filter(
            (F.col("attempts") != 0) | F.col("html").isNotNull()
        ).count() == 0
        # everything else fetched normally
        assert pages.filter(F.col("status") == "ok").count() == 120 - len(denied_urls)


class TestSkewBalance:
    def test_single_host_salting_is_balanced(self, spark):
        """The whole frontier is one host (sec.gov) — the crc32 salt
        must spread it near-uniformly across buckets or one fetch task
        inherits the skew."""
        df = assign_waves(_frontier_df(spark, 2000, seed=51), n_buckets=16,
                          wave_size=10**9)
        counts = {
            r.host_bucket: r["count"]
            for r in df.groupBy("host_bucket").count().collect()
        }
        assert len(counts) == 16
        mean = 2000 / 16
        for b, c in counts.items():
            assert 0.6 * mean <= c <= 1.4 * mean, (b, c)


class TestSnapshotExpiry:
    def test_expire_state_keeps_pages_and_resume(self, spark, tmp_path):
        """expire_state drops superseded frontier/seen/bloom copies
        from old snapshots but (a) the pages log stays complete,
        (b) the crawl resumes exactly, (c) per-table carriers are
        respected so a sparse table (company_info) never vanishes."""
        store = SnapshotStore(str(tmp_path / "sx"))
        job = CrawlJob(
            spark, store, n_buckets=4, wave_size=10,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        n = 120
        job.run(_frontier_df(spark, n), max_waves=2)  # seed + 2 waves
        mid_pages = job.pages().count()
        assert mid_pages == 80  # 2 waves x (10 per bucket x 4 buckets)
        expired = store.expire_state(keep_last=1)
        assert expired  # something actually expired
        # newest state survives; resume finishes the crawl exactly
        job2 = CrawlJob(
            spark, store, n_buckets=4, wave_size=10,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
        )
        res = job2.run()
        pages = job2.pages()
        assert pages.count() == n
        assert pages.select("url").distinct().count() == n
        # company_info still readable (sparse carrier preserved)
        assert job2.company_info() is not None
        # expired versions: state gone, pages (append log) intact
        v0 = expired[0]
        assert store.read(spark, "seen", v0) is None
        if store.read(spark, "pages", v0) is not None:
            assert store.read(spark, "pages", v0).count() > 0

    def test_expire_respects_sparse_carriers(self, spark, tmp_path):
        """A table carried only by OLD versions keeps its newest
        carrier even when that version's other state expires."""
        store = SnapshotStore(str(tmp_path / "sy"))
        df = spark.range(3).selectExpr("cast(id as string) AS url")
        dim = spark.range(2).selectExpr("id AS cik", "'x' AS name")
        store.commit({"seen": df, "company_info": dim})   # v1
        store.commit({"seen": df})                        # v2
        store.commit({"seen": df})                        # v3
        expired = store.expire_state(keep_last=1)
        assert sorted(expired) == [1, 2]
        # v1's seen expired, but v1's company_info is its newest
        # carrier and MUST survive
        assert store.read(spark, "seen", 1) is None
        assert store.read_any(spark, "company_info").count() == 2


class TestCrawlDelay:
    def test_robots_crawl_delay_caps_rate(self, spark, tmp_path):
        """robots.txt Crawl-delay overrides a looser operator budget:
        delay=1s -> 1 req/s across the host, split over buckets."""
        from edgar_crawler_spark.frontier.fetch import (
            RobotsPolicy, effective_budget,
        )

        robots = RobotsPolicy("User-agent: *\nCrawl-delay: 1\n")
        assert robots.crawl_delay() == 1.0
        assert effective_budget(10.0, robots) == 1.0
        # stricter operator budget wins the other way
        assert effective_budget(0.5, robots) == 0.5
        assert effective_budget(10.0, None) == 10.0
        assert effective_budget(10.0, RobotsPolicy("User-agent: *\n")) == 10.0

        job = CrawlJob(
            spark,
            SnapshotStore(str(tmp_path / "cd")),
            n_buckets=2,
            wave_size=10,
            host_budget_per_sec=10.0,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
            robots=robots,
        )
        job.run(_frontier_df(spark, 12), max_waves=1)
        log = job.pages().select("host_bucket", "sched_ts").toPandas()
        # 1 req/s over 2 buckets -> 0.5 req/s per bucket -> >= 2s gaps
        for _, grp in log.groupby("host_bucket"):
            ts = sorted(grp.sched_ts)
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            assert all(g >= 2.0 - 1e-6 for g in gaps[1:] + ([gaps[0]] if len(gaps) > 1 else gaps[:1]))

    def test_request_rate_fallback(self):
        from edgar_crawler_spark.frontier.fetch import RobotsPolicy

        r = RobotsPolicy("User-agent: *\nRequest-rate: 2/10\n")
        assert r.crawl_delay() == 5.0


class TestRealPaceEndToEnd:
    def test_wall_time_matches_host_budget(self, spark):
        """VERDICT r02 #7: end-to-end rate-cap equality. With
        real_pace=True the fetch stage SLEEPS to its politeness
        schedule, so the wave's wall-clock time must equal
        ~n_urls/host_budget (the north-rule politeness story), and
        the buckets must run CONCURRENTLY (sequential buckets would
        double it). Budget math itself is covered elsewhere; this
        asserts the wall clock.

        n=30 urls, budget 10/s over 2 buckets (5/s each, burst 1):
        perfectly balanced -> (15-1)/5 = 2.8 s = ~n/budget. The
        bucket split is hash-determined, so bounds derive from the
        ACTUAL max bucket size; sequential execution would take the
        SUM over buckets — the upper bound excludes it.
        """
        import time

        from edgar_crawler_spark.frontier.fetch import fetch_wave

        n, budget, buckets = 30, 10.0, 2
        wave = assign_waves(_frontier_df(spark, n), n_buckets=buckets,
                            wave_size=n).cache()
        sizes = {r.host_bucket: r.cnt
                 for r in wave.groupBy("host_bucket").count()
                 .withColumnRenamed("count", "cnt").collect()}
        rate = budget / buckets
        expect = (max(sizes.values()) - 1) / rate       # paced, parallel
        sequential = sum((c - 1) / rate for c in sizes.values())
        assert expect < sequential  # the test can tell the two apart

        t0 = time.monotonic()
        rows = fetch_wave(
            wave, host_budget_per_sec=budget, n_buckets=buckets,
            transport_factory=lambda: SimulatedTransport(transient_pct=0),
            real_pace=True,
        ).collect()
        wall = time.monotonic() - t0
        wave.unpersist()

        assert len(rows) == n and all(r.status == "ok" for r in rows)
        # paced: wall >= schedule of the largest bucket
        assert wall >= expect - 0.05
        # concurrent + no stragglers: well under the sequential sum,
        # with slack for task launch + python-worker spin-up
        assert wall < min(sequential, expect + 2.5)
        # and ~n/budget when balanced (schedule says so too)
        sched = max(r.sched_ts for r in rows)
        assert abs(sched - expect) < 1e-6
