"""Round-4 regressions: pagerank lineage cut, quality_deciles
empty-bucket fix, clustering rounding contract, cachereg hardening."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JError

from edgar_crawler_spark import cachereg
from edgar_crawler_spark.cachereg import release_caches

SF_MED = "/root/testdata/sf0.01"


class TestPagerankLineageCut:
    def test_plan_depth_flat_in_iters(self, spark):
        """VERDICT r03 #1: without a per-round lineage cut the plan
        doubles per iteration (2^iters join passes). With the
        localCheckpoint the FINAL plan must contain exactly one
        round's joins, whatever `iters` is."""
        from edgar_crawler_spark.queries import pagerank_ranks

        try:
            p2 = pagerank_ranks(
                spark, SF_MED, iters=2
            )._jdf.queryExecution().analyzed().toString()
            p10 = pagerank_ranks(
                spark, SF_MED, iters=10
            )._jdf.queryExecution().analyzed().toString()
        finally:
            release_caches()
        j2, j10 = p2.count("Join"), p10.count("Join")
        assert j10 == j2, (j2, j10)
        # one round = contrib equi-join + outdeg join + nodes left
        # join + dangling anti-join; anything >6 means lineage leaked
        assert j10 <= 6, j10
        # the checkpointed previous round enters as a LogicalRDD scan
        assert "LogicalRDD" in p10

    def test_ten_iterations_compute_and_converge(self, spark):
        """10 rounds must actually run (the pre-fix recompute tree
        made this catastrophically slow) and keep total rank mass 1."""
        from pyspark.sql import functions as F

        from edgar_crawler_spark.queries import pagerank_ranks

        try:
            ranks = pagerank_ranks(spark, SF_MED, iters=10)
            total = ranks.agg(F.sum("r").alias("s")).collect()[0].s
        finally:
            release_caches()
        assert abs(total - 1.0) < 1e-5, total


class TestQualityDecilesSmallCorpus:
    def test_seven_docs_emit_seven_rows(self, spark, tmp_path):
        """ADVICE r03 #1: with n < 10 docs, empty deciles used to
        emit spurious (n_docs=0, NULL) rows. NTILE semantics: 7 docs
        => exactly 7 one-doc deciles."""
        from edgar_crawler_spark.queries import QUERIES

        docs = [(i, "s", "x", 100 + 10 * i) for i in range(7)]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = sorted(
            QUERIES["quality_deciles"].fn(spark, str(tmp_path)).collect(),
            key=lambda r: r.decile,
        )
        assert len(rows) == 7
        assert [r.decile for r in rows] == list(range(1, 8))
        assert all(r.n_docs == 1 for r in rows)
        # rank order is n_chars DESC: decile 1 holds the longest doc
        assert rows[0].max_chars == 160 and rows[6].min_chars == 100
        assert all(r.min_chars is not None for r in rows)


class TestClusteringRounding:
    def test_rhu_is_half_away_from_zero(self):
        """ADVICE r03 #3: driver-side centroid rounding must match
        Spark F.round / DuckDB ROUND (half-away), not banker's."""
        from edgar_crawler_spark.operators.clustering import _rhu

        assert _rhu(2.5, 0) == 3.0
        assert _rhu(-2.5, 0) == -3.0
        assert _rhu(0.0000025, 6) == 0.000003
        assert _rhu(1.2345675, 6) == 1.234568  # repr-exact half
        # builtin round() would give 2.0 / 0.000002 here (half-to-even)
        assert round(2.5) == 2

    def test_rhu_matches_spark_round(self, spark):
        from pyspark.sql import functions as F

        from edgar_crawler_spark.operators.clustering import _rhu

        vals = [2.5, -2.5, 0.1234565, 1.9999995, 3.141592653, -0.5]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = [
            r.r for r in df.select(F.round("x", 6).alias("r")).collect()
        ]
        assert got == [_rhu(v, 6) for v in vals]


class TestCachereg:
    def test_live_session_error_reraises(self):
        """ADVICE r03 #2: a genuine unpersist failure must not be
        silently counted as released."""

        class Wedged:
            def unpersist(self):
                raise Py4JError("An error occurred while calling unpersist")

        cachereg._LIVE.append(Wedged())
        with pytest.raises(Py4JError):
            release_caches()
        assert not cachereg._LIVE  # registry drained even on error

    def test_stopped_session_swallowed(self):
        class Stopped:
            def unpersist(self):
                raise RuntimeError(
                    "Cannot call methods on a stopped SparkContext"
                )

        cachereg._LIVE.append(Stopped())
        assert release_caches() == 0
        assert not cachereg._LIVE

    def test_concurrent_tracking_is_safe(self, spark):
        import threading

        docs = spark.range(10)

        def work():
            for _ in range(50):
                cachereg.tracked_cache(docs.selectExpr("id + 1 as id"))

        ts = [threading.Thread(target=work) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(cachereg._LIVE) == 200
        assert release_caches() == 200


SF_SMALL = "/root/testdata/sf0.001"


class TestBfsReachability:
    def test_matches_python_bfs(self, spark):
        from edgar_crawler_spark.queries import _BFS_DEPTH, _PR_MOD, QUERIES

        ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
        edges = set()
        for r in ev:
            s = r.user_id % _PR_MOD
            d = (r.user_id * 7 + r.event_id) % _PR_MOD
            if s != d:
                edges.add((s, d))
        adj: dict[int, set[int]] = {}
        nodes = set()
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            nodes.update((s, d))
        depth = {n: 0 for n in nodes if n % 17 == 0}
        frontier = set(depth)
        for d in range(1, _BFS_DEPTH + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in depth:
                        depth[v] = d
                        nxt.add(v)
            frontier = nxt
        expect = {}
        for n, d in depth.items():
            c, mn, mx, sm = expect.get(d, (0, 10**9, -1, 0))
            expect[d] = (c + 1, min(mn, n), max(mx, n), sm + n)
        try:
            got = {
                r.depth: (r.n_nodes, r.min_node, r.max_node, r.node_sum)
                for r in QUERIES["bfs_reachability"].fn(
                    spark, SF_SMALL
                ).collect()
            }
        finally:
            release_caches()
        assert got == expect
        # seeds exist and expansion actually happened
        assert 0 in got and len(got) >= 2


class TestWarcRevisit:
    def test_planted_revisits(self, spark, tmp_path):
        from edgar_crawler_spark.queries import QUERIES

        # doc_ids 0, 97, 194 share url (id % 97 == 0, id % 23 spread)?
        # urls mix BOTH moduli — plant ids congruent mod 23*97=2231 so
        # they share a url, with controlled first-4-char prefixes
        docs = [
            (0, "s", "aaaa one", 8),        # v1
            (2231, "s", "aaaa two", 8),     # same url, same digest -> revisit
            (4462, "s", "bbbb new", 8),     # same url, changed content
            (6693, "s", "aaaa back", 9),    # same url, digest seen before
            (1, "s", "solo page", 9),       # singleton url
        ]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = {
            r.url: r
            for r in QUERIES["warc_revisit_resolve"].fn(
                spark, str(tmp_path)
            ).collect()
        }
        assert len(rows) == 2
        grp = rows["https://host0.example.com/doc/0"]
        # 4 fetches, 2 versions (aaaa, bbbb), 2 revisits, 2 content flips
        assert (grp.n_fetches, grp.n_versions, grp.n_revisits,
                grp.n_changes) == (4, 2, 2, 2)
        solo = rows["https://host1.example.com/doc/1"]
        assert (solo.n_fetches, solo.n_versions, solo.n_revisits,
                solo.n_changes) == (1, 1, 0, 0)

    def test_sf001_nontrivial(self, spark):
        from pyspark.sql import functions as F

        from edgar_crawler_spark.queries import QUERIES

        df = QUERIES["warc_revisit_resolve"].fn(spark, "/root/testdata/sf0.01")
        agg = df.agg(
            F.sum("n_revisits").alias("r"), F.sum("n_changes").alias("c")
        ).collect()[0]
        assert agg.r > 0 and agg.c > 0  # the columns aren't trivially zero


class TestRobotsPrefixMatch:
    def test_matches_python_mirror(self, spark):
        from edgar_crawler_spark.queries import _ROBOTS_RULES, QUERIES

        ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
        agg: dict[tuple, list] = {}
        for r in ev:
            m = r.event_id % 3
            if m == 0:
                path = f"/p/{r.user_id % 30}"
            elif m == 1:
                path = f"/doc/{r.event_id % 50}"
            else:
                path = f"/admin/{r.user_id % 5}"
            cands = [
                (len(p), -i, i, p, a)
                for i, p, a in _ROBOTS_RULES
                if path.startswith(p)
            ]
            _, _, rid, pref, allow = max(cands)
            key = (rid, pref, allow)
            st = agg.setdefault(key, [0, set(), None])
            st[0] += 1
            st[1].add(path)
            st[2] = path if st[2] is None else min(st[2], path)
        expect = {
            k: (n, len(ps), mn) for k, (n, ps, mn) in agg.items()
        }
        got = {
            (r.rule_id, r.prefix, r.allow):
                (r.n_paths, r.n_distinct_paths, r.sample_path)
            for r in QUERIES["robots_prefix_match"].fn(
                spark, SF_SMALL
            ).collect()
        }
        assert got == expect
        # the most-specific-wins semantics is actually exercised:
        # both '/doc/' (deny) and '/doc/4*' (allow) must win somewhere
        rids = {k[0] for k in got}
        assert {3, 4} <= rids


class TestSaltedHostAgg:
    def test_salt_invariant_vs_plain_groupby(self, spark):
        from pyspark.sql import functions as F

        from edgar_crawler_spark.queries import QUERIES

        ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
        host = F.when(
            F.col("user_id") % 10 < 8, F.lit("hot.example.com")
        ).otherwise(
            F.concat(
                F.lit("h"), (F.col("user_id") % 37).cast("string"),
                F.lit(".example.com"),
            )
        )
        plain = {
            r.host: (r.n, round(r.s, 2))
            for r in ev.select(host.alias("host"), "value")
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        got = {
            r.host: (r.n_events, r.total_value)
            for r in QUERIES["salted_host_agg"].fn(
                spark, SF_SMALL
            ).collect()
        }
        assert got == plain
        # the skew is real: the hot host dominates
        hot = got["hot.example.com"][0]
        assert hot > 0.7 * sum(v[0] for v in got.values())


class TestBigramLmXent:
    def test_matches_python_mirror(self, spark, tmp_path):
        import math
        from collections import Counter

        from edgar_crawler_spark.queries import QUERIES

        docs = [
            (0, "a", "the cat sat on the mat", 22),
            (1, "a", "the cat ran", 11),
            (2, "b", "the dog sat on the mat", 22),
            (3, "b", "one", 3),  # < 2 tokens: contributes no bigrams
        ]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        bg = []
        for _, src, text, _n in docs:
            w = text.split()
            bg += [(src, (w[i], w[i + 1])) for i in range(len(w) - 1)]
        c2 = Counter(g for _, g in bg)
        c1 = Counter(g[0] for _, g in bg)
        per_src: dict[str, list[float]] = {}
        for src, g in bg:
            per_src.setdefault(src, []).append(
                -math.log(c2[g] / c1[g[0]])
            )
        try:
            got = {
                r.source: (r.n_bigrams, r.xent)
                for r in QUERIES["bigram_lm_xent"].fn(
                    spark, str(tmp_path)
                ).collect()
            }
        finally:
            release_caches()
        for src, xs in per_src.items():
            n, x = got[src]
            assert n == len(xs)
            assert abs(x - sum(xs) / len(xs)) < 1e-6
        assert "b" in got and got["b"][0] == 5  # 'one' excluded


class TestSourceKlDrift:
    def test_matches_python_mirror_and_nonneg(self, spark):
        import math
        from collections import Counter

        from edgar_crawler_spark.queries import QUERIES

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
        tc: Counter = Counter()
        for r in docs:
            for t in r.text.lower().split():
                if t:
                    tc[(r.source, t)] += 1
        st: Counter = Counter()
        gt: Counter = Counter()
        for (s, t), c in tc.items():
            st[s] += c
            gt[t] += c
        ng = sum(tc.values())
        expect = {}
        for s in st:
            kl = sum(
                (c / st[s]) * math.log((c / st[s]) / (gt[t] / ng))
                for (s2, t), c in tc.items()
                if s2 == s
            )
            expect[s] = (st[s], kl)
        try:
            got = {
                r.source: (r.n_tokens, r.kl)
                for r in QUERIES["source_kl_drift"].fn(
                    spark, SF_SMALL
                ).collect()
            }
        finally:
            release_caches()
        assert set(got) == set(expect)
        for s, (n, kl) in expect.items():
            assert got[s][0] == n
            assert abs(got[s][1] - kl) < 1e-5
            assert got[s][1] >= 0  # KL(P||Q) >= 0 (Gibbs)
