"""Round-4e operators: Count-Min sketch heavy hitters, DSIR
importance selection, DUST duplicate-URL rule mining, HyperANF
neighborhood function.

Cross-engine value agreement is covered by the DuckDB oracles
(tools/check_oracles.py); these pin the laws the oracle cannot see —
sketch merge algebra, one-sided error, planted-rule recovery, and the
estimator's error bound against the exact closure.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.operators import sketch as SK
from edgar_crawler_spark.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


class TestCountMin:
    def test_counters_match_python_mirror(self, spark):
        vals = [f"tok{i % 17}" for i in range(300)] + ["rare", "rare"]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        got = {
            (r.row, r.bucket): r.cnt
            for r in SK.cms_counters(df, "t").collect()
        }
        assert got == SK.cms_counters_py(vals)

    def test_one_sided_error_and_exactness_when_sparse(self, spark):
        # 40 distinct values in 4x256 buckets: collisions possible but
        # the estimate must NEVER be below the true count (CMS law),
        # and min-over-rows must equal truth for collision-free keys.
        vals = [f"v{i}" for i in range(40) for _ in range(i + 1)]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        counters = SK.cms_counters(df, "t")
        probes = df.distinct()
        est = {
            r.t: r.est_cnt
            for r in SK.cms_estimate(counters, probes, "t").collect()
        }
        true = {f"v{i}": i + 1 for i in range(40)}
        assert set(est) == set(true)
        assert all(est[k] >= true[k] for k in true)
        # with 40 keys hashed into 4 independent rows of 256 buckets,
        # at least one row is collision-free for almost every key —
        # the aggregate overestimate must be tiny
        over = sum(est[k] - true[k] for k in true)
        assert over <= 5, over

    def test_merge_is_sketch_of_concatenation(self, spark):
        a = spark.createDataFrame(
            [(f"x{i % 7}",) for i in range(50)], "t string"
        )
        b = spark.createDataFrame(
            [(f"x{i % 11}",) for i in range(80)], "t string"
        )
        both = a.unionByName(b)
        merged = {
            (r.row, r.bucket): r.cnt
            for r in SK.cms_merge(
                SK.cms_counters(a, "t"), SK.cms_counters(b, "t")
            ).collect()
        }
        direct = {
            (r.row, r.bucket): r.cnt
            for r in SK.cms_counters(both, "t").collect()
        }
        assert merged == direct

    def test_query_overestimate_nonnegative(self, spark):
        rows = QUERIES["cms_heavy_hitters"].fn(spark, SF_SMALL).collect()
        assert len(rows) == 20
        assert all(r.overestimate >= 0 for r in rows)
        assert all(r.est_cnt >= r.true_cnt for r in rows)


class TestDsir:
    def test_target_language_ranks_first(self, spark):
        """DSIR's whole point: weighting by the target/raw likelihood
        ratio must pull target-distribution (en) docs to the top."""
        rows = QUERIES["dsir_select"].fn(spark, SF_SMALL).collect()
        assert len(rows) == 20
        n_en = sum(1 for r in rows if r.lang == "en")
        assert n_en >= 12, [r.lang for r in rows]
        # weights sorted descending with doc_id tiebreak
        ws = [(-r.dsir_weight, r.doc_id) for r in rows]
        assert ws == sorted(ws)

    def test_weight_sign_separates_planted_vocab(self, spark, tmp_path):
        # target docs speak 'aa bb', raw-only docs speak 'zz yy':
        # target-vocab docs must score positive, off-target negative.
        docs = [
            (i, "aa bb aa bb", "en", "s", 11) for i in range(20)
        ] + [(100 + i, "zz yy zz yy", "de", "s", 11) for i in range(20)]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string,"
            " source string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = QUERIES["dsir_select"].fn(spark, str(tmp_path)).collect()
        got = {r.doc_id: r.dsir_weight for r in rows}
        assert all(w > 0 for d, w in got.items() if d < 100), got
        # top-20 is entirely the target-vocab block
        assert set(got) == set(range(20))


class TestDustRules:
    def test_planted_rules_recovered(self, spark):
        rows = QUERIES["dust_rules"].fn(spark, SF_SMALL).collect()
        got = {(r.alpha, r.beta): (r.support, r.n_hosts) for r in rows}
        assert ("", "www.") in got
        assert {("", f"?sid=s{k}") for k in range(3)} <= set(got)
        # only the planted families survive the support threshold
        assert len(got) == 4, got
        # the www-fold generalizes across all 7 synthetic hosts
        assert got[("", "www.")][1] == 7

    def test_lcp_lcs_extraction_matches_python(self, spark):
        def py_rule(a, b):
            n = min(len(a), len(b))
            lcp = next(
                (i for i in range(n) if a[i] != b[i]), n
            )
            ra, rb = a[::-1], b[::-1]
            lcs = next(
                (i for i in range(n) if ra[i] != rb[i]), n
            )
            lcs = min(lcs, n - lcp)
            return (a[lcp: len(a) - lcs], b[lcp: len(b) - lcs])

        pairs = [
            ("http://h1.ex/art/5", "http://h1.ex/art/5?sid=s2"),
            ("http://h1.ex/art/5", "http://www.h1.ex/art/5"),
            ("http://h1.ex/a/9?x=1", "http://h2.ex/b/9?x=2"),
            ("abc", "abc"),
            ("a", "b"),
        ]
        df = spark.createDataFrame(pairs, "ua string, ub string")
        diffed = (
            df.selectExpr("ua", "ub", "least(length(ua), length(ub)) AS n")
            .selectExpr(
                "ua", "ub", "n",
                "coalesce(try_element_at(filter(sequence(1, n),"
                " i -> substr(ua, i, 1) <> substr(ub, i, 1)), 1) - 1, n)"
                " AS lcp",
                "coalesce(try_element_at(filter(sequence(1, n),"
                " i -> substr(reverse(ua), i, 1)"
                " <> substr(reverse(ub), i, 1)), 1) - 1, n) AS lcs_raw",
            )
            .selectExpr(
                "ua", "ub",
                "substr(ua, lcp + 1, length(ua) - lcp"
                " - least(lcs_raw, n - lcp)) AS alpha",
                "substr(ub, lcp + 1, length(ub) - lcp"
                " - least(lcs_raw, n - lcp)) AS beta",
            )
        )
        got = {(r.ua, r.ub): (r.alpha, r.beta) for r in diffed.collect()}
        for a, b in pairs:
            assert got[(a, b)] == py_rule(a, b), (a, b)


class TestHyperAnf:
    def test_estimate_tracks_exact_closure(self, spark):
        rows = QUERIES["hyperanf_nf"].fn(spark, SF_SMALL).collect()
        assert [r.t for r in rows] == [0, 1, 2, 3]
        prev = 0
        for r in rows:
            # N(t) is monotone in t
            assert r.exact_pairs >= prev
            prev = r.exact_pairs
            # HyperLogLog with m=32: theoretical rel. std error
            # 1.04/sqrt(32) ~ 18%; allow 3 sigma on the summed estimate
            rel = abs(r.est_sum - r.exact_pairs) / r.exact_pairs
            assert rel < 0.3, (r.t, r.est_sum, r.exact_pairs)

    def test_t0_is_linear_counting_exact(self, spark):
        # at t=0 every ball is {v}: single register set per node, the
        # linear-counting branch, which is EXACT for one element
        rows = QUERIES["hyperanf_nf"].fn(spark, SF_SMALL).collect()
        r0 = rows[0]
        n_nodes = r0.exact_pairs  # |{(v,v)}| = node count
        est_per_node = r0.est_sum / n_nodes
        # ln(32/31)*32 = 1.0159... per node
        assert abs(est_per_node - 32 * __import__("math").log(32 / 31.0)) < 1e-6

    def test_register_contract_matches_hll_mirror(self, spark):
        # node-seeded registers use the same 60-bit md5 contract as
        # the corpus HLL — cross-check one node by hand
        h = int(hashlib.md5(b"42").hexdigest()[:15], 16)
        bucket, w = h % 32, h >> 5
        # 60-bit hash, p=5 -> 55 remaining bits, rho_max = 56
        rho = 56 if w == 0 else 56 - w.bit_length()
        df = spark.createDataFrame([(42,)], "node long")
        got = df.select(
            (
                F.conv(
                    F.substring(F.md5(F.col("node").cast("string")), 1, 15),
                    16, 10,
                ).cast("long") % 32
            ).alias("bucket"),
        ).collect()[0]
        assert got.bucket == bucket
        assert 1 <= rho <= 52


class TestZipfSlope:
    def test_matches_python_ols(self, spark):
        import math
        from collections import Counter

        import duckdb

        rows = duckdb.sql(
            "SELECT lower(text) AS t FROM "
            f"'{SF_SMALL}/documents.parquet'"
        ).fetchall()
        cnt = Counter()
        for (t,) in rows:
            cnt.update(w for w in t.split() if w)
        head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        pts = [
            (math.log(r + 1), math.log(c))
            for r, (_, c) in enumerate(head)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        got = QUERIES["zipf_slope"].fn(spark, SF_SMALL).collect()[0]
        assert got.n_points == n
        assert abs(got.slope - slope) < 1e-3
        # head-rank fit of a frequency table is monotone-decreasing in
        # rank by construction => slope can never be positive
        assert got.slope <= 0


class TestSemDeDup:
    def test_planted_twin_is_pruned(self, spark, tmp_path):
        # four well-separated direction groups (k=4 seeds = lowest
        # ids) + an exact twin of vector 0: the twin (higher id) must
        # be pruned, every singleton direction kept.
        import random

        rng = random.Random(7)
        dim = 64

        def unit(axis):
            v = [0.0] * dim
            v[axis] = 1.0
            # small deterministic jitter so averages stay generic
            return [
                x + 0.01 * rng.random() for x in v
            ]

        rows = [
            (0, unit(0), 0),
            (1, unit(16), 1),
            (2, unit(32), 2),
            (3, unit(48), 3),
            (4, [x for x in unit(0)], 0),   # near-twin of vec 0's axis
            (5, unit(16), 1),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "embeddings.parquet")
        )
        got = {
            r.cluster: (r.n_points, r.n_pruned, r.n_kept)
            for r in QUERIES["semdedup_prune"].fn(
                spark, str(tmp_path)
            ).collect()
        }
        # conservation law in every cluster
        assert all(n == p + k for n, p, k in got.values())
        # the two same-axis twins landed together and one was pruned
        assert sum(p for _, p, _ in got.values()) >= 2
        total = sum(n for n, _, _ in got.values())
        assert total == 6

    def test_conservation_and_determinism_on_fixture(self, spark):
        r1 = QUERIES["semdedup_prune"].fn(spark, SF_SMALL).collect()
        r2 = QUERIES["semdedup_prune"].fn(spark, SF_SMALL).collect()
        assert r1 == r2
        assert all(r.n_points == r.n_pruned + r.n_kept for r in r1)
        assert sum(r.n_pruned for r in r1) > 0  # non-trivial at tau


class TestAssignJoinPath:
    def test_join_assignment_equals_literal_path(self, spark):
        """The broadcast-join assignment (large-k path) must be
        value-identical to the literal-injection path: same rounding,
        fold order, and (d, cl) tie-break."""
        from pyspark.sql import functions as F

        from edgar_crawler_spark.operators import clustering as C
        from edgar_crawler_spark.tables import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        pts = emb.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("emb"),
        ).withColumn("pp", C.dot_col(F.col("emb"), F.col("emb")))
        cents = C._fit_loop(pts, 4, 2)
        lit = {
            r.vec_id: (r.cl, r.d)
            for r in C._assign(pts, cents).collect()
        }
        jn = {
            r.vec_id: (r.cl, r.d)
            for r in C._assign_join(pts, cents).collect()
        }
        assert lit == jn


class TestBowtie:
    def test_matches_python_bfs_census(self, spark):
        from collections import defaultdict

        from edgar_crawler_spark.queries import _event_edges

        edges = [
            (r.src, r.dst)
            for r in _event_edges(spark, SF_SMALL, cache=False).collect()
        ]
        fwd_adj, bwd_adj = defaultdict(set), defaultdict(set)
        deg = defaultdict(int)
        nodes = set()
        for s, d in edges:
            fwd_adj[s].add(d)
            bwd_adj[d].add(s)
            deg[s] += 1
            nodes |= {s, d}
        hub = min(sorted(deg), key=lambda n: (-deg[n], n))

        def reach(adj, start, cap=8):
            seen, frontier = {start}, {start}
            for _ in range(cap):
                nxt = set()
                for u in frontier:
                    nxt |= adj[u] - seen
                if not nxt:
                    break
                seen |= nxt
                frontier = nxt
            return seen

        f, b = reach(fwd_adj, hub), reach(bwd_adj, hub)
        want = defaultdict(lambda: [0, 0])
        for n in nodes:
            part = (
                "SCC" if n in f and n in b
                else "IN" if n in b
                else "OUT" if n in f
                else "OTHER"
            )
            want[part][0] += 1
            want[part][1] += n
        got = {
            r.part: [r.n_nodes, r.node_sum]
            for r in QUERIES["bowtie_classify"].fn(spark, SF_SMALL).collect()
        }
        assert got == dict(want)
        assert sum(v[0] for v in got.values()) == len(nodes)


class TestPmi:
    def test_planted_collocation_ranks_first(self, spark, tmp_path):
        # 'aa bb' always adjacent; 'cc' and 'dd' frequent but never
        # paired with each other: PMI must rank (aa, bb) on top.
        docs = [
            (i, "aa bb cc " + ("dd " * 3).strip(), "en", "s", 10)
            for i in range(10)
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string,"
            " source string, n_chars long"
        ).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = QUERIES["pmi_collocations"].fn(spark, str(tmp_path)).collect()
        assert (rows[0].w1, rows[0].w2) == ("aa", "bb")

        # python mirror of every returned PMI value
        import math
        from collections import Counter

        toks = [t for _, text, *_ in docs for t in text.split()]
        uni = Counter(toks)
        bigs = Counter()
        for _, text, *_ in docs:
            ws = text.split()
            bigs.update(zip(ws, ws[1:]))
        t_uni, t_big = sum(uni.values()), sum(bigs.values())
        for r in rows:
            c = bigs[(r.w1, r.w2)]
            want = math.log(
                (c / t_big)
                / ((uni[r.w1] / t_uni) * (uni[r.w2] / t_uni))
            )
            assert abs(r.pmi - want) < 1e-3, (r.w1, r.w2)
            assert r.n_pair == c


class TestMomentsSketch:
    def test_merge_law_and_mirror(self, spark):
        """Power sums of a union must equal the merged per-part sums
        (to double tolerance — addition order differs), and both must
        match a python mirror."""
        import math

        a = spark.createDataFrame(
            [("s", float(v)) for v in range(1, 40)], "g string, x double"
        )
        b = spark.createDataFrame(
            [("s", float(v * 3)) for v in range(1, 25)], "g string, x double"
        )
        direct = SK.moment_sums_by(a.unionByName(b), ["g"], "x").collect()[0]
        merged = SK.moment_merge(
            SK.moment_sums_by(a, ["g"], "x"),
            SK.moment_sums_by(b, ["g"], "x"),
        ).collect()[0]
        xs = [math.log(1 + v) for v in range(1, 40)] + [
            math.log(1 + v * 3) for v in range(1, 25)
        ]
        want = (len(xs), sum(xs), sum(x * x for x in xs),
                sum(x ** 3 for x in xs))
        for got in (direct, merged):
            assert got.n == want[0]
            for g, w in zip((got.s1, got.s2, got.s3), want[1:]):
                assert abs(g - w) < 1e-9 * abs(w)

    def test_estimates_track_exact_quantiles(self, spark):
        rows = QUERIES["moments_quantiles"].fn(spark, SF_SMALL).collect()
        assert len(rows) == 20
        for r in rows:
            assert abs(r.p50_est - r.p50_exact) / r.p50_exact < 0.3, r
            assert abs(r.p90_est - r.p90_exact) / r.p90_exact < 0.3, r
            # conservation: the sketch columns are consistent
            assert r.n_docs > 0 and r.std_log > 0


class TestBloomDecontaminate:
    def test_one_sided_and_false_pos_measured(self, spark):
        rows = QUERIES["bloom_decontaminate"].fn(spark, SF_SMALL).collect()
        assert rows, "fixture must produce contaminated training docs"
        for r in rows:
            # bloom can only over-approximate the exact hit set
            assert r.bloom_hits >= r.exact_hits
            assert r.false_pos == r.bloom_hits - r.exact_hits
            assert r.bloom_hits <= r.n_shingles
        # the fixture's real contamination must be found (not only FPs)
        assert sum(r.exact_hits for r in rows) > 0

    def test_no_false_negatives_by_construction(self, spark):
        """Every exact hit must also be a bloom hit — the one-sided
        guarantee that makes the filter a safe pre-filter."""
        rows = QUERIES["bloom_decontaminate"].fn(spark, SF_SMALL).collect()
        # if a doc had exact_hits > bloom_hits the invariant is broken
        assert all(r.exact_hits <= r.bloom_hits for r in rows)


class TestRobotsRfc:
    def test_spec_behaviors(self, spark):
        """The four RFC 9309 behaviors planted in the rule set."""
        rows = QUERIES["robots_rfc_match"].fn(spark, SF_SMALL).collect()
        by = {(r.host, r.path): (r.allowed, r.rule) for r in rows}
        # longest-match override: /private/public* (allow) beats
        # /private/* (disallow)
        pub = [(a, ru) for (h, p), (a, ru) in by.items()
               if p.startswith("/private/public")]
        assert pub and all(a and ru == "/private/public*" for a, ru in pub)
        sec = [(a, ru) for (h, p), (a, ru) in by.items()
               if p.startswith("/private/sec")]
        assert sec and all(
            not a and ru == "/private/*" for a, ru in sec
        )
        # '$' anchor: .pdf blocked, .pdfx not
        pdf = [(a, ru) for (h, p), (a, ru) in by.items()
               if p.endswith(".pdf")]
        assert pdf and all(not a and ru == "/*.pdf$" for a, ru in pdf)
        pdfx = [(a, ru) for (h, p), (a, ru) in by.items()
                if p.endswith(".pdfx")]
        assert pdfx and all(a and ru == "/" for a, ru in pdfx)
        # host-scoped rule: /site/* blocked on even hosts only
        for (h, p), (a, ru) in by.items():
            if p.startswith("/site/"):
                if int(h[1:]) % 2 == 0:
                    assert not a and ru == "/site/*$", (h, p)
                else:
                    assert a and ru == "/", (h, p)

    def test_python_rfc_mirror(self, spark):
        """Verdicts equal a from-scratch python RFC 9309 evaluator."""
        import re

        rows = QUERIES["robots_rfc_match"].fn(spark, SF_SMALL).collect()

        def rules_for(host):
            rs = [("/private/*", False), ("/private/public*", True),
                  ("/*.pdf$", False), ("/", True)]
            if int(host[1:]) % 2 == 0:
                rs.append(("/site/*$", False))
            return rs

        def verdict(host, path):
            best = None  # (plen, allow_first, pattern, allow)
            for pat, allow in rules_for(host):
                body = pat[:-1] if pat.endswith("$") else pat
                rx = "^" + re.escape(body).replace(r"\*", ".*")
                if pat.endswith("$"):
                    rx += "$"
                if re.search(rx, path):
                    key = (-len(pat), 0 if allow else 1, pat)
                    if best is None or key < best[0]:
                        best = (key, pat, allow)
            if best is None:
                return (True, None)
            return (best[2], best[1])

        for r in rows:
            a, ru = verdict(r.host, r.path)
            assert (r.allowed, r.rule) == (a, ru), (r.host, r.path)


class TestHarmonicCentrality:
    def test_matches_python_and_sketch_tracks(self, spark):
        from collections import defaultdict

        from edgar_crawler_spark.queries import _event_edges

        edges = [
            (r.src, r.dst)
            for r in _event_edges(spark, SF_SMALL, cache=False).collect()
        ]
        radj = defaultdict(set)
        nodes = set()
        for s, d in edges:
            radj[d].add(s)
            nodes |= {s, d}

        def h_exact(v, cap=3):
            seen, frontier, h = {v}, {v}, 0.0
            for depth in range(1, cap + 1):
                nxt = set()
                for u in frontier:
                    nxt |= radj[u] - seen
                if not nxt:
                    break
                seen |= nxt
                h += len(nxt) / depth
                frontier = nxt
            return h

        rows = QUERIES["harmonic_centrality"].fn(spark, SF_SMALL).collect()
        assert len(rows) == 20
        want = sorted(
            ((round(h_exact(v), 4), v) for v in nodes),
            key=lambda t: (-t[0], t[1]),
        )[:20]
        got = [(r.h_exact, r.node) for r in rows]
        assert got == [(h, v) for h, v in want]
        for r in rows:
            # HyperBall estimate within sketch error of the truth
            assert abs(r.h_est - r.h_exact) / max(r.h_exact, 1) < 0.35, r


class TestVocabCoverage:
    def test_matches_python_mirror(self, spark):
        import duckdb
        from collections import Counter

        rows = duckdb.sql(
            f"SELECT lower(text) FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
        bigs = Counter()
        for (t,) in rows:
            ws = [x for x in t.split() if x]
            bigs.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        ordered = sorted(bigs.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(bigs.values())
        got = {
            r.k: (r.n_vocab, r.covered_cnt, r.total_cnt, r.coverage)
            for r in QUERIES["vocab_coverage"].fn(spark, SF_SMALL).collect()
        }
        for k in (10, 100, 1000, 10000):
            head = ordered[:k]
            cov = sum(c for _, c in head)
            assert got[k][:3] == (len(head), cov, total), k
        # curve is monotone and ends at full coverage on a
        # bounded-vocab fixture
        ks = sorted(got)
        assert all(
            got[a][3] <= got[b][3] for a, b in zip(ks, ks[1:])
        )


class TestNgramDiversity:
    def test_ratio_laws_and_mirror(self, spark):
        rows = QUERIES["ngram_diversity"].fn(spark, SF_SMALL).collect()
        by = {(r.source, r.n): r for r in rows}
        assert len(by) == 60  # 20 sources x n in {1,2,3}
        for (s, n), r in by.items():
            assert 0 < r.n_distinct <= r.n_grams
            # templated synthetic text: diversity must rise with n
            if (s, n + 1) in by:
                assert by[(s, n + 1)].distinct_ratio >= r.distinct_ratio


class TestOpicCash:
    def test_cash_conserved_and_history_accumulates(self, spark):
        from edgar_crawler_spark.queries import opic_state

        for iters in (1, 3):
            s = opic_state(spark, SF_SMALL, iters).agg(
                F.sum("c").alias("tc"), F.sum("h").alias("th")
            ).collect()[0]
            # synchronous OPIC conserves total cash at 1.0 every round
            # and banks exactly one unit into history per round (up to
            # the 10-dp per-round rounding drift)
            assert abs(s.tc - 1.0) < 1e-6, (iters, s.tc)
            assert abs(s.th - float(iters)) < 1e-6, (iters, s.th)

    def test_matches_python_mirror(self, spark):
        import duckdb

        from edgar_crawler_spark.queries import _PR_MOD, QUERIES

        edges = duckdb.sql(
            f"""SELECT DISTINCT user_id % {_PR_MOD},
                       (user_id * 7 + event_id) % {_PR_MOD}
                FROM '{SF_SMALL}/events.parquet'
                WHERE user_id % {_PR_MOD}
                      <> (user_id * 7 + event_id) % {_PR_MOD}"""
        ).fetchall()
        nodes = sorted({u for e in edges for u in e})
        out: dict[int, list[int]] = {}
        for s, d in edges:
            out.setdefault(s, []).append(d)
        n = float(len(nodes))
        c = {u: round(1.0 / n, 10) for u in nodes}
        h = {u: 0.0 for u in nodes}
        for _ in range(3):
            nxt = {u: 0.0 for u in nodes}
            dangling = sum(c[u] for u in nodes if u not in out)
            for u, ds in out.items():
                for d in ds:
                    nxt[d] += c[u] / len(ds)
            for u in nodes:
                h[u] = round(h[u] + c[u], 10)
                c[u] = round(nxt[u] + dangling / n, 10)
        th = sum(h.values())
        exp = sorted(
            (
                (u, round((h[u] + c[u]) / (th + 1.0), 6))
                for u in nodes
            ),
            key=lambda t: (-t[1], t[0]),
        )[:20]
        got = [
            (r.node, r.importance)
            for r in QUERIES["opic_cash"].fn(spark, SF_SMALL).collect()
        ]
        # same set and same importance values (float sum order across
        # nodes may differ in th at 1e-16; values are 6-dp rounded)
        assert {g[0] for g in got} == {e[0] for e in exp}
        assert dict(got) == dict(exp)


class TestBlockMaxIndex:
    def test_matches_python_mirror(self, spark):
        import math

        import duckdb

        rows = duckdb.sql(
            f"SELECT doc_id, lower(text) "
            f"FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
        tf: dict[tuple[str, int], int] = {}
        for doc_id, t in rows:
            for w in t.split():
                if w:
                    tf[(w, doc_id)] = tf.get((w, doc_id), 0) + 1
        df: dict[str, int] = {}
        for (w, _), _c in tf.items():
            df[w] = df.get(w, 0) + 1
        n = float(len(rows))
        exp: dict[tuple[str, int], list] = {}
        for (w, doc_id), c in tf.items():
            b = doc_id // 64
            wgt = round(c * math.log(n / df[w]), 6)
            e = exp.setdefault((w, b), [0, 10**18, -1, float("-inf")])
            e[0] += 1
            e[1] = min(e[1], doc_id)
            e[2] = max(e[2], doc_id)
            e[3] = max(e[3], wgt)
        got = {
            (r.term, r.block): [
                r.n_postings, r.min_doc, r.max_doc, r.block_max_w
            ]
            for r in QUERIES["block_max_index"].fn(spark, SF_SMALL).collect()
        }
        assert got == {k: list(v) for k, v in exp.items()}
        # structural law: block docid bounds live inside the block span
        for (w, b), (_, lo, hi, _w) in got.items():
            assert b * 64 <= lo <= hi < (b + 1) * 64


class TestLshDeltaPairs:
    def test_delta_endpoint_and_subset_of_full_run(self, spark):
        from edgar_crawler_spark.operators import dedup as D
        from edgar_crawler_spark.tables import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        delta = {
            (r.id_a, r.id_b): r.jaccard
            for r in QUERIES["lsh_delta_pairs"].fn(spark, SF_SMALL).collect()
        }
        assert delta  # non-trivial at sf0.001
        # every pair touches the delta (doc_id % 10 >= 8)
        for a, b in delta:
            assert a % 10 >= 8 or b % 10 >= 8, (a, b)
        full = {
            (r.id_a, r.id_b): r.jaccard
            for r in D.minhash_lsh_pairs(
                docs, k=12, bands=6, jaccard_threshold=0.6, ngram=2
            ).collect()
        }
        # the incremental run is EXACTLY the full run restricted to
        # pairs with a delta endpoint: no pair lost, none invented
        want = {
            p: j for p, j in full.items()
            if p[0] % 10 >= 8 or p[1] % 10 >= 8
        }
        assert delta == want


class TestAnnPqAdc:
    def test_matches_python_mirror_and_recall(self, spark):
        import duckdb

        rows = duckdb.sql(
            f"SELECT vec_id, embedding "
            f"FROM '{SF_SMALL}/embeddings.parquet'"
        ).fetchall()
        vecs = {int(v): [float(x) for x in e] for v, e in rows}
        seeds = sorted(
            vecs,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:16]
        m, sub = 8, 8
        books = [
            [vecs[s][sp * sub:(sp + 1) * sub] for s in seeds]
            for sp in range(m)
        ]
        qv = vecs[0]
        lut = [
            [
                round(
                    sum(
                        (qv[sp * sub + d] - books[sp][j][d]) ** 2
                        for d in range(sub)
                    ),
                    10,
                )
                for j in range(16)
            ]
            for sp in range(m)
        ]

        def code(v: list[float], sp: int) -> int:
            return min(
                range(16),
                key=lambda j: (
                    sum(
                        (v[sp * sub + d] - books[sp][j][d]) ** 2
                        for d in range(sub)
                    ),
                    j,
                ),
            )

        exp = sorted(
            (
                (
                    vid,
                    round(
                        sum(lut[sp][code(v, sp)] for sp in range(m)), 6
                    ),
                )
                for vid, v in vecs.items()
                if vid != 0
            ),
            key=lambda t: (t[1], t[0]),
        )[:20]
        got = [
            (r.vec_id, r.adc_dist)
            for r in QUERIES["ann_pq_adc"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp
        # recall floor vs exact squared-L2 top-20 (coarse 16-code
        # codebook; the law is a conservative sanity bound)
        def l2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        exact = sorted(
            ((vid, l2(v, qv)) for vid, v in vecs.items() if vid != 0),
            key=lambda t: (t[1], t[0]),
        )[:20]
        overlap = {g[0] for g in got} & {e[0] for e in exact}
        assert len(overlap) >= 5, sorted(overlap)


class TestSpamMass:
    def test_matches_python_mirror_and_laws(self, spark):
        import duckdb

        from edgar_crawler_spark.queries import (
            _PR_D,
            _PR_MOD,
            _TR_SEED_MOD,
            QUERIES,
        )

        edges = duckdb.sql(
            f"""SELECT DISTINCT user_id % {_PR_MOD},
                       (user_id * 7 + event_id) % {_PR_MOD}
                FROM '{SF_SMALL}/events.parquet'
                WHERE user_id % {_PR_MOD}
                      <> (user_id * 7 + event_id) % {_PR_MOD}"""
        ).fetchall()
        nodes = sorted({u for e in edges for u in e})
        out: dict[int, list[int]] = {}
        for s, d in edges:
            out.setdefault(s, []).append(d)
        n = float(len(nodes))
        seeds = [u for u in nodes if u % _TR_SEED_MOD == 0]
        sv = {u: (1.0 / len(seeds) if u in seeds else 0.0) for u in nodes}

        def power(r0, teleport):
            r = dict(r0)
            for _ in range(3):
                nxt = {u: 0.0 for u in nodes}
                dangling = sum(r[u] for u in nodes if u not in out)
                for u, ds in out.items():
                    for d in ds:
                        nxt[d] += r[u] / len(ds)
                r = {
                    u: round(
                        (1.0 - _PR_D) * teleport[u]
                        + _PR_D * (nxt[u] + dangling * teleport[u]),
                        10,
                    )
                    for u in nodes
                }
            return r

        uni = {u: 1.0 / n for u in nodes}
        pr = power({u: round(1.0 / n, 10) for u in nodes}, uni)
        tr = power({u: round(sv[u], 10) for u in nodes}, sv)
        scale = sum(pr.values()) / sum(tr.values())
        exp = sorted(
            (
                (u, round((pr[u] - tr[u] * scale) / pr[u], 6))
                for u in nodes
            ),
            key=lambda t: (-t[1], t[0]),
        )[:20]
        rows = QUERIES["spam_mass"].fn(spark, SF_SMALL).collect()
        got = [(r.node, r.spam_mass) for r in rows]
        assert got == exp
        for r in rows:
            # all PR mass not from the trusted core: bounded above by 1,
            # and exactly 1 when NO trust reaches the node
            assert r.spam_mass <= 1.0 + 1e-9
            if r.tr == 0.0:
                assert r.spam_mass == 1.0


class TestWarcRangeCoalesce:
    def test_partition_laws_and_byte_conservation(self, spark):
        from edgar_crawler_spark.queries import _RC_GAP, QUERIES

        rows = QUERIES["warc_range_coalesce"].fn(spark, SF_SMALL).collect()
        assert rows
        by_file: dict[str, list] = {}
        for r in rows:
            assert r.n_records >= 1
            assert r.range_start < r.range_end
            assert r.wasted_bytes >= 0
            by_file.setdefault(r.warc_file, []).append(r)
        for f, bs in by_file.items():
            bs.sort(key=lambda r: r.range_start)
            for a, b in zip(bs, bs[1:]):
                # batches are disjoint AND separated by more than the
                # bridgeable gap (otherwise they'd have been merged)
                assert b.range_start - a.range_end > _RC_GAP, (f, a, b)
        # every wanted record lands in exactly one batch, and bytes
        # conserve: span - waste == wanted payload bytes per the CDX
        cdx = QUERIES["cdx_index_build"].fn(spark, SF_SMALL).collect()
        wanted = [
            c for c in cdx
            if int(c.surt.split("/doc/")[1]) % 7 < 3
        ]
        assert sum(r.n_records for r in rows) == len(wanted)
        assert (
            sum(r.range_end - r.range_start - r.wasted_bytes for r in rows)
            == sum(c.rec_length for c in wanted)
        )


class TestEffectiveDiameter:
    def test_interpolation_matches_python_mirror(self, spark):
        from edgar_crawler_spark.queries import hyperanf_rows

        curve = [
            (r.t, r.est_sum)
            for r in hyperanf_rows(
                spark, SF_SMALL, with_exact=False
            ).collect()
        ]
        target = 0.9 * curve[-1][1]
        exp = None
        for (t, nf), (_, prev) in zip(curve, [(None, None)] + curve[:-1]):
            if nf >= target:
                exp = (
                    float(t)
                    if prev is None
                    else t - 1 + (target - prev) / (nf - prev)
                )
                break
        row = QUERIES["effective_diameter"].fn(spark, SF_SMALL).collect()[0]
        assert row.t_hit == next(t for t, nf in curve if nf >= target)
        assert row.nf_target == round(target, 4)
        assert abs(row.eff_diameter - exp) < 5e-4

    def test_diameter_bounded_by_radius_and_monotone_target(self, spark):
        from edgar_crawler_spark.queries import _ANF_T

        row = QUERIES["effective_diameter"].fn(spark, SF_SMALL).collect()[0]
        # the 90% point lies inside the computed radius window, and the
        # N(t) curve is monotone so interpolation never extrapolates
        assert 0.0 <= row.eff_diameter <= _ANF_T
        assert row.t_hit <= _ANF_T
        assert row.eff_diameter <= row.t_hit
