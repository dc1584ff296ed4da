"""Round-4f operators: SALSA link analysis, co-citation related
pages, Good-Turing unseen mass, per-doc tf-idf keywords, rendezvous
(HRW) shard assignment, effective diameter (see test_round4e_ops).

Cross-engine value agreement is covered by the DuckDB oracles
(tools/check_oracles.py); these pin the laws the oracle cannot see —
python mirrors of the algorithms, conservation/zero-churn invariants,
and the hash placement contract.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from edgar_crawler_spark.queries import (
    _CO_CAP,
    _CO_TOPK,
    _HRW_AFTER,
    _HRW_BEFORE,
    _KW_PER_DOC,
    _KW_TOPK,
    _SALSA_ITERS,
    _SALSA_TOPK,
    QUERIES,
    _event_edges,
)

SF_SMALL = "/root/testdata/sf0.001"


def _edges(spark):
    return [
        (r.src, r.dst)
        for r in _event_edges(spark, SF_SMALL, cache=False).collect()
    ]


class TestSalsa:
    def test_matches_python_mirror(self, spark):
        edges = _edges(spark)
        nodes = sorted({u for e in edges for u in e})
        indeg = Counter(d for _, d in edges)
        outdeg = Counter(s for s, _ in edges)
        auth = {n: 1.0 for n in nodes}
        hub = {}
        for _ in range(_SALSA_ITERS):
            h = defaultdict(float)
            for s, d in edges:
                h[s] += auth[d] / indeg[d]
            hs = sum(h.values())
            hub = {n: round(h.get(n, 0.0) / hs, 10) for n in nodes}
            a = defaultdict(float)
            for s, d in edges:
                a[d] += hub[s] / outdeg[s]
            asum = sum(a.values())
            auth = {n: round(a.get(n, 0.0) / asum, 10) for n in nodes}
        exp = sorted(
            ((n, round(auth[n], 6), round(hub[n], 6)) for n in nodes),
            key=lambda t: (-t[1], t[0]),
        )[:_SALSA_TOPK]
        got = [
            (r.node, r.authority, r.hub)
            for r in QUERIES["salsa_scores"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp

    def test_degree_normalization_differs_from_hits(self, spark):
        # SALSA's whole point: scores are NOT the raw HITS mass.
        # On this graph the two must produce different top-k value
        # sets (if they coincided, the /indeg /outdeg weights were
        # silently dropped).
        salsa = {
            r.node: (r.authority, r.hub)
            for r in QUERIES["salsa_scores"].fn(spark, SF_SMALL).collect()
        }
        hits = {
            r.node: (r.authority, r.hub)
            for r in QUERIES["hits_scores"].fn(spark, SF_SMALL).collect()
        }
        shared = set(salsa) & set(hits)
        assert any(salsa[n] != hits[n] for n in shared)


class TestCocitationPairs:
    def test_matches_python_mirror(self, spark):
        edges = _edges(spark)
        outdeg = Counter(s for s, _ in edges)
        by_src = defaultdict(list)
        for s, d in edges:
            if outdeg[s] <= _CO_CAP:
                by_src[s].append(d)
        cnt = Counter()
        for s, ds in by_src.items():
            ds = sorted(ds)
            for i, v in enumerate(ds):
                for w in ds[i + 1:]:
                    cnt[(v, w)] += 1
        exp = sorted(
            ((v, w, c) for (v, w), c in cnt.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[:_CO_TOPK]
        got = [
            (r.v, r.w, r.cocites)
            for r in QUERIES["cocitation_pairs"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp
        # the fanout cap is live on this graph: some sources dropped
        assert any(d > _CO_CAP for d in outdeg.values())
        assert by_src  # ...and some kept

    def test_pair_canonical_order_and_bound(self, spark):
        rows = QUERIES["cocitation_pairs"].fn(spark, SF_SMALL).collect()
        assert rows
        n_kept_sources = len({
            s for s, c in Counter(
                s for s, _ in _edges(spark)
            ).items() if c <= _CO_CAP
        })
        for r in rows:
            assert r.v < r.w
            # a pair cannot be co-cited more often than there are
            # kept citing pages
            assert 1 <= r.cocites <= n_kept_sources


class TestGtUnseenMass:
    def test_matches_python_mirror(self, spark):
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
            "source", "text"
        ).collect()
        freq: dict[str, Counter] = defaultdict(Counter)
        for r in docs:
            freq[r.source].update(r.text.lower().split())
        exp = []
        for src in sorted(freq):
            c = freq[src]
            n = sum(c.values())
            n1 = sum(1 for v in c.values() if v == 1)
            n2 = sum(1 for v in c.values() if v == 2)
            exp.append((src, n, len(c), n1, n2, round(n1 / n, 6)))
        got = [
            (r.source, r.n_tokens, r.vocab, r.hapax, r.dis,
             r.unseen_mass)
            for r in QUERIES["gt_unseen_mass"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp

    def test_mass_laws(self, spark):
        for r in QUERIES["gt_unseen_mass"].fn(spark, SF_SMALL).collect():
            assert r.hapax <= r.vocab <= r.n_tokens
            assert 0.0 <= r.unseen_mass <= 1.0
            assert r.hapax + 2 * r.dis <= r.n_tokens


class TestTfidfKeywords:
    def test_matches_python_mirror(self, spark):
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
            "doc_id", "text"
        ).collect()
        tf = {
            r.doc_id: Counter(r.text.lower().split()) for r in docs
        }
        n_docs = float(len(tf))
        df = Counter(t for c in tf.values() for t in c)
        per_doc = []
        for d, c in tf.items():
            scored = sorted(
                (
                    (round(v * math.log(n_docs / df[t]), 6), t)
                    for t, v in c.items()
                ),
                key=lambda x: (-x[0], x[1]),
            )[:_KW_PER_DOC]
            per_doc.extend(
                (d, t, s, i + 1) for i, (s, t) in enumerate(scored)
            )
        exp = sorted(per_doc, key=lambda r: (-r[2], r[0], r[1]))[:_KW_TOPK]
        got = [
            (r.doc_id, r.term, r.tfidf, r.rnk)
            for r in QUERIES["tfidf_keywords"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp

    def test_rank_bounds(self, spark):
        rows = QUERIES["tfidf_keywords"].fn(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 1 <= r.rnk <= _KW_PER_DOC
            assert r.tfidf > 0.0


class TestRendezvousAssign:
    def test_placement_matches_hash_contract(self, spark):
        # full python HRW mirror over every doc key
        doc_ids = [
            r.doc_id
            for r in spark.read.parquet(
                f"{SF_SMALL}/documents.parquet"
            ).select("doc_id").collect()
        ]

        def wt(k: str, s: int) -> int:
            return int(
                hashlib.md5(f"hrw|{k}|{s}".encode()).hexdigest()[:15], 16
            )

        before = Counter()
        after = Counter()
        moved = Counter()
        for d in doc_ids:
            k = f"doc{d}"
            a8 = max(range(_HRW_BEFORE), key=lambda s: (wt(k, s), s))
            a9 = max(range(_HRW_AFTER), key=lambda s: (wt(k, s), s))
            before[a8] += 1
            after[a9] += 1
            if a8 != a9:
                moved[a9] += 1
        got = {
            r.shard: (r.n_before, r.n_after, r.moved_in)
            for r in QUERIES["rendezvous_assign"].fn(spark, SF_SMALL).collect()
        }
        exp = {
            s: (before.get(s, 0), after.get(s, 0), moved.get(s, 0))
            for s in set(before) | set(after)
        }
        assert got == exp

    def test_minimal_disruption_law(self, spark):
        rows = QUERIES["rendezvous_assign"].fn(spark, SF_SMALL).collect()
        n = sum(r.n_before for r in rows)
        assert n == sum(r.n_after for r in rows) > 0
        for r in rows:
            if r.shard < _HRW_BEFORE:
                # HRW's defining law: a pre-existing shard NEVER
                # receives keys on grow — only the new shard does
                assert r.moved_in == 0
                # ...and never grows
                assert r.n_after <= r.n_before
            else:
                assert r.moved_in == r.n_after
        total_moved = sum(r.moved_in for r in rows)
        # expected churn is n/9; allow generous binomial slack
        assert 0.02 * n < total_moved < 0.35 * n


class TestWandTopk:
    @staticmethod
    def _postings(spark):
        from edgar_crawler_spark.queries import _WAND_TERMS, _t
        from edgar_crawler_spark.operators import dedup as D  # noqa: PLC0415
        from pyspark.sql import functions as F  # noqa: PLC0415

        docs = _t(spark, SF_SMALL, "documents")
        tf = (
            docs.select(
                "doc_id", F.explode_outer(D.tokens_col("text")).alias("t")
            )
            .filter(F.col("t").isin(*_WAND_TERMS))
            .groupBy("doc_id", "t")
            .agg(F.count(F.lit(1)).alias("tf"))
            .collect()
        )
        n = docs.count()
        df = Counter(r.t for r in tf)
        return [
            (r.doc_id, r.t, round(r.tf * math.log(n / df[r.t]), 6))
            for r in tf
        ]

    def test_equals_unpruned_exact_topk(self, spark):
        from edgar_crawler_spark.queries import _WAND_K

        rows = self._postings(spark)
        total = defaultdict(float)
        nterms = Counter()
        for d, _, w in rows:
            total[d] += w
            nterms[d] += 1
        exp = sorted(
            ((d, round(s, 6), nterms[d]) for d, s in total.items()),
            key=lambda t: (-t[1], t[0]),
        )[:_WAND_K]
        got = [
            (r.doc_id, r.score, r.n_terms)
            for r in QUERIES["wand_topk"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp

    def test_threshold_safe_and_pruning_live(self, spark):
        from edgar_crawler_spark.queries import _WAND_BLOCK, _WAND_K

        rows = self._postings(spark)
        mx = defaultdict(float)
        total = defaultdict(float)
        bm = defaultdict(float)
        for d, t, w in rows:
            mx[d] = max(mx[d], w)
            total[d] += w
            bm[(t, d // _WAND_BLOCK)] = max(bm[(t, d // _WAND_BLOCK)], w)
        theta = sorted(mx.values(), reverse=True)[_WAND_K - 1]
        kth_total = sorted(total.values(), reverse=True)[_WAND_K - 1]
        # safety: total(d) >= max_term(d) pointwise => theta is a
        # lower bound on the k-th best total, so ub<theta skips are exact
        assert theta <= kth_total
        ub = defaultdict(float)
        for (t, b), w in bm.items():
            ub[b] += w
        pruned = [b for b, u in ub.items() if u < theta]
        # the op must actually skip blocks on this corpus — a zero-
        # pruned configuration is the trivially-correct trap
        assert len(pruned) >= len(ub) // 4, (len(pruned), len(ub))
        # and every doc in a pruned block indeed cannot reach the top-k
        for d, s in total.items():
            if (d // _WAND_BLOCK) in set(pruned):
                assert s <= ub[d // _WAND_BLOCK] < theta <= kth_total


class TestHeapsLaw:
    def test_matches_python_mirror(self, spark):
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
            "source", "text"
        ).collect()
        freq: dict[str, Counter] = defaultdict(Counter)
        for r in docs:
            freq[r.source].update(r.text.lower().split())
        pts = [
            (math.log(sum(c.values())), math.log(len(c)))
            for c in freq.values()
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        row = QUERIES["heaps_law"].fn(spark, SF_SMALL).collect()[0]
        assert row.n_points == n
        assert abs(row.beta - beta) < 5e-4
        assert abs(row.ln_k - (sy - beta * sx) / n) < 5e-4

    def test_saturated_vocabulary_flattens_beta(self, spark):
        # the fixture's 31-token vocabulary is saturated in every
        # source, so the fitted growth exponent must sit far below
        # natural text's ~0.5 — the diagnostic reading the op exists for
        row = QUERIES["heaps_law"].fn(spark, SF_SMALL).collect()[0]
        assert row.beta < 0.2


class TestShingleNovelty:
    def test_matches_python_mirror(self, spark):
        from edgar_crawler_spark.queries import (
            _NOV_DELTA_MIN,
            _NOV_DELTA_MOD,
        )

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
            "doc_id", "source", "text"
        ).collect()

        def bigrams(text):
            w = text.lower().split()
            return {f"{a} {b}" for a, b in zip(w, w[1:])}

        base: set[str] = set()
        delta: dict[str, set] = defaultdict(set)
        for r in docs:
            if r.doc_id % _NOV_DELTA_MOD < _NOV_DELTA_MIN:
                base |= bigrams(r.text)
            else:
                delta[r.source] |= bigrams(r.text)
        exp = sorted(
            (
                src,
                len(g),
                len(g - base),
                round(len(g - base) / len(g), 6),
            )
            for src, g in delta.items()
            if g
        )
        got = [
            (r.source, r.n_delta, r.n_novel, r.novelty)
            for r in QUERIES["shingle_novelty"].fn(spark, SF_SMALL).collect()
        ]
        assert got == exp
        # non-trivial on the fixture: some delta shingles ARE novel
        # and some are already in the base
        assert any(r[2] > 0 for r in got)
        assert any(r[2] < r[1] for r in got)
