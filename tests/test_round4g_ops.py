"""Round-4g operators: CCNet-style reference-LM perplexity buckets,
fastText-style hashed linear quality classifier, Elias-Fano postings
size model.

Cross-engine value agreement is covered by the DuckDB oracles
(tools/check_oracles.py); these pin the laws the oracle cannot see —
python mirrors of the algorithms, bucket non-degeneracy, the
reference-corpus sanity direction, and the integer-exact bit-width
contract.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from edgar_crawler_spark.queries import (
    _CCNET_A,
    _CCNET_HEAD,
    _CCNET_MID,
    _CCNET_REF_SRC,
    _HCLS_B,
    _HCLS_SCALE,
    _LR_B,
    _LR_EPS,
    _LR_ETA,
    _LR_RDP,
    _LR_STEPS,
    _BC_BENCH_MOD,
    _BC_FLAG,
    _CDC_MOD,
    _FCF_MAX_TOPSHARE,
    _FCF_MIN_DIVERSITY,
    _FCF_MIN_TOKENS,
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    QUERIES,
)

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )


class TestCcnetPplBuckets:
    @staticmethod
    def _mirror(docs):
        bg = []  # (doc_id, source, w1, w2)
        for r in docs:
            w = r.text.lower().split()
            for a, b in zip(w, w[1:]):
                bg.append((r.doc_id, r.source, a, b))
        ref = [(w1, w2) for _, s, w1, w2 in bg if s == _CCNET_REF_SRC]
        c2 = Counter(ref)
        c1 = Counter(w1 for w1, _ in ref)
        v = len({w for p in ref for w in p})
        dx = defaultdict(list)
        src = {}
        for d, s, w1, w2 in bg:
            dx[d].append(
                -math.log(
                    (c2.get((w1, w2), 0) + _CCNET_A)
                    / (c1.get(w1, 0) + _CCNET_A * v)
                )
            )
            src[d] = s
        x = {d: round(sum(t) / len(t), 6) for d, t in dx.items()}
        m = round(
            sum(x[d] for d in x if src[d] == _CCNET_REF_SRC)
            / sum(1 for d in x if src[d] == _CCNET_REF_SRC),
            6,
        )
        out = defaultdict(list)
        for d, xx in x.items():
            if xx <= round(m * _CCNET_HEAD, 6):
                b = "head"
            elif xx <= round(m * _CCNET_MID, 6):
                b = "middle"
            else:
                b = "tail"
            out[b].append((d, src[d], xx))
        return out

    def test_matches_python_mirror(self, spark):
        out = self._mirror(_docs(spark))
        exp = sorted(
            (
                b,
                len(rows),
                len({s for _, s, _ in rows}),
                round(sum(x for _, _, x in rows) / len(rows), 6),
            )
            for b, rows in out.items()
        )
        got = [
            (r.bucket, r.n_docs, r.n_sources, r.mean_xent)
            for r in QUERIES["ccnet_ppl_buckets"].fn(spark, SF_SMALL).collect()
        ]
        assert [g[:3] for g in got] == [e[:3] for e in exp]
        for g, e in zip(got, exp):
            assert abs(g[3] - e[3]) < 2e-6

    def test_buckets_nondegenerate_and_ref_is_head(self, spark):
        out = self._mirror(_docs(spark))
        # all three quality tiers must be populated on the fixture —
        # a single-bucket green would be the trivially-correct trap
        assert set(out) == {"head", "middle", "tail"}
        # the reference corpus must score itself into the head
        # (CCNet's sanity direction: the LM likes its own domain)
        ref_rows = [
            b
            for b, rows in out.items()
            for _, s, _ in rows
            if s == _CCNET_REF_SRC
        ]
        assert ref_rows and all(b == "head" for b in ref_rows)
        # and the tail must contain only non-reference docs with
        # strictly higher xent than every reference doc
        ref_max = max(
            x
            for rows in out.values()
            for _, s, x in rows
            if s == _CCNET_REF_SRC
        )
        assert all(x > ref_max for _, _, x in out["tail"])


class TestHashedClassifierScore:
    @staticmethod
    def _score(text: str) -> float:
        toks = text.lower().split()
        feats = toks + [f"{a}|{b}" for a, b in zip(toks, toks[1:])]
        ws = []
        for t in feats:
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _HCLS_B
            ws.append(((b * 37 + 11) % 101 - 50) / 100.0)
        aw = sum(ws) / len(ws)
        return 1.0 / (1.0 + math.exp(-_HCLS_SCALE * aw))

    def test_matches_python_mirror(self, spark):
        per_src = defaultdict(list)
        for r in _docs(spark):
            per_src[r.source].append(self._score(r.text))
        exp = {
            s: (
                len(v),
                sum(1 for x in v if x >= 0.5),
                round(sum(1 for x in v if x >= 0.5) / len(v), 6),
                round(sum(v) / len(v), 6),
            )
            for s, v in per_src.items()
        }
        rows = QUERIES["hashed_classifier_score"].fn(spark, SF_SMALL).collect()
        assert {r.source for r in rows} == set(exp)
        for r in rows:
            e = exp[r.source]
            assert (r.n_docs, r.n_keep) == e[:2]
            assert abs(r.keep_rate - e[2]) < 1e-9
            assert abs(r.mean_score - e[3]) < 2e-6

    def test_split_is_nontrivial(self, spark):
        rows = QUERIES["hashed_classifier_score"].fn(spark, SF_SMALL).collect()
        total = sum(r.n_docs for r in rows)
        kept = sum(r.n_keep for r in rows)
        # the classifier must actually separate: some kept, some dropped
        assert 0 < kept < total


class TestEfPostingsSize:
    def test_matches_python_mirror(self, spark):
        docs = _docs(spark)
        n = len(docs)
        post = {(t, r.doc_id) for r in docs for t in r.text.lower().split()}
        df = Counter(t for t, _ in post)
        bands = defaultdict(lambda: [0, 0, 0, 0])
        for t, d in df.items():
            g = n // d
            l = g.bit_length()
            b = bands[l]
            b[0] += 1
            b[1] += d
            b[2] += d * (l + 1)
            b[3] += d * 8 * ((l + 6) // 7)
        exp = [
            (
                l,
                b[0],
                b[1],
                b[2],
                b[3],
                round(b[2] / b[1], 6),
                round(b[3] / b[1], 6),
            )
            for l, b in sorted(bands.items())
        ]
        rows = QUERIES["ef_postings_size"].fn(spark, SF_SMALL).collect()
        got = [
            (r.gap_bits, r.n_terms, r.n_postings, r.ef_bits, r.vb_bits,
             r.ef_bpp, r.vb_bpp)
            for r in rows
        ]
        assert got == exp

    def test_ef_beats_varint_on_dense_postings(self, spark):
        # for small gaps (dense terms) EF ~ log2(gap)+2 bits/posting
        # while varint can never go below 8 — the codec-choice signal
        rows = QUERIES["ef_postings_size"].fn(spark, SF_SMALL).collect()
        dense = [r for r in rows if r.gap_bits <= 5]
        assert dense
        for r in dense:
            assert r.ef_bpp < r.vb_bpp
            # bit-width contract: bpp = gap_bits + 1 exactly
            assert abs(r.ef_bpp - (r.gap_bits + 1)) < 1e-9


class TestLogregQualityTrain:
    @staticmethod
    def _mirror(docs):
        """Dense-python GD twin of the sparse+rank-1 Spark loop."""
        X = []
        y = []
        for r in docs:
            toks = r.text.lower().split()
            feats = toks + [f"{a}|{b}" for a, b in zip(toks, toks[1:])]
            c = Counter(
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _LR_B
                for t in feats
            )
            n = sum(c.values())
            X.append({b: k / n for b, k in c.items()})
            y.append(1.0 if int(r.source[3:]) < 10 else 0.0)
        nd = len(X)
        buckets = sorted({b for row in X for b in row})
        mu = {b: sum(row.get(b, 0.0) for row in X) / nd for b in buckets}
        sd = {
            b: math.sqrt(
                sum(row.get(b, 0.0) ** 2 for row in X) / nd - mu[b] ** 2
            )
            + _LR_EPS
            for b in buckets
        }
        w = {b: 0.0 for b in buckets}
        c0 = 0.0
        hist = []
        for _k in range(_LR_STEPS + 1):
            ps = []
            for row, yy in zip(X, y):
                m = (
                    sum(
                        w[b] * (row.get(b, 0.0) - mu[b]) / sd[b]
                        for b in buckets
                    )
                    + c0
                )
                ps.append(1.0 / (1.0 + math.exp(-m)))
            ll = -sum(
                yy * math.log(p) + (1 - yy) * math.log(1 - p)
                for p, yy in zip(ps, y)
            ) / nd
            acc = sum(
                1.0 for p, yy in zip(ps, y) if (p >= 0.5) == (yy == 1.0)
            ) / nd
            hist.append((round(ll, 6), round(acc, 6)))
            if _k == _LR_STEPS:
                break
            es = sum(p - yy for p, yy in zip(ps, y)) / nd
            gw = {
                b: sum(
                    (p - yy) * (row.get(b, 0.0) - mu[b]) / sd[b]
                    for row, p, yy in zip(X, ps, y)
                )
                / nd
                for b in buckets
            }
            w = {b: round(w[b] - _LR_ETA * gw[b], _LR_RDP) for b in buckets}
            c0 = round(c0 - _LR_ETA * es, _LR_RDP)
        return hist

    def test_matches_python_mirror(self, spark):
        hist = self._mirror(_docs(spark))
        rows = QUERIES["logreg_quality_train"].fn(spark, SF_SMALL).collect()
        assert [r.step for r in rows] == list(range(_LR_STEPS + 1))
        for r, (ll, acc) in zip(rows, hist):
            # dense mirror vs sparse+rank-1 Spark algebra: identical
            # math, float association differs — 6dp rounded outputs
            # may sit a last-ulp apart
            assert abs(r.logloss - ll) < 2e-6, (r.step, r.logloss, ll)
            assert abs(r.accuracy - acc) < 1e-9, (r.step, r.accuracy, acc)

    def test_training_curve_laws(self, spark):
        rows = QUERIES["logreg_quality_train"].fn(spark, SF_SMALL).collect()
        # step 0 = untrained model: logloss exactly ln 2, accuracy
        # exactly the class balance (0.5 — balanced by construction)
        assert abs(rows[0].logloss - round(math.log(2.0), 6)) < 1e-9
        assert abs(rows[0].accuracy - 0.5) < 1e-9
        # GD at the registered eta must descend monotonically
        lls = [r.logloss for r in rows]
        assert all(a > b for a, b in zip(lls, lls[1:])), lls
        # and the final model must beat the coin-flip baseline
        assert rows[-1].accuracy > 0.55


class TestMmrDiversify:
    @staticmethod
    def _pool_and_sims(spark):
        vecs = {
            r.vec_id: r.embedding
            for r in spark.read.parquet(
                f"{SF_SMALL}/embeddings.parquet"
            ).collect()
        }
        q = vecs[0]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb)

        rel = {
            v: round(cos(e, q), 6) for v, e in vecs.items() if v != 0
        }
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
        sims = {
            (a, b): round(cos(vecs[a], vecs[b]), 6)
            for a in pool
            for b in pool
            if a != b
        }
        return {v: rel[v] for v in pool}, sims

    def test_matches_python_mirror(self, spark):
        rel, sims = self._pool_and_sims(spark)
        lam, oml = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
        selected = [min(rel, key=lambda v: (-rel[v], v))]
        scores = [rel[selected[0]]]
        for _ in range(_MMR_K - 1):
            cand = {
                v: round(
                    lam * rel[v] - oml * max(sims[(v, s)] for s in selected),
                    6,
                )
                for v in rel
                if v not in selected
            }
            pick = min(cand, key=lambda v: (-cand[v], v))
            selected.append(pick)
            scores.append(cand[pick])
        rows = QUERIES["mmr_diversify"].fn(spark, SF_SMALL).collect()
        assert [r.vec_id for r in rows] == selected
        assert [r.mmr_rank for r in rows] == list(range(1, _MMR_K + 1))
        for r, s in zip(rows, scores):
            assert abs(r.mmr_score - s) < 2e-6

    def test_diversification_is_live(self, spark):
        # the MMR list must differ from the plain rel top-k — a
        # lambda/pool configuration where the penalty never changes a
        # pick would be the trivially-correct trap
        rel, _ = self._pool_and_sims(spark)
        plain = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_K]
        rows = QUERIES["mmr_diversify"].fn(spark, SF_SMALL).collect()
        got = [r.vec_id for r in rows]
        assert set(got) != set(plain)
        # scores strictly descend after rank 1 (greedy argmax path)
        sc = [r.mmr_score for r in rows[1:]]
        assert all(a >= b for a, b in zip(sc, sc[1:]))


class TestFilterCascadeFunnel:
    @staticmethod
    def _stage(text):
        c = Counter(text.lower().split())
        n = sum(c.values())
        if n < _FCF_MIN_TOKENS:
            return 1
        if max(c.values()) / n > _FCF_MAX_TOPSHARE:
            return 2
        if len(c) / n < _FCF_MIN_DIVERSITY:
            return 3
        return 4

    def test_matches_python_mirror(self, spark):
        docs = _docs(spark)
        stages = Counter(self._stage(r.text) for r in docs)
        total = len(docs)
        rows = QUERIES["filter_cascade_funnel"].fn(spark, SF_SMALL).collect()
        assert [r.stage for r in rows] == [1, 2, 3, 4]
        n_in = total
        for r in rows:
            killed = stages.get(r.stage, 0) if r.stage < 4 else 0
            assert r.n_in == n_in, (r.rule, r.n_in, n_in)
            assert r.n_killed == killed
            assert r.n_out == n_in - killed
            assert abs(r.survival - round((n_in - killed) / total, 6)) < 1e-9
            n_in -= killed

    def test_funnel_conservation_and_live_rules(self, spark):
        rows = QUERIES["filter_cascade_funnel"].fn(spark, SF_SMALL).collect()
        # conservation: each stage's output is the next stage's input,
        # and the survivors row passes everyone through
        for a, b in zip(rows, rows[1:]):
            assert a.n_out == b.n_in
        assert rows[-1].n_killed == 0
        # every rule must actually fire on the fixture — a funnel
        # where a gate kills nothing is untested configuration
        assert all(r.n_killed > 0 for r in rows[:-1])
        assert rows[-1].n_out > 0


class TestBenchmarkContainment:
    @staticmethod
    def _mirror(docs):
        def shingles(text):
            w = text.lower().split()
            return {
                hashlib.md5(f"{a} {b}".encode()).hexdigest()[:16]
                for a, b in zip(w, w[1:])
            }

        bench = {
            r.doc_id: shingles(r.text)
            for r in docs
            if r.doc_id % _BC_BENCH_MOD == 0 and len(r.text.split()) >= 2
        }
        corp = {
            r.doc_id: shingles(r.text)
            for r in docs
            if r.doc_id % _BC_BENCH_MOD != 0 and len(r.text.split()) >= 2
        }
        out = {}
        for bid, bs in bench.items():
            conts = [
                round(len(bs & cs) / len(bs), 6)
                for cs in corp.values()
                if bs & cs
            ]
            out[bid] = (
                len(bs),
                len(conts),
                sum(1 for c in conts if c >= _BC_FLAG),
                max(conts) if conts else 0.0,
            )
        return out

    def test_matches_python_mirror(self, spark):
        exp = self._mirror(_docs(spark))
        rows = QUERIES["benchmark_containment"].fn(spark, SF_SMALL).collect()
        assert {r.bench_doc for r in rows} == set(exp)
        for r in rows:
            sz, n_over, n_flag, mx = exp[r.bench_doc]
            assert r.n_shingles == sz
            assert r.n_overlapping == n_over
            assert r.n_flagged == n_flag
            assert abs(r.max_containment - mx) < 2e-6

    def test_flags_planted_contamination(self, spark):
        rows = QUERIES["benchmark_containment"].fn(spark, SF_SMALL).collect()
        # the corpus's planted duplicate family intersects the bench
        # slice: at least one bench doc must be flagged near-fully
        # contained, and the background must NOT all be flagged
        assert any(r.max_containment >= 0.9 and r.n_flagged >= 1
                   for r in rows)
        assert sum(r.n_flagged for r in rows) < sum(
            r.n_overlapping for r in rows
        )


def _cdc_chunks(tokens):
    """Reference CDC cut, matching the query's inclusive running-sum
    semantics: a boundary token STARTS a new chunk (its cid has
    already incremented), so chunks are [prefix], [b1, ...], [b2, ...]."""
    chunks, cur = [], []
    for t in tokens:
        if (
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CDC_MOD
            == 0
        ):
            if cur:
                chunks.append(cur)
            cur = [t]
        else:
            cur.append(t)
    if cur:
        chunks.append(cur)
    return chunks


class TestCdcChunkProfile:
    def test_matches_python_mirror(self, spark):
        per_src = defaultdict(list)
        for r in _docs(spark):
            for c in _cdc_chunks(r.text.lower().split()):
                per_src[r.source].append(" ".join(c))
        exp = {
            s: (
                len(v),
                len(set(v)),
                round(1.0 - len(set(v)) / len(v), 6),
                round(sum(len(c.split()) for c in v) / len(v), 6),
            )
            for s, v in per_src.items()
        }
        rows = QUERIES["cdc_chunk_profile"].fn(spark, SF_SMALL).collect()
        assert {r.source for r in rows} == set(exp)
        for r in rows:
            e = exp[r.source]
            assert (r.n_chunks, r.n_distinct) == e[:2]
            assert abs(r.dup_ratio - e[2]) < 1e-9
            assert abs(r.avg_len - e[3]) < 1e-9

    def test_insertion_robustness_vs_fixed_chunking(self):
        # THE property CDC exists for: an edit perturbs only its own
        # chunk. Prepend one token to a long synthetic doc — every
        # chunk after the first boundary must be byte-identical, while
        # fixed-size chunking shifts and loses ALL downstream chunks.
        toks = [f"w{i}" for i in range(400)]  # all-distinct stream
        orig = [" ".join(c) for c in _cdc_chunks(toks)]
        edited = [" ".join(c) for c in _cdc_chunks(["inserted"] + toks)]
        shared = set(orig) & set(edited)
        # all but the first (edited) chunk survive the insertion
        assert len(shared) >= len(orig) - 1
        fixed_orig = {
            " ".join(toks[i : i + _CDC_MOD])
            for i in range(0, len(toks), _CDC_MOD)
        }
        fixed_edit = {
            " ".join((["inserted"] + toks)[i : i + _CDC_MOD])
            for i in range(0, len(toks) + 1, _CDC_MOD)
        }
        # fixed-size chunking keeps (almost) nothing: the periodic
        # token stream aliases a few windows, never the vast majority
        assert len(fixed_orig & fixed_edit) < len(fixed_orig) // 2
        # and the CDC mean chunk length sits near the design point
        lens = [len(c.split()) for c in orig]
        assert _CDC_MOD / 2 < sum(lens) / len(lens) < _CDC_MOD * 2
