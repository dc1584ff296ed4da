"""Brute-force checks for the round-3 operators (kNN graph, grouped
HLL, cross-source vocabulary Jaccard, sparse tf-idf cosine pairs) —
in-process Python oracles, independent of the DuckDB harness."""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import functions as F

from edgar_crawler_spark.operators import similarity as S
from edgar_crawler_spark.operators import sketch as SK


def _py_bucket(vec: list[float], nbits: int, dim: int) -> int:
    b = 0
    for i in range(nbits):
        proj = sum(v * S.rademacher_sign(i, d) for d, v in enumerate(vec))
        if proj > 0:
            b |= 1 << i
    return b


def _py_cos(a: list[float], b: list[float], nd: int = 4) -> float:
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    return round(num / den, nd)


class TestKnnGraph:
    def test_matches_bruteforce_over_candidates(self, spark):
        rng = random.Random(31)
        dim, nbits, k = 8, 4, 3
        vecs = {
            i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(120)
        }
        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        # Spark stores float32; mirror that truncation in the oracle
        import struct

        f32 = {
            i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
            for i, v in vecs.items()
        }
        got = {
            (r.src, r.rnk): (r.nbr, r.cos_sim)
            for r in S.knn_graph(
                emb, k=k, nbits=nbits, dim=dim
            ).collect()
        }
        buckets = {i: _py_bucket(v, nbits, dim) for i, v in f32.items()}
        for src, v in f32.items():
            cands = [
                (-_py_cos(v, f32[o]), o)
                for o, ob in buckets.items()
                if o != src and bin(ob ^ buckets[src]).count("1") <= 1
            ]
            cands.sort()
            for rnk, (negc, nbr) in enumerate(cands[:k], start=1):
                assert got[(src, rnk)] == (nbr, -negc), (src, rnk)
        # nothing extra emitted
        n_expected = sum(
            min(
                k,
                sum(
                    1
                    for o, ob in buckets.items()
                    if o != s and bin(ob ^ buckets[s]).count("1") <= 1
                ),
            )
            for s in f32
        )
        assert len(got) == n_expected

    def test_every_vector_ranked_contiguously(self, spark):
        rng = random.Random(5)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
            "vec_id long, embedding array<float>",
        )
        rows = S.knn_graph(emb, k=4, nbits=3, dim=8).collect()
        by_src: dict[int, list[int]] = {}
        for r in rows:
            by_src.setdefault(r.src, []).append(r.rnk)
        for src, rnks in by_src.items():
            assert sorted(rnks) == list(range(1, len(rnks) + 1)), src


class TestGroupedHll:
    def test_grouped_registers_equal_per_group_global(self, spark):
        rng = random.Random(11)
        rows = [
            (rng.choice(["a", "b", "c"]), f"tok{rng.randrange(500)}")
            for _ in range(4000)
        ]
        df = spark.createDataFrame(rows, "g string, t string")
        grouped = {
            (r.g, r.bucket): r.reg
            for r in SK.hll_registers_by(df, ["g"], "t").collect()
        }
        for g in ("a", "b", "c"):
            solo = {
                r.bucket: r.reg
                for r in SK.hll_registers(
                    df.filter(F.col("g") == g).select("t"), "t"
                ).collect()
            }
            assert {b: v for (gg, b), v in grouped.items() if gg == g} == solo

    def test_grouped_estimate_matches_global_per_group(self, spark):
        rng = random.Random(3)
        rows = [
            ("x" if i % 3 else "y", f"v{rng.randrange(2000)}")
            for i in range(6000)
        ]
        df = spark.createDataFrame(rows, "g string, t string")
        est = {
            r.g: (r.v_zero, r.s_int, r.raw_est, r.est)
            for r in SK.hll_estimate_by(
                SK.hll_registers_by(df, ["g"], "t"), ["g"]
            ).collect()
        }
        for g in ("x", "y"):
            regs = SK.hll_registers(
                df.filter(F.col("g") == g).select("t"), "t"
            )
            solo = SK.hll_estimate_cols(regs).collect()[0]
            assert est[g] == (
                solo.v_zero, solo.s_int, solo.raw_est, solo.est
            ), g

    def test_estimates_within_hll_error(self, spark):
        rng = random.Random(9)
        truth = {"p": 900, "q": 150}
        rows = [
            (g, f"{g}-{rng.randrange(n)}")
            for g, n in truth.items()
            for _ in range(n * 6)
        ]
        df = spark.createDataFrame(rows, "g string, t string")
        est = {
            r.g: r.est
            for r in SK.hll_estimate_by(
                SK.hll_registers_by(df, ["g"], "t"), ["g"]
            ).collect()
        }
        exact = {
            r.g: r.n
            for r in df.groupBy("g")
            .agg(F.countDistinct("t").alias("n"))
            .collect()
        }
        for g, n in exact.items():
            assert abs(est[g] - n) / n < 0.15, (g, est[g], n)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


class TestVocabJaccard:
    def test_matches_bruteforce(self, spark, tmp_path):
        rng = random.Random(17)
        vocab = [f"w{i}" for i in range(60)]
        docs = [
            (
                i,
                rng.choice(["s1", "s2", "s3", "s4"]),
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))),
            )
            for i in range(200)
        ]
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        path = str(tmp_path / "documents.parquet")
        df.coalesce(2).write.mode("overwrite").parquet(path)
        from edgar_crawler_spark.queries import QUERIES

        got = {
            (r.source_a, r.source_b): (r.n_inter, r.jaccard)
            for r in QUERIES["vocab_jaccard_sources"].fn(
                spark, str(tmp_path)
            ).collect()
        }
        sets: dict[str, set] = {}
        for _, src, text in docs:
            sets.setdefault(src, set()).update(_py_tokens(text))
        for a in sets:
            for b in sets:
                if a < b:
                    inter = len(sets[a] & sets[b])
                    if inter:
                        jac = round(inter / len(sets[a] | sets[b]), 4)
                        assert got[(a, b)] == (inter, jac), (a, b)


class TestSparseCosine:
    def test_matches_bruteforce(self, spark, tmp_path):
        from edgar_crawler_spark.queries import (
            _SPARSE_MAX_DF,
            _SPARSE_TAU,
            QUERIES,
        )

        rng = random.Random(23)
        vocab = [f"w{i}" for i in range(25)]
        docs = [
            (
                i,
                "s",
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 15))),
            )
            for i in range(80)
        ]
        # a couple of exact duplicates so high-sim pairs exist
        docs.append((80, "s", docs[0][2]))
        docs.append((81, "s", docs[1][2]))
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        df.coalesce(2).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        got = {
            (r.id_a, r.id_b): r.sim
            for r in QUERIES["sparse_cosine_pairs"].fn(
                spark, str(tmp_path)
            ).collect()
        }
        # python tf-idf mirror
        tf: dict[int, dict[str, int]] = {}
        for i, _, text in docs:
            toks = _py_tokens(text)
            bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            d: dict[str, int] = {}
            for t in bgs:
                d[t] = d.get(t, 0) + 1
            tf[i] = d
        dfreq: dict[str, int] = {}
        for d in tf.values():
            for t in d:
                dfreq[t] = dfreq.get(t, 0) + 1
        n_docs = len(docs)
        wgt = {
            i: {
                t: c * math.log(n_docs / dfreq[t])
                for t, c in d.items()
                if dfreq[t] <= _SPARSE_MAX_DF and dfreq[t] < n_docs
            }
            for i, d in tf.items()
        }
        nrm = {i: math.sqrt(sum(w * w for w in d.values())) for i, d in wgt.items()}
        expected = {}
        ids = sorted(wgt)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                common = set(wgt[a]) & set(wgt[b])
                if not common:
                    continue
                s = sum(wgt[a][t] * wgt[b][t] for t in common)
                sim = round(s / (nrm[a] * nrm[b]), 4)
                if sim >= _SPARSE_TAU:
                    expected[(a, b)] = sim
        assert got == expected
        assert (80, 0) in got or (0, 80) in got  # the planted duplicate

    def test_caches_released(self, spark, tmp_path):
        from edgar_crawler_spark.cachereg import release_caches
        from edgar_crawler_spark.queries import QUERIES

        df = spark.createDataFrame(
            [(i, "s", "alpha beta gamma delta") for i in range(10)],
            "doc_id long, source string, text string",
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        QUERIES["sparse_cosine_pairs"].fn(spark, str(tmp_path)).collect()
        assert release_caches() >= 1
        from edgar_crawler_spark.cachereg import _LIVE

        assert not _LIVE
