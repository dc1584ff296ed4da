"""Unit tests for the dedup + similarity operator library, checked
against in-process pure-Python oracles (independent of the DuckDB
oracle path the driver uses)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.operators import dedup as D
from edgar_crawler_spark.operators import similarity as S
from edgar_crawler_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def py_tokens(text: str, distinct: bool = True) -> list[str]:
    toks = [t for t in __import__("re").split(r"\s+", text.lower()) if t != ""]
    if distinct:
        seen, out = set(), []
        for t in toks:
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out
    return toks


def py_minhash(tokens: list[str], k: int = 8) -> list[str]:
    return [
        min(hashlib.md5(f"{i}|{t}".encode()).hexdigest() for t in tokens)
        for i in range(k)
    ]


def py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


class TestMinhash:
    def test_signature_matches_python(self, spark, docs):
        sample = docs.orderBy("doc_id").limit(5)
        rows = sample.select(
            "doc_id",
            D.minhash_signature_col(D.tokens_col("text", distinct=True), 8).alias("mh"),
            "text",
        ).collect()
        for r in rows:
            assert list(r.mh) == py_minhash(py_tokens(r.text)), r.doc_id

    def test_lsh_recall_on_high_jaccard_pairs(self, spark, docs):
        got = {
            (r.id_a, r.id_b)
            for r in D.minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
        }
        # python oracle: all pairs with exact jaccard >= 0.9 among the
        # first 120 docs (bounded for test speed)
        texts = {
            r.doc_id: set(py_tokens(r.text))
            for r in docs.filter(F.col("doc_id") < 120).collect()
        }
        ids = sorted(texts)
        high = [
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if py_jaccard(texts[a], texts[b]) >= 0.9
        ]
        assert len(high) > 10
        recall = sum(p in got for p in high) / len(high)
        # P(miss | j=0.9) = (1-0.81)^4 ≈ 0.13% per pair
        assert recall >= 0.95
        # and every reported pair really is >= 0.8 (verified, not just banded)
        for r in D.minhash_lsh_pairs(docs, jaccard_threshold=0.8).limit(50).collect():
            if r.id_a in texts and r.id_b in texts:
                assert py_jaccard(texts[r.id_a], texts[r.id_b]) >= 0.7999

    def test_ngrams(self, spark):
        df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
        out = df.select(
            D.ngrams_col(D.tokens_col("text"), 3).alias("g")
        ).collect()
        assert list(out[0].g) == ["a b c", "b c d"]
        assert list(out[1].g) == []


class TestSimhash:
    def test_matches_python_oracle(self, spark, docs):
        rows = docs.orderBy("doc_id").limit(5).collect()
        got = {
            r.doc_id: r.simhash
            for r in D.simhash16(docs.filter(F.col("doc_id") < 5)).collect()
        }
        for r in rows[:5]:
            votes = [0] * 16
            for t in py_tokens(r.text, distinct=False):
                h = hashlib.md5(t.encode()).hexdigest()
                for j in range(16):
                    votes[j] += 1 if h[j] in "89abcdef" else -1
            want = sum(2**j for j in range(16) if votes[j] > 0)
            assert got[r.doc_id] == want

    def test_identical_text_same_hash(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "THE  QUICK\nBROWN fox"), (3, "other words here")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.simhash for r in D.simhash16(df).collect()}
        assert out[1] == out[2] != out[3]


class TestSimhashCap:
    def test_mega_doc_capped_to_prefix(self, spark):
        """max_tokens explode-skew guard: a mega-document's simhash
        equals the simhash of its first max_tokens tokens, and short
        docs are unaffected."""
        long_words = " ".join(f"w{i % 97}" for i in range(5000))
        prefix = " ".join(long_words.split()[:256])
        df = spark.createDataFrame(
            [(0, long_words), (1, prefix), (2, "alpha beta gamma")],
            "doc_id long, text string",
        )
        capped = {r.doc_id: r.simhash
                  for r in D.simhash16(df, max_tokens=256).collect()}
        uncapped = {r.doc_id: r.simhash for r in D.simhash16(df).collect()}
        assert capped[0] == uncapped[1]  # mega-doc == its prefix
        assert capped[2] == uncapped[2]  # short docs unaffected
        assert capped[1] == uncapped[1]


class TestLshAnn:
    def test_buckets_match_python(self, spark):
        emb = load_table(spark, SF, "embeddings").limit(20)
        rows = emb.select(
            "vec_id", "embedding",
            S.lsh_bucket_col(F.col("embedding"), 8, 64).alias("bucket"),
        ).collect()
        for r in rows:
            want = 0
            for i in range(8):
                proj = sum(
                    float(x) * S.rademacher_sign(i, d)
                    for d, x in enumerate(r.embedding)
                )
                if proj > 0:
                    want += 2**i
            assert r.bucket == want, r.vec_id

    def test_lsh_topk_is_exact_within_probes(self, spark):
        emb = load_table(spark, SF, "embeddings").cache()
        brute = {r.vec_id: r.cos_sim for r in S.cosine_topk(emb, 0, k=500).collect()}
        lsh = S.lsh_topk(emb, 0, k=20).collect()
        # sorted desc, and every reported cosine equals the exact one
        sims = [r.cos_sim for r in lsh]
        assert sims == sorted(sims, reverse=True)
        for r in lsh:
            assert math.isclose(brute[r.vec_id], r.cos_sim, abs_tol=1e-9)
        # probing recalls some true top-20 neighbors
        top20 = set(list(brute)[:20])
        assert len({r.vec_id for r in lsh} & top20) > 0

    def test_ivf_topk_exact_within_probes_and_recall(self, spark):
        emb = load_table(spark, SF, "embeddings").cache()
        brute = {r.vec_id: r.cos_sim for r in S.cosine_topk(emb, 0, k=500).collect()}
        ivf = S.ivf_topk(emb, 0, k=20, n_cells=16, n_probe=4)
        rows = ivf.collect()
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True) and len(rows) == 20
        for r in rows:
            assert math.isclose(brute[r.vec_id], r.cos_sim, abs_tol=1e-9)
        # probing 4/16 cells nearest the query should recall a decent
        # share of the true top-20
        top20 = set(list(brute)[:20])
        recall = len({r.vec_id for r in rows} & top20) / 20
        assert recall >= 0.3
        # deterministic across invocations (seeded quantizer)
        again = [r.vec_id for r in S.ivf_topk(emb, 0, k=20).collect()]
        assert again == [r.vec_id for r in rows]

    def test_ivf_seeded_exact_within_probes_and_recall(self, spark):
        """Hash-seeded codebook IVF (the oracle-able variant): same
        exactness-within-probes and recall properties as the trained
        one, plus bit-determinism across invocations."""
        emb = load_table(spark, SF, "embeddings").cache()
        brute = {r.vec_id: r.cos_sim for r in S.cosine_topk(emb, 0, k=500).collect()}
        rows = S.ivf_topk_seeded(emb, 0, k=20, n_cells=16, n_probe=4).collect()
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True) and len(rows) == 20
        for r in rows:
            assert math.isclose(brute[r.vec_id], r.cos_sim, abs_tol=1e-9)
        top20 = set(list(brute)[:20])
        assert len({r.vec_id for r in rows} & top20) / 20 >= 0.3
        again = [
            r.vec_id
            for r in S.ivf_topk_seeded(emb, 0, k=20, n_cells=16, n_probe=4).collect()
        ]
        assert again == [r.vec_id for r in rows]


class TestCcClusters:
    def test_components_on_constructed_graph(self, spark):
        """Chain 1-2-3 and pair 7-9 are components (min-id canonical);
        5 is a singleton. Label propagation must cross the chain (two
        hops from 3 to 1), which a single neighbor-min pass would
        miss."""
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 5, 7, 9)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(2, 3, 0.9), (1, 2, 0.9), (7, 9, 0.85)],
            "id_a long, id_b long, jaccard double",
        )
        out = {r.doc_id: (r.cluster_id, r.keep)
               for r in D.cc_clusters(docs, pairs).collect()}
        assert out == {
            1: (1, True), 2: (1, False), 3: (1, False),
            5: (5, True), 7: (7, True), 9: (7, False),
        }

    def test_empty_pairs_all_singletons(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        pairs = spark.createDataFrame(
            [], "id_a long, id_b long, jaccard double"
        )
        out = D.cc_clusters(docs, pairs).collect()
        assert all(r.cluster_id == r.doc_id and r.keep for r in out)


class TestCacheRegistry:
    def test_tracked_caches_released(self, spark):
        """ADVICE r02: pair-generator caches must be releasable by the
        harness loop after materialization (long-lived sessions were
        accumulating cached plans until eviction pressure)."""
        from edgar_crawler_spark.cachereg import release_caches

        release_caches()  # drain anything earlier tests left behind
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta " + ("x" if i % 2 else "y"))
             for i in range(20)],
            "doc_id long, text string",
        )
        pairs = D.minhash_lsh_pairs(docs)
        pairs.count()  # materialize while the caches are live
        n = release_caches()
        assert n >= 2  # toks + bands_df at minimum
        assert release_caches() == 0  # idempotent
