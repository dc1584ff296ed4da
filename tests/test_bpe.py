"""Distributed BPE trainer vs the pure-Python reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from edgar_crawler_spark.operators.bpe import (
    apply_bpe,
    train_bpe,
    train_bpe_py,
)


def _corpus(seed: int, n_docs: int, vocab: int, words: int) -> list[str]:
    rng = random.Random(seed)
    return [
        " ".join(f"w{rng.randrange(vocab)}" for _ in range(rng.randrange(3, words)))
        for _ in range(n_docs)
    ]


class TestBpeTrainer:
    def test_matches_python_reference(self, spark):
        texts = _corpus(3, 60, 8, 30)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges, symbolized = train_bpe(df, n_merges=8)
        assert merges == train_bpe_py(texts, n_merges=8)
        assert len(merges) == 8  # tiny vocab: plenty of frequent pairs
        # merged symbols actually appear in the symbolized corpus
        syms = set(
            symbolized.select(F.explode("w").alias("s"))
            .distinct()
            .toPandas()
            .s
        )
        assert ("%s %s" % merges[0]) in {
            s for s in syms if " " in s
        } or any(" " in s for s in syms)

    def test_apply_reproduces_training_corpus(self, spark):
        """apply_bpe(merges) on the raw corpus == the trainer's own
        symbolized output (tokenizer consistency)."""
        texts = _corpus(4, 40, 6, 20)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges, symbolized = train_bpe(df, n_merges=5)
        applied = apply_bpe(df, merges)
        a = {r.doc_id: list(r.w) for r in applied.collect()}
        b = {r.doc_id: list(r.w) for r in symbolized.collect()}
        assert a == b

    def test_round_trip_preserves_tokens(self, spark):
        """Splitting merged symbols on spaces recovers the original
        whitespace tokenization exactly (BPE is lossless)."""
        texts = _corpus(5, 30, 5, 15)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges, symbolized = train_bpe(df, n_merges=6)
        back = {
            r.doc_id: " ".join(r.w)
            for r in symbolized.collect()
        }
        for i, t in enumerate(texts):
            want = " ".join(x for x in t.lower().split() if x)
            assert back[i] == want

    def test_early_stop_on_min_count(self, spark):
        # every token unique -> no pair reaches min_count=2
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
        )
        merges, _ = train_bpe(df, n_merges=5, min_count=2)
        assert merges == []


class TestMergeFoldAdversarial:
    def test_fold_matches_python_on_tricky_arrays(self, spark):
        """One Spark job over 300 adversarial token arrays — overlap
        runs (l==r), interleaved matches, merged-symbol collisions —
        each checked against the pure-python greedy merge."""
        import random

        from edgar_crawler_spark.operators.bpe import merge_pair_col

        rng = random.Random(99)
        cases = []
        for _ in range(300):
            n = rng.randrange(0, 12)
            w = [rng.choice(["a", "b", "c", "a b"]) for _ in range(n)]
            cases.append(w)
        # deliberate hard shapes
        cases += [["a"] * 6, ["a", "a", "b"] * 3, ["b", "a", "b", "a"],
                  [], ["a b", "a", "b"]]
        l, r = "a", "b"

        def py_merge(w):
            out = []
            for t in w:
                if out and out[-1] == l and t == r:
                    out[-1] = l + " " + r
                else:
                    out.append(t)
            return out

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(cases)],
            "i long, w array<string>",
        )
        got = {
            row.i: list(row.m)
            for row in df.select(
                "i", merge_pair_col(F.col("w"), l, r).alias("m")
            ).collect()
        }
        for i, w in enumerate(cases):
            assert got[i] == py_merge(w), (i, w, got[i])

    def test_fold_overlapping_pair_same_symbol(self, spark):
        """l == r: [a,a,a] merges greedily left-to-right into
        ['a a', 'a'] — non-overlapping semantics."""
        from edgar_crawler_spark.operators.bpe import merge_pair_col

        df = spark.createDataFrame([(0, ["a", "a", "a"])], "i long, w array<string>")
        got = df.select(merge_pair_col(F.col("w"), "a", "a").alias("m")).first().m
        assert list(got) == ["a a", "a"]
