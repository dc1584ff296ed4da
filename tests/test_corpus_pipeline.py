"""End-to-end corpus pipeline (jobs/corpus_pipeline.py): raw docs →
exact dedup → near-dup CC dedup → quality filter → split → parquet."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

from jobs.corpus_pipeline import build_corpus
from edgar_crawler_spark.tables import load_table

SF = "/root/testdata/sf0.001"


class TestBuildCorpus:
    def test_stages_compose(self, spark):
        docs = load_table(spark, SF, "documents")
        n_in = docs.count()
        corpus = build_corpus(spark, docs, min_tokens=3, max_dup_ratio=0.9)
        rows = corpus.collect()
        assert 0 < len(rows) < n_in  # something was deduped/filtered
        # no surviving exact duplicates
        texts = [r.text for r in rows]
        assert len(set(texts)) == len(texts)
        # split assignment is the consistent hash (spot-check one row)
        import hashlib

        for r in rows[:20]:
            pct = int(
                hashlib.md5(f"split|{r.doc_id}".encode()).hexdigest()[:8], 16
            ) % 100
            want = "train" if pct < 90 else ("validation" if pct < 95 else "test")
            assert r.split == want, r.doc_id
        # survivors are cluster canonicals: every kept doc_id is the
        # min of its near-dup cluster, so re-running dedup on the
        # output finds no >=0.8 near-dup pairs among survivors
        from edgar_crawler_spark.operators import dedup as D

        leftover = D.minhash_lsh_pairs(
            corpus, k=8, bands=4, jaccard_threshold=0.8
        ).count()
        assert leftover == 0

    def test_cli_writes_partitioned_output(self, spark, tmp_path):
        out = str(tmp_path / "corpus")
        res = subprocess.run(
            [
                sys.executable, "jobs/corpus_pipeline.py",
                "--docs", f"{SF}/documents.parquet",
                "--out", out,
                "--min-tokens", "3", "--max-dup-ratio", "0.9",
            ],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
        line = json.loads(res.stdout.strip().splitlines()[-1])
        assert sum(line["counts"].values()) > 0
        read_back = spark.read.parquet(out)
        assert read_back.filter(F.col("split") == "train").count() == \
            line["counts"].get("train", 0)


class TestDecontamAndPacking:
    def test_train_docs_sharing_eval_shingles_dropped(self, spark):
        docs = load_table(spark, SF, "documents")
        with_c = build_corpus(spark, docs, min_tokens=3, max_dup_ratio=0.9,
                              contam_ngram=5, pack_budget=0)
        without_c = build_corpus(spark, docs, min_tokens=3, max_dup_ratio=0.9,
                                 contam_ngram=0, pack_budget=0)
        n_with, n_without = with_c.count(), without_c.count()
        assert n_with <= n_without
        # only TRAIN rows may differ; held-out rows are identical
        held_with = sorted(r.doc_id for r in with_c.collect() if r.split != "train")
        held_wo = sorted(r.doc_id for r in without_c.collect() if r.split != "train")
        assert held_with == held_wo
        # brute-force: no surviving train doc shares a 5-shingle with
        # any held-out doc
        rows = {r.doc_id: (r.text, r.split) for r in with_c.collect()}

        def shingles(t):
            w = [x for x in t.lower().split() if x]
            return {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}

        held_sh = set()
        for t, sp in rows.values():
            if sp != "train":
                held_sh |= shingles(t)
        for did, (t, sp) in rows.items():
            if sp == "train":
                assert not (shingles(t) & held_sh), did

    def test_packing_addresses(self, spark):
        docs = load_table(spark, SF, "documents")
        corpus = build_corpus(spark, docs, min_tokens=3, max_dup_ratio=0.9,
                              contam_ngram=5, pack_budget=256)
        rows = sorted(
            ((r.split, r.doc_id, r.n_tokens, r.bin, r.bin_offset)
             for r in corpus.collect())
        )
        cum: dict[str, int] = {}
        for split, did, n_tok, b, off in rows:
            start = cum.get(split, 0)
            assert (b, off) == (start // 256, start % 256), (split, did)
            cum[split] = start + n_tok
