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
