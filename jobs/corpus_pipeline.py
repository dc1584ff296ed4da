"""spark-submit entry point: raw documents → training-ready corpus.

The assembly line a training-data team runs over crawled text — every
stage is an operator from this engine, chained as ONE lazy DataFrame
program so Catalyst sees the whole plan:

  1. exact dedup        md5 groupBy, keep min doc_id       (scan-level)
  2. near-dup dedup     MinHash→LSH pairs → connected components →
                        keep the canonical doc per cluster
  3. quality filter     token stats + repetition ratio + language-ID
                        (thresholds are CLI flags)
  4. split             consistent md5 hash split → train/validation/
                        test assignment
  5. decontamination    train docs sharing any 5-token shingle with a
                        held-out doc are DROPPED from train (the
                        GPT-3/PaLM-report eval-hygiene pass)
  6. pack + write       per-(split, source-free) token-budget sequence
                        packing (bin, bin_offset), then parquet
                        partitioned by split

Launch:

    cd /root/repo && zip -r /tmp/edgar_crawler_spark.zip edgar_crawler_spark
    spark-submit --py-files /tmp/edgar_crawler_spark.zip \\
        jobs/corpus_pipeline.py \\
        --docs /data/documents.parquet --out /data/corpus \\
        [--min-tokens 5] [--max-dup-ratio 0.5] [--lang en] \\
        [--jaccard 0.8] [--contam-ngram 5] [--pack-budget 2048]

Scale notes: stages 1-2 shuffle hashes and ids, never text; the
near-dup component join keys on LSH band buckets; the final write is
partitioned by split so downstream training readers partition-prune.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# run as a script: `python jobs/corpus_pipeline.py` puts jobs/ on
# sys.path, not the repo root; on a cluster --py-files provides the
# package instead and this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    *,
    min_tokens: int = 5,
    max_dup_ratio: float = 0.5,
    lang: str | None = None,
    jaccard_threshold: float = 0.8,
    contam_ngram: int = 5,
    pack_budget: int = 2048,
) -> DataFrame:
    """Returns (doc_id, text, lang, split) — the surviving corpus with
    its split assignment. Pure DataFrame composition; nothing is
    collected."""
    from edgar_crawler_spark.operators import dedup as D

    # 1. exact dedup: canonical = min doc_id per content hash
    hashed = docs.withColumn("_h", F.md5("text"))
    keep_exact = hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    docs1 = hashed.join(
        keep_exact, ["_h", "doc_id"], "left_semi"
    ).drop("_h")

    # 2. near-dup dedup: LSH pairs -> CC -> keep canonical per cluster
    pairs = D.minhash_lsh_pairs(
        docs1, k=8, bands=4, jaccard_threshold=jaccard_threshold
    )
    clusters = D.cc_clusters(docs1, pairs)
    docs2 = docs1.join(
        clusters.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )

    # 3. quality filter: length, repetition, (optional) language
    toks = D.tokens_col("text")
    w = docs2.withColumn("_w", toks)
    grams = w.withColumn("_g", D.ngrams_col(F.col("_w"), 2))
    dup_ratio = F.when(F.size("_g") == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("_g")).cast("double") / F.size("_g")
    )
    filtered = (
        grams.withColumn("_dup", dup_ratio)
        .filter((F.size("_w") >= min_tokens) & (F.col("_dup") <= max_dup_ratio))
    )
    if lang is not None:
        filtered = filtered.filter(F.col("lang") == lang)

    # 4. consistent split (never migrates as the corpus grows)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    pct = h % 100
    split = (
        F.when(pct < 90, F.lit("train"))
        .when(pct < 95, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    assigned = filtered.select("doc_id", "text", "lang", split.alias("split"))

    # 5. decontamination: a TRAIN doc sharing any `contam_ngram`-token
    # shingle with any held-out (validation/test) doc leaks eval data
    # into training — drop it. Shingles are md5-hashed before the
    # join: the shuffle carries 16-byte keys, never text.
    if contam_ngram:
        w = D.tokens_col("text")
        shingle = F.transform(
            F.sequence(F.lit(0), F.size(w) - contam_ngram),
            lambda i: F.md5(F.array_join(F.slice(w, i + 1, contam_ngram), " ")),
        )
        sh = assigned.select(
            "doc_id", "split",
            F.array_distinct(
                F.when(F.size(w) >= contam_ngram, shingle)
            ).alias("_shs"),
        )
        held_sh = (
            sh.filter(F.col("split") != "train")
            .select(F.explode_outer("_shs").alias("_s"))
            .filter(F.col("_s").isNotNull())
            .distinct()
        )
        dirty_train = (
            sh.filter(F.col("split") == "train")
            .select("doc_id", F.explode_outer("_shs").alias("_s"))
            .join(held_sh, "_s", "left_semi")
            .select("doc_id")
            .distinct()
        )
        assigned = assigned.join(dirty_train, "doc_id", "left_anti")

    # 6. sequence packing: within each split, concatenate docs in
    # doc_id order and chunk at `pack_budget` tokens — every doc gets
    # (bin, bin_offset), the address of its tokens in the packed
    # stream. Window partitions by split (never a global cumsum).
    if pack_budget:
        from pyspark.sql import Window as W

        n_tokens = F.size(D.tokens_col("text")).cast("long")
        win = (
            W.partitionBy("split")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        assigned = (
            assigned.withColumn("_n", n_tokens)
            .withColumn("_cum", F.sum("_n").over(win))
            .select(
                "doc_id", "text", "lang", "split",
                F.col("_n").alias("n_tokens"),
                F.floor((F.col("_cum") - F.col("_n")) / pack_budget).alias("bin"),
                ((F.col("_cum") - F.col("_n")) % pack_budget).alias("bin_offset"),
            )
        )
    return assigned


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="corpus assembly pipeline")
    p.add_argument("--docs", required=True, help="documents parquet")
    p.add_argument("--out", required=True, help="output corpus dir")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-dup-ratio", type=float, default=0.5)
    p.add_argument("--lang", default=None)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--contam-ngram", type=int, default=5,
                   help="0 disables decontamination")
    p.add_argument("--pack-budget", type=int, default=2048,
                   help="0 disables sequence packing")
    args = p.parse_args(argv)

    builder = SparkSession.builder.appName("corpus-pipeline")
    if "spark.master" not in {k for k, _ in builder._options.items()}:  # noqa: SLF001
        builder = builder.master("local[*]")
    spark = builder.getOrCreate()

    docs = spark.read.parquet(args.docs)
    corpus = build_corpus(
        spark, docs,
        min_tokens=args.min_tokens,
        max_dup_ratio=args.max_dup_ratio,
        lang=args.lang,
        jaccard_threshold=args.jaccard,
        contam_ngram=args.contam_ngram,
        pack_budget=args.pack_budget,
    )
    (
        corpus.write.mode("overwrite")
        .partitionBy("split")
        .parquet(args.out)
    )
    counts = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.out)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"out": args.out, "counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
