"""10× plan-stability run (VERDICT r01 next-round #8).

Builds a deterministic sf1.0-equivalent dataset in /tmp by replicating
the driver's sf0.1 tables 10× with key offsets (numeric ids shifted by
copy*N so keys stay distinct; document text gets a per-copy suffix so
the dedup structure is 10-member near-dup groups — a realistic web
corpus shape), then times the most expensive headline queries at
sf0.1 and at the 10× set and reports the time ratio.

The point is PLAN stability: a query whose plan survives 10× data
should scale ~linearly in rows (ratio ≈ 10 of work at the same
parallelism means ratio ≲ 10 wall-clock; a quadratic candidate join or
a collapsed partition shows up as ratio ≫ 10).

Usage: python tools/bench_sf1.py [--rebuild]
Keep the machine otherwise idle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edgar_crawler_spark.queries import QUERIES
from edgar_crawler_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/ecs_sf1"
COPIES = 10

# (table, numeric id columns to offset, text column to perturb)
TABLES = {
    "documents": (["doc_id"], "text"),
    "events": (["event_id", "user_id"], None),
    "embeddings": (["vec_id"], None),
    "lineitem": (["l_orderkey"], None),
    "orders": (["o_orderkey"], None),
}

QUERY_SET = [
    "simhash_dedup",
    "ann_lsh_topk",
    "keep_last_dedup",
    "dedup_norm_exact",
    "jaccard_bigram_pairs",
    "embedding_neardup",
    "ann_ivf_topk",
    # round 2b/2c additions
    "asof_last_view",
    "ngram_contamination",
    "vocab_topk",
    "hll_distinct",
    # round 3 additions
    "knn_graph",
    "sparse_cosine_pairs",
    "dup_span_profile",
    "hll_by_source",
    "url_canonical_hosts",
    "kmeans_embeddings",
    "bm25_topk",
    # dedup_canonical is deliberately NOT in the 10x set: its pair
    # stage verifies UNIGRAM token-set jaccard >= 0.8, and this toy
    # corpus's ~30-word vocabulary makes nearly every doc pair a TRUE
    # near-dup at that shingle unit (the r02 verdict's "24% of all
    # pairs" note) — so the ground-truth edge set itself is O(N^2)
    # at 10x (~3e8 pairs), which no exact algorithm can avoid
    # emitting. jaccard_bigram_pairs (bigram shingles, sparse truth)
    # is the 10x-representative for the verify-join shape.
]


def build(spark, rebuild: bool = False) -> None:
    os.makedirs(DST, exist_ok=True)
    for name, (id_cols, text_col) in TABLES.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out) and not rebuild:
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        n = src.count()
        parts = []
        for i in range(COPIES):
            df = src
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * n).cast("long"))
            if text_col and i > 0:
                df = df.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" copy{i}"))
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.repartition(32).write.mode("overwrite").parquet(out)
        print(f"built {name}: {n} -> {n * COPIES} rows", file=sys.stderr)
    # remaining small tables: symlink-copy so load_table finds them
    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    # 10x data in ONE JVM: a real cluster spreads this across
    # executors with 8-64g each; give the single local JVM the
    # equivalent headroom (the dup-dense 10x corpus unrolls ~150MB
    # cache blocks per partition in the minhash verify stage, and 32
    # concurrent tasks x 150MB does not fit the 8g default)
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("bench-sf1", cores=32, shuffle_partitions=32)
    build(spark, rebuild)

    force(QUERIES["count_by_type"].fn(spark, SRC))  # warm
    out = {}
    from edgar_crawler_spark.cachereg import release_caches

    for name in QUERY_SET:
        q = QUERIES[name]
        t0 = time.perf_counter()
        force(q.fn(spark, SRC))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(q.fn(spark, DST))
        t_big = time.perf_counter() - t0
        release_caches()
        out[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1.0_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
        print(f"{name:24s} {t_small:7.2f}s -> {t_big:7.2f}s  "
              f"x{t_big / t_small:5.2f}", file=sys.stderr)

    # the designed 10× mitigation for the near-dup pair query: nbits
    # grows with log2(N) so bucket occupancy stays ~constant (see
    # lsh_neardup_pairs docstring). +log2(10) ≈ 3 bits at 10× data.
    from edgar_crawler_spark.operators.similarity import (  # noqa: PLC0415
        lsh_neardup_pairs,
    )
    from edgar_crawler_spark.tables import load_table  # noqa: PLC0415

    t0 = time.perf_counter()
    force(lsh_neardup_pairs(
        load_table(spark, DST, "embeddings"), threshold=0.35, nbits=9, dim=64,
    ))
    t = time.perf_counter() - t0
    out["embedding_neardup_nbits9_sf1.0"] = {"sf1.0_sec": round(t, 3)}
    print(f"{'embedding_neardup(nbits=9)':28s} sf1.0 {t:7.2f}s",
          file=sys.stderr)

    # same lever for the kNN graph: candidates/vector ~ N(nbits+1)/2^nbits,
    # so nbits tracks log2(N) at ingest (+3 bits at 10x)
    from edgar_crawler_spark.cachereg import release_caches  # noqa: PLC0415
    from edgar_crawler_spark.operators.similarity import knn_graph  # noqa: PLC0415

    t0 = time.perf_counter()
    force(knn_graph(load_table(spark, DST, "embeddings"), k=5, nbits=9, dim=64))
    t = time.perf_counter() - t0
    release_caches()
    out["knn_graph_nbits9_sf1.0"] = {"sf1.0_sec": round(t, 3)}
    print(f"{'knn_graph(nbits=9)':28s} sf1.0 {t:7.2f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
