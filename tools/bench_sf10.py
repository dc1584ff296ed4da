"""100× plan-stability probe (VERDICT r03 next-round #3).

One decade past tools/bench_sf1.py: builds a deterministic
sf10-equivalent dataset (100× the driver's sf0.1 rows) and times the
five most expensive pair/packing queries at sf0.1 and at 100×, with
the documented scaling-policy levers applied where the query has one.

Data-construction model — "corpus growth adds new content", the
realistic web shape (unlike bench_sf1's verbatim replicas, which make
dup clusters grow WITH the corpus and conflate output-size scaling
with plan scaling):
- documents: every token gets a per-copy suffix (``tok`` → ``tok_c7``)
  so each copy is its own sub-corpus — token df and the true near-dup
  pair set stay CONSTANT per copy, i.e. corpus-truth grows linearly.
- embeddings: each copy's vectors are rotated by ``copy % 64``
  positions and sign-flipped for copies ≥ 64 (norm-preserving,
  decorrelating), so cross-copy cosine is ~random and the true
  neighbor structure again grows linearly.

Policy levers applied at 100× (from the operator docstrings):
- knn_graph / embedding_neardup: nbits grows with log2(N) to hold
  bucket occupancy ~constant — candidates/vector ~ N(nbits+1)/2^nbits,
  so constant occupancy needs 2^nbits/(nbits+1) ∝ N: 9.1 at nbits=6,
  ×100 → 914, and nbits=14 (1092) is the first setting past it
  (nbits=13 reaches only 64× and measured 2.15× superlinear).
- jaccard_bigram_pairs, sparse_cosine_pairs, pack_sequences: no lever
  needed — df caps / shard widths are already absolute, and the
  salted construction keeps their inputs linear.

Usage: python tools/bench_sf10.py [--rebuild] [--policy-only]
(--policy-only reruns just the nbits-lever pair on the built data.)
Keep the machine otherwise idle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edgar_crawler_spark.cachereg import release_caches
from edgar_crawler_spark.queries import QUERIES
from edgar_crawler_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/ecs_sf10"
COPIES = 100
DIM = 64


def _salt_tokens(text_col, copy: int):
    """tok -> tok_c<copy>: per-copy sub-corpus, df preserved."""
    return F.array_join(
        F.transform(
            F.split(text_col, " "),
            lambda t: F.concat(t, F.lit(f"_c{copy}")),
        ),
        " ",
    )


def _rotate_flip(emb_col, copy: int):
    """Rotate by copy%DIM, sign-flip for copy>=DIM: norm-preserving,
    decorrelating, and injective over 100 copies."""
    r = copy % DIM
    rot = (
        F.concat(F.slice(emb_col, r + 1, DIM - r), F.slice(emb_col, 1, r))
        if r
        else emb_col
    )
    if copy >= DIM:
        rot = F.transform(rot, lambda x: -x)
    return rot


def build(spark, rebuild: bool = False) -> None:
    os.makedirs(DST, exist_ok=True)
    specs = {
        "documents": (["doc_id"], "text"),
        "embeddings": (["vec_id"], "embedding"),
        # events: fresh user/event id ranges per copy — 100x distinct
        # URLs for recrawl/trap, and (with mod grown to 20000) a 109x
        # edge set for the iterative-graph probes
        "events": (["user_id", "event_id"], None),
    }
    for name, (id_cols, payload) in specs.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.islink(out):  # pre-round-4c layout symlinked events
            os.unlink(out)
        if os.path.exists(out) and not rebuild:
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        n = src.count()
        offsets = {
            c: int(src.agg(F.max(c)).collect()[0][0]) + 1 for c in id_cols
        }
        parts = []
        for i in range(COPIES):
            df = src
            for c in id_cols:
                df = df.withColumn(
                    c, F.col(c) + F.lit(i * offsets[c]).cast("long")
                )
            if i > 0 and payload == "text":
                df = df.withColumn("text", _salt_tokens(F.col("text"), i))
            if i > 0 and payload == "embedding":
                df = df.withColumn(
                    "embedding", _rotate_flip(F.col("embedding"), i)
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.repartition(64).write.mode("overwrite").parquet(out)
        print(f"built {name}: {n} -> {n * COPIES} rows", file=sys.stderr)
    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark("bench-sf10", cores=32, shuffle_partitions=64)
    build(spark, rebuild)

    force(QUERIES["count_by_type"].fn(spark, SRC))  # warm
    out = {}

    # registry-shape queries (no lever needed). dedup_canonical rides
    # along since round 4 (bigram-shingle pair generation): per-copy
    # salting keeps its true cluster set constant per copy, so its
    # corpus truth also grows linearly.
    registry = [] if "--policy-only" in sys.argv else [
        "jaccard_bigram_pairs",
        "sparse_cosine_pairs",
        "pack_sequences",
        "dedup_canonical",
        # round 4c: corpus-hygiene family (documents: salted tokens
        # keep per-copy df constant; trigram/posting cardinality and
        # output grow linearly) + scheduling family (events: fresh
        # user/event ids per copy -> 100x URLs)
        "boilerplate_ngrams",
        "postings_delta",
        "recrawl_schedule",
        "url_trap_detect",
        # redirect chains stay <=7 hops at ANY corpus size (the %8
        # construction is position-local), so rounds are constant and
        # the probe isolates the per-round join's data scaling
        "redirect_resolve",
        # round 4d. warc/surt/soft404: scan-or-map-side shapes over
        # the 100x tables; host_gap/content_drift: bounded-key
        # windows (23 hosts / 97 urls) whose per-key row count grows
        # 100x — the probe shows the window work scaling, with
        # parallelism capped by the toy fixture's key count (real
        # crawls have millions of hosts/URLs, so the cap is a
        # fixture artifact, not a plan property)
        "warc_parse_roundtrip",
        "url_surt",
        "host_gap_compliance",
        "soft404_detect",
        "content_drift_simhash",
        # chunk rewrite: salted tokens keep cross-copy chunk overlap
        # at zero, so the dup structure (and output) grow linearly
        "chunk_dedup_rewrite",
        # robots: host space fixed (29) — rows scale, groups don't;
        # stratified sample: rank window on the source stratum;
        # cdx: per-file prefix-sum windows over the 100x doc set
        "robots_rules_parse",
        "stratified_weighted_sample",
        "cdx_index_build",
        # round 4e. cms/dsir: fixed sketch/bucket state (1024 / 512
        # rows) over a 100x token stream — the mergeable-sketch
        # scaling claim itself; dust: digest-keyed pair join whose
        # groups stay constant-size under salted growth
        "cms_heavy_hitters",
        "dsir_select",
        "dust_rules",
        # zipf: vocabulary-keyed agg + bounded head regression.
        # semdedup_prune is NOT in this list: at the registered k=4
        # the within-cluster pair set is (N/4)^2 — ~31G cosines at
        # 100x, quadratic BY CONSTRUCTION (SemDeDup's whole design is
        # k growing with N); its scale evidence is the k-policy probe
        # below, which holds per-cluster size constant.
        "zipf_slope",
        # pmi: vocabulary-keyed counts + token-keyed joins;
        # moments: 4-double state per source
        "pmi_collocations",
        "moments_quantiles",
        # bloom decontamination: KB filter broadcast; candidate set,
        # not the corpus, reaches the exact join
        "bloom_decontaminate",
        # rfc robots: rule dim broadcast over the 100x URL stream
        "robots_rfc_match",
        # coverage/diversity: vocabulary-keyed aggregates over the
        # salted 100x gram space
        "vocab_coverage",
        "ngram_diversity",
        # block-max metadata: (term, block)-keyed map-side agg over
        # the 100x posting stream
        "block_max_index",
        # incremental LSH: delta x (base U delta) bucket join — the
        # per-increment cost bound is the point being measured
        "lsh_delta_pairs",
        # PQ-ADC: codegen encode + LUT top-k over the replicated
        # embedding table (opic_cash/spam_mass are round-latency-
        # bound like pagerank_ranks and are probed through the graph
        # probes' shared edge builder instead)
        "ann_pq_adc",
        # range coalescing: per-file windows over the 100x record
        # stream — the file axis is what grows
        "warc_range_coalesce",
        # round 4f. good-turing: (source, token)-keyed count agg over
        # the salted 100x token stream (per-copy df constant -> the
        # frequency table grows linearly); tfidf keywords: (doc,term)
        # tf agg + doc_id-partitioned rank window, both axes linear;
        # HRW: scan-projection assignment + 9-group aggs
        "gt_unseen_mass",
        "tfidf_keywords",
        "rendezvous_assign",
        # round 4f (cont.) + 4g. wand: the query vocabulary is FIXED
        # (terms live in copy 0) while the corpus and the block-UB
        # table grow 100x — the realistic retrieval shape; heaps:
        # vocabulary-keyed agg, 20 OLS points; novelty: salted
        # shingles make cross-copy overlap zero, base/delta distinct
        # sets and the anti-join grow linearly; ccnet: the reference
        # LM grows with ref vocabulary (still model-sized vs corpus)
        # and scoring is one doc-keyed agg; classifier: pure scan
        # projection + two aggs; ef: distinct postings 100x, df per
        # term constant so gap bands shift up with N
        "wand_topk",
        "heaps_law",
        "shingle_novelty",
        "ccnet_ppl_buckets",
        "hashed_classifier_score",
        "ef_postings_size",
        # logreg: 8 GD passes over the cached sparse feature table —
        # per-step state collected is 64 rows at ANY corpus size;
        # mmr: corpus-sized work is only the relevance top-k, the
        # pool/greedy are constant-bounded
        "logreg_quality_train",
        "mmr_diversify",
        # funnel: one (doc,token) agg + 4-row arithmetic; containment:
        # bench dim broadcast (grows with the bench slice, stays
        # eval-suite-shaped), corpus stream 100x
        "filter_cascade_funnel",
        "benchmark_containment",
        # cdc: posexplode + doc-keyed running-sum window; chunk-hash
        # rows after the group — the chunk_dedup_rewrite scale class
        "cdc_chunk_profile",
    ]
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    if only:
        registry = [n for n in registry if n in only]
    for name in registry:
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
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
        print(f"{name:28s} {t_small:7.2f}s -> {t_big:7.2f}s  "
              f"x{t_big / t_small:6.2f}", file=sys.stderr)

    # policy-lever queries: nbits 6 @ sf0.1 -> 14 @ 100x
    # (constant bucket occupancy: 2^nbits/(nbits+1) scales with N)
    from edgar_crawler_spark.operators.similarity import (  # noqa: PLC0415
        knn_graph,
        lsh_neardup_pairs,
    )
    from edgar_crawler_spark.tables import load_table  # noqa: PLC0415

    policy = [
        ("knn_graph", knn_graph,
         dict(k=5, nbits=6, dim=DIM), dict(k=5, nbits=14, dim=DIM)),
        ("embedding_neardup", lsh_neardup_pairs,
         dict(threshold=0.35, nbits=6, dim=DIM),
         dict(threshold=0.35, nbits=14, dim=DIM)),
    ]
    if only:  # positional names filter the policy pair too
        policy = [p for p in policy if p[0] in only]
    for name, fn, small_kw, big_kw in policy:
        t0 = time.perf_counter()
        force(fn(load_table(spark, SRC, "embeddings"), **small_kw))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(fn(load_table(spark, DST, "embeddings"), **big_kw))
        t_big = time.perf_counter() - t0
        release_caches()
        out[f"{name}@policy"] = {
            "sf0.1_sec": round(t_small, 3),
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "nbits": f"{small_kw['nbits']}->{big_kw['nbits']}",
        }
        print(f"{name + '@policy':28s} {t_small:7.2f}s -> {t_big:7.2f}s  "
              f"x{t_big / t_small:6.2f}", file=sys.stderr)

    # iterative-graph probes: the registered fixtures pin the node
    # space at mod=200 (saturated by sf0.1's 100k events), so the
    # 100x side grows mod to 20000 — measured 36.5k -> 3.99M distinct
    # edges (109x) on the replicated log. Same registered code path,
    # same iters; only the node-space knob moves.
    from edgar_crawler_spark.queries import (  # noqa: PLC0415
        hits_frames,
        pagerank_ranks,
        trustrank_ranks,
    )

    from edgar_crawler_spark.queries import (  # noqa: PLC0415
        bowtie_counts,
        hyperanf_rows,
    )

    from edgar_crawler_spark.queries import salsa_frames  # noqa: PLC0415

    graph = [
        ("pagerank_ranks", pagerank_ranks),
        ("hits_frames", hits_frames),
        ("trustrank_ranks", trustrank_ranks),
        ("salsa_frames", salsa_frames),
        # sketch-only at scale (with_exact=False): the closure twin is
        # the toy-scale verification column, O(N^2) by definition
        ("hyperanf_rows", lambda spark, sf, iters, mod: hyperanf_rows(
            spark, sf, mod=mod, iters=iters, with_exact=False)),
        ("bowtie_counts", lambda spark, sf, iters, mod: bowtie_counts(
            spark, sf, mod=mod)),
    ]
    if only:
        graph = [g for g in graph if g[0] in only]
    if "--policy-only" in sys.argv:
        graph = []
    for name, fn in graph:
        t0 = time.perf_counter()
        force(fn(spark, SRC, iters=3, mod=200))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(fn(spark, DST, iters=3, mod=20000))
        t_big = time.perf_counter() - t0
        release_caches()
        out[f"{name}@mod20000"] = {
            "sf0.1_sec": round(t_small, 3),
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "edges": "36.5k->3.99M (109x)",
        }
        print(f"{name + '@mod20000':28s} {t_small:7.2f}s -> "
              f"{t_big:7.2f}s  x{t_big / t_small:6.2f}", file=sys.stderr)

    # co-citation: the pair join is keyed on the citing page with the
    # outdegree cap bounding fanout; the node-space mod grows with the
    # event count (rank-builder rule) so average outdegree — and the
    # per-source pair fanout — stays comparable while sources x100
    from edgar_crawler_spark.queries import cocitation_counts  # noqa: PLC0415

    if ("--policy-only" not in sys.argv) and (
        not only or "cocitation_pairs" in only
    ):
        t0 = time.perf_counter()
        force(cocitation_counts(spark, SRC, mod=20000))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(cocitation_counts(spark, DST, mod=2000000))
        t_big = time.perf_counter() - t0
        release_caches()
        out["cocitation_pairs@mod2M"] = {
            "sf0.1_sec": round(t_small, 3),
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "mod": "20k->2M (degree-matched)",
        }
        print(f"{'cocitation_pairs@mod2M':28s} {t_small:7.2f}s -> "
              f"{t_big:7.2f}s  x{t_big / t_small:6.2f}", file=sys.stderr)

    # semdedup k-policy probe: per-cluster size held ~constant by
    # scaling k with N (4 at sf0.1 -> 40 at the 10x replica set from
    # tools/bench_sf1.py; the 10x decade is the probe because the
    # POLICY, not the decade, is what is under test). k=40 uses the
    # broadcast-join assignment (literal codegen caps at k*dim ~ 1k).
    from edgar_crawler_spark.queries import semdedup_counts  # noqa: PLC0415

    SF1_DST = "/tmp/ecs_sf1"
    if (not only or "semdedup_prune" in only) and "--policy-only" not in sys.argv:
        if os.path.exists(SF1_DST):
            t0 = time.perf_counter()
            force(semdedup_counts(spark, SRC, k=4))
            t_small = time.perf_counter() - t0
            release_caches()
            t0 = time.perf_counter()
            force(semdedup_counts(spark, SF1_DST, k=40))
            t_big = time.perf_counter() - t0
            release_caches()
            out["semdedup_prune@kpolicy"] = {
                "sf0.1_sec": round(t_small, 3),
                "x10_sec": round(t_big, 3),
                "ratio": round(t_big / t_small, 2),
                "k": "4->40 (k scales with N)",
            }
            print(f"{'semdedup_prune@kpolicy':28s} {t_small:7.2f}s -> "
                  f"{t_big:7.2f}s  x{t_big / t_small:6.2f} (10x data)",
                  file=sys.stderr)
        else:
            print("semdedup k-policy probe skipped: run tools/bench_sf1.py"
                  " first to build /tmp/ecs_sf1", file=sys.stderr)

    # k-core: background node space grows with the event count (the
    # rank-builder rule); the planted dense block grows too (60 ->
    # 6000) so the core stays a structure, not a saturated clique
    from edgar_crawler_spark.queries import kcore_nodes  # noqa: PLC0415

    if ("--policy-only" not in sys.argv) and (
        not only or "kcore_peel" in only
    ):
        t0 = time.perf_counter()
        force(kcore_nodes(spark, SRC, mod=3000, dense=60))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(kcore_nodes(spark, DST, mod=300000, dense=6000))
        t_big = time.perf_counter() - t0
        release_caches()
        out["kcore_peel@mod300k"] = {
            "sf0.1_sec": round(t_small, 3),
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "mod": "3k->300k, dense 60->6k",
        }
        print(f"{'kcore_peel@mod300k':28s} {t_small:7.2f}s -> "
              f"{t_big:7.2f}s  x{t_big / t_small:6.2f}", file=sys.stderr)

    # connected components: like the rank probes, the node-space mod
    # grows with the event count (50k -> 5M) so average degree and
    # component structure stay comparable; rounds stay O(log^2 n)
    from edgar_crawler_spark.queries import (  # noqa: PLC0415
        cc_component_summary,
    )

    if ("--policy-only" not in sys.argv) and (
        not only or "connected_components" in only
    ):
        t0 = time.perf_counter()
        force(cc_component_summary(spark, SRC, mod=50000))
        t_small = time.perf_counter() - t0
        release_caches()
        t0 = time.perf_counter()
        force(cc_component_summary(spark, DST, mod=5000000))
        t_big = time.perf_counter() - t0
        release_caches()
        out["connected_components@mod5M"] = {
            "sf0.1_sec": round(t_small, 3),
            "x100_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "mod": "50k->5M",
        }
        print(f"{'connected_components@mod5M':28s} {t_small:7.2f}s -> "
              f"{t_big:7.2f}s  x{t_big / t_small:6.2f}", file=sys.stderr)

    print(json.dumps({"probe": "x100_plan_stability", "copies": COPIES,
                      "queries": out}))


if __name__ == "__main__":
    main()
