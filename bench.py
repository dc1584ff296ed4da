"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line (<=2 KB): {"metric": ..., "value": total_sec,
"unit": "sec", "reps": ..., "sf": ..., "slowest": {10 keys},
"detail": path}. The FULL per-query/spread maps are written to
$SPARK_GRAFT_BENCH_OUT (default BENCH/bench_r05.json) — round 4's
92-key stdout line overflowed the driver's tail capture, so totals
live on stdout and maps live in the file.

Each query is forced end-to-end with a noop write (full computation,
no driver collect). A second section (run via tools/bench_scaling.py)
evidences the N->4N scaling criterion from BASELINE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from edgar_crawler_spark.cachereg import release_caches
from edgar_crawler_spark.queries import QUERIES
from edgar_crawler_spark.session import get_spark

# Headline set: one per operator family (scan+filter, anti-join,
# broadcast join, wide agg, window, set-op, dedup, text stats, ANN)
# plus the frontier scheduling queries.
HEADLINE = [
    "type_filter",
    "urlseen_antijoin",
    "broadcast_enrich",
    "pricing_summary",
    "count_by_year",
    "recent_per_firm",
    "keep_last_dedup",
    "union_dedup_merge",
    "priority_topk",
    "wave_assignment",
    "sessionize",
    "dedup_exact",
    "dedup_norm_exact",
    "simhash_dedup",
    "ann_lsh_topk",
    "token_stats",
    "quality_score",
    "fingerprint_prefix",
    "ann_cosine_topk",
    # round 2b additions (new operator families; earlier keys keep
    # their round-over-round comparability)
    "asof_last_view",
    "ngram_contamination",
    "vocab_topk",
    "pack_sequences",
    # round 3 additions
    "knn_graph",
    "sparse_cosine_pairs",
    "dup_span_profile",
    "url_canonical_hosts",
    "kmeans_embeddings",
    # round 4 additions (iterative-graph, CDX revisit, skew salting,
    # LM scoring families)
    "pagerank_deep",
    "bfs_reachability",
    "warc_revisit_resolve",
    "salted_host_agg",
    "bigram_lm_xent",
    "source_kl_drift",
    # round 4b: outlink discovery family
    "outlink_resolve",
    "frontier_expand",
    # round 4c: link analysis, re-crawl scheduling, corpus hygiene
    "hits_scores",
    "recrawl_schedule",
    "url_trap_detect",
    "boilerplate_ngrams",
    "postings_delta",
    "trustrank_topk",
    "link_reciprocity",
    "redirect_resolve",
    "lpa_communities",
    # round 4d: connected components, WARC surface, crawl hygiene
    "connected_components",
    "warc_parse_roundtrip",
    "url_surt",
    "host_gap_compliance",
    "soft404_detect",
    "content_drift_simhash",
    "chunk_dedup_rewrite",
    "robots_rules_parse",
    "stratified_weighted_sample",
    "cdx_index_build",
    "kcore_peel",
    # round 4e: mergeable sketches, importance selection, URL-rule
    # mining, graph sketching
    "cms_heavy_hitters",
    "dsir_select",
    "dust_rules",
    "hyperanf_nf",
    "zipf_slope",
    "semdedup_prune",
    # bowtie_classify is probed (tools/bench_sf10) but not a bench
    # headline: ~16 tiny BFS-round jobs make it scheduling-latency-
    # bound (~55s at ANY sf), which would swamp the per-round bench
    # comparison without measuring a plan
    "pmi_collocations",
    "moments_quantiles",
    "bloom_decontaminate",
    "robots_rfc_match",
    # harmonic_centrality: like bowtie, BFS-round-latency-bound —
    # probed (bench_sf10 graph probes) but not a bench headline
    "vocab_coverage",
    "ngram_diversity",
    # round 4f: OPIC crawl importance, block-max skip metadata,
    # incremental LSH dedup, PQ compression search, spam mass,
    # WARC range coalescing
    "opic_cash",
    "block_max_index",
    "lsh_delta_pairs",
    "ann_pq_adc",
    "spam_mass",
    "warc_range_coalesce",
    # round 4f (cont.): ANF-curve diameter, SALSA, co-citation,
    # Good-Turing saturation, keyword extraction, HRW sharding
    "effective_diameter",
    "salsa_scores",
    "cocitation_pairs",
    "gt_unseen_mass",
    "tfidf_keywords",
    "rendezvous_assign",
    # round 4f (cont.): block-max pruned retrieval, vocabulary-growth
    # fit, crawl-delta novelty
    "wand_topk",
    "heaps_law",
    "shingle_novelty",
    # round 4g: CCNet ppl gate, hashed linear classifier, EF size model
    "ccnet_ppl_buckets",
    "hashed_classifier_score",
    "ef_postings_size",
    "logreg_quality_train",
    "mmr_diversify",
    "filter_cascade_funnel",
    "benchmark_containment",
    "cdc_chunk_profile",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    # Warm the JVM + python workers once so per-query numbers measure
    # the plan, not interpreter startup.
    force(QUERIES["count_by_type"].fn(spark, sf_dir))

    # n>=3 passes, report per-query MEDIAN (VERDICT r02 #8: the n=2
    # r02 run showed +-25% per-query noise that read as regressions).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            q = QUERIES[name]
            t0 = time.perf_counter()
            force(q.fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            # pair-generator queries tracked-cache intermediates that
            # must live until the force() above; release them here so a
            # multi-pass loop doesn't accumulate executor memory.
            release_caches()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {name: round(median(xs), 3) for name, xs in samples.items()}
    spread = {
        name: round(max(xs) - min(xs), 3) for name, xs in samples.items()
    }

    # Extraction throughput (filings/sec) once the extract job exists.
    try:
        from tools.bench_extract import bench_extract  # noqa: PLC0415

        timings["extract_8k"] = round(bench_extract(spark), 3)
    except Exception:  # noqa: BLE001, S110
        pass

    print(emit(timings, spread, reps, sf_val=(
        float(sf) if sf.replace(".", "").isdigit() else sf
    )))


def emit(
    timings: dict[str, float],
    spread: dict[str, float],
    reps: int,
    sf_val: float | str,
    out_path: str | None = None,
) -> str:
    """Write full per-query/spread maps to a file and return the
    compact (<=2 KB, asserted) stdout line.

    Round 4's 92-key single-line map was ~5 KB; the driver's stdout
    tail capture kept only the last ~2 KB and BENCH_r04.json came out
    parsed:null. Totals + the 10 slowest keys go on stdout; the full
    maps go to $SPARK_GRAFT_BENCH_OUT (default BENCH/bench_r05.json);
    tools/bench_compare.py reads either shape.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "sf": sf_val,
    }
    out_path = out_path or os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(here, "BENCH", "bench_r05.json"),
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "reps": reps,
            "sf": sf_val,
            "n_queries": len(timings),
            "slowest": slowest,
            "detail": os.path.relpath(out_path, here),
        }
    )
    assert len(line) <= 2000, f"stdout bench line {len(line)}B > 2KB"
    return line


if __name__ == "__main__":
    main()
