"""Physical-plan audit: assert the plans are the plans we designed.

For each audited query this checks the properties that matter at
100 TB — filters reaching the scan, projections pruned, small dims
broadcast, top-k compiling to TakeOrderedAndProject instead of a global
sort, map-side pipelines staying shuffle-free — straight from
`.explain("formatted")` output. Run as a script to see every plan and
the audit verdicts; the pytest suite runs the same assertions
(tests/test_plans.py).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgar_crawler_spark.queries import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# (query, must_contain regexes, must_NOT_contain regexes)
AUDITS: list[tuple[str, list[str], list[str]]] = [
    # predicate + column pruning pushed into the parquet scan
    ("type_filter", [r"PushedFilters: \[.*(In|IsNotNull)", r"BatchScan|Scan parquet"], []),
    # anti-join against a small seen set broadcasts (no fact shuffle)
    ("urlseen_antijoin", [r"BroadcastHashJoin .*LeftAnti|BroadcastNestedLoop.*LeftAnti"], [r"SortMergeJoin"]),
    # dimension enrichment is broadcast, fact side never exchanges on the key
    ("broadcast_enrich", [r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # global top-k must be TakeOrderedAndProject, not a full sort
    ("priority_topk", [r"TakeOrderedAndProject"], [r"\+- Sort .*global=true"]),
    ("ann_cosine_topk", [r"TakeOrderedAndProject"], []),
    # wide agg: map-side partial aggregation, shuffle only on group keys,
    # and the date filter pushed to the scan
    ("pricing_summary",
     [r"partial_sum", r"hashpartitioning\(l_returnflag", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"],
     []),
    # dedup shuffles hashes, not text: partial agg before the exchange,
    # exchange key is the md5 column, and text is NOT in the shuffle
    ("dedup_exact",
     [r"partial_min", r"hashpartitioning\(text_hash"],
     [r"hashpartitioning\([^)]*text#"]),
    # near-dup pair candidate joins must key on the high-cardinality
    # LSH bucket, never the low-cardinality metadata columns (which
    # should be pruned from the scan entirely) — VERDICT r01 #2/#3
    ("jaccard_bigram_pairs",
     [r"Left keys \[2\]: \[band#\d+, bkey#\d+\]"],
     [r"source#"]),
    ("embedding_neardup",
     [r"Left keys \[1\]: \[probe#\d+\]", r"Right keys \[1\]: \[bucket#\d+\]"],
     [r"label#"]),
    # scan-projection-only analytics: zero shuffles, zero python
    ("langid_ngram", [r"Scan parquet"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    ("split_assign", [r"Scan parquet"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    ("embedding_quantize", [r"Scan parquet"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # two-pass IDF: the vocabulary dim joins back as a BROADCAST
    ("idf_doc_score", [r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # multimodal resize: exactly one Arrow python stage, no shuffle
    ("media_resize", [r"MapInPandas"], [r"Exchange"]),
    # token stats are pure JVM expressions — no python eval anywhere
    # (higher-order functions fall out of whole-stage codegen by design,
    #  but they must never fall back to python)
    ("token_stats", [r"Project"],
     [r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas"]),
    # as-of join: the type filter reaches the scan, exactly ONE exchange
    # (on user_id) feeds the window — no range cross-product, no python
    ("asof_last_view",
     [r"PushedFilters: \[.*In\(event_type", r"hashpartitioning\(user_id#\d+L, \d+\), ENSURE_REQUIREMENTS",
      r"\(\d+\) Window"],
     [r"NestedLoop|CartesianProduct|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # decontamination: the candidate join keys on the md5 shingle (a
    # broadcast at this SF; shuffle-hash on the hash key at scale) and
    # no shuffle ever carries the text column
    ("ngram_contamination",
     [r"BroadcastHashJoin|SortMergeJoin", r"hashpartitioning\(s#\d+"],
     [r"hashpartitioning\([^)]*text#", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # vocabulary top-k: map-side partial counts + TakeOrderedAndProject
    ("vocab_topk",
     [r"partial_count", r"TakeOrderedAndProject"],
     [r"\+- Sort .*global=true"]),
    # exact quantiles via value histogram (VERDICT r02 #1): count-only
    # map-side partial agg, NO percentile buffering, the scan reads only
    # (source, n_chars), and the histogram is cache-reused across the
    # totals and rank-lookup branches (single corpus scan)
    ("length_quantiles",
     [r"partial_count", r"ReadSchema: struct<source:string,n_chars:bigint>",
      r"InMemoryTableScan"],
     [r"percentile", r"ObjectHashAggregate"]),
    # packing via two-pass distributed prefix-sum (VERDICT r02 #2): the
    # DOC-level window keys on the composite (source, _shard) — its sort
    # order carries doc_id — so no source serializes onto one partition;
    # pass-1 output is cache-reused by the shard-offset branch
    ("pack_sequences",
     [r"hashpartitioning\(source#\d+, _shard#\d+L, \d+\), ENSURE_REQUIREMENTS",
      r"source#\d+ ASC NULLS FIRST, _shard#\d+L ASC NULLS FIRST, doc_id#\d+L ASC",
      r"\(\d+\) Window", r"InMemoryTableScan"],
     [r"SinglePartition|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # decile report via histogram + broadcast boundary ranks (VERDICT
    # r02 #3): no per-row ntile (no corpus-wide single-partition sort);
    # the only ordered pass runs over the count-aggregated histogram
    ("quality_deciles",
     [r"partial_count", r"BroadcastNestedLoopJoin|BroadcastHashJoin",
      r"InMemoryTableScan"],
     [r"ntile", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # filtered anti-join with a non-empty expected difference (VERDICT
    # r02 #6): priority predicate pushed to the probe-side scan
    ("missing_firms",
     [r"PushedFilters: \[.*In\(o_orderpriority",
      r"BroadcastHashJoin LeftAnti|BroadcastNestedLoop.*LeftAnti"],
     [r"SortMergeJoin"]),
    # stratified sampling: scan-projection filter only — whole-stage
    # codegen, zero exchanges, zero python
    ("stratified_sample",
     [r"Scan parquet"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # mixture weights: ONE corpus scan (the global min comes from a
    # window over the per-source agg, not a second aggregation scan)
    ("mixture_weights",
     [r"partial_sum", r"\(\d+\) Window"],
     [r"(?s)\(\d+\) Scan parquet.*\(\d+\) Scan parquet", r"NestedLoop"]),
    # HLL sketch: registers max-merge MAP-SIDE (partial_max), the
    # register shuffle keys on the bucket (<= 512 rows per partition)
    ("hll_distinct",
     [r"partial_max", r"hashpartitioning\(bucket#\d+"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # CUBE: grouping sets via the Expand operator feeding ONE partial
    # agg — no per-grouping-set rescan
    ("cube_status_year",
     [r"Expand", r"partial_count"],
     [r"(?s)\(\d+\) Scan parquet.*\(\d+\) Scan parquet"]),
    # pivot with enumerated values: single scan (no distinct-values
    # discovery pass), conditional aggregates, no python
    ("pivot_status_year",
     [r"partial_count"],
     [r"(?s)\(\d+\) Scan parquet.*\(\d+\) Scan parquet",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # session windows: one exchange on the session key feeds the
    # engine's session-window aggregation — no self-join, no python
    ("session_window_agg",
     [r"hashpartitioning\(user_id#\d+L", r"(?i)session"],
     [r"SortMergeJoin|NestedLoop|BatchEvalPython|ArrowEvalPython"]),
    # inverted index (VERDICT r02 #4): the head (stopword) token set is
    # broadcast-ANTI-joined out BEFORE the posting-list aggregate, so
    # collect_list only ever sees df-bounded groups; partial agg before
    # the exchange; the collect_list shuffle carries (token, doc_id)
    ("inverted_index",
     [r"partial_", r"hashpartitioning\(token#\d+",
      r"BroadcastHashJoin LeftAnti"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # fuzzy entity pairs: equi-join keyed on the blocking prefix, and
    # levenshtein must NOT be a join condition evaluated pre-block
    ("entity_fuzzy_pairs",
     [r"Left keys \[1\]: \[blk#\d+\]"],
     [r"CartesianProduct|BroadcastNestedLoopJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # JSON payload agg: typed from_json in the projection, one scan,
    # shuffle carries only (event_type, partials)
    ("props_json_agg",
     [r"from_json", r"partial_count"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # one-pass DQ profile: a single scan feeds all expectations
    ("dq_profile",
     [r"partial_count"],
     [r"(?s)\(\d+\) Scan parquet.*\(\d+\) Scan parquet"]),
    # BPE pair counting: top-k never a global sort
    ("bpe_pair_counts",
     [r"partial_count", r"TakeOrderedAndProject"],
     [r"\+- Sort .*global=true", r"BatchEvalPython|ArrowEvalPython"]),
    # kNN graph: candidate generation is an EQUI-join on (probe,
    # bucket) — never a bit_count theta-join — and the per-source rank
    # window partitions on the high-cardinality src id
    ("knn_graph",
     [r"Left keys \[1\]: \[probe#\d+\]", r"Right keys \[1\]: \[bucket#\d+\]",
      r"hashpartitioning\(src#\d+L"],
     [r"CartesianProduct", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # grouped HLL: registers max-merge map-side; the register shuffle
    # keys on (source, bucket) — at most |sources| x 512 rows
    ("hll_by_source",
     [r"partial_max", r"hashpartitioning\(source#\d+, bucket#\d+"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # vocab overlap: the pair join keys on the TOKEN (vocabulary-sized
    # relation), per-source sizes come back as broadcasts
    ("vocab_jaccard_sources",
     [r"Left keys \[1\]: \[t#\d+\]", r"BroadcastHashJoin",
      r"InMemoryTableScan"],
     [r"CartesianProduct|BroadcastNestedLoopJoin"]),
    # sparse cosine: pair scores via the token-keyed join with map-side
    # partial sums on (id_a, id_b); never an all-pairs product
    ("sparse_cosine_pairs",
     [r"Left keys \[1\]: \[t#\d+\]", r"partial_sum", r"InMemoryTableScan"],
     [r"CartesianProduct", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # span-duplication profile: shuffles carry the md5 span hash, never
    # the text column
    ("dup_span_profile",
     [r"partial_count", r"hashpartitioning\(s#\d+"],
     [r"hashpartitioning\([^)]*text#",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # rule-based quality filter: pure scan projection — no exchange,
    # no python, and only (doc_id, text) read
    ("gopher_quality_filter",
     [r"Scan parquet", r"ReadSchema: struct<doc_id:bigint,text:string>"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # PII scan: pure scan projection (regex in codegen, no python)
    ("pii_scan",
     [r"Scan parquet", r"ReadSchema: struct<doc_id:bigint,text:string>"],
     [r"Exchange|BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # URL canonicalization: distinct aggregates expand into ONE
    # two-phase plan (Expand + partial agg on the composite key) — a
    # single scan, no python
    ("url_canonical_hosts",
     [r"Expand", r"partial_count"],
     [r"(?s)\(\d+\) Scan parquet.*\(\d+\) Scan parquet",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # k-means: the FINAL assignment is a literal-centroid codegen
    # projection — no join anywhere; one map-side-combined agg on the
    # cluster id
    ("kmeans_embeddings",
     [r"partial_count", r"hashpartitioning\(cl#\d+"],
     [r"Join|CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # canonical-doc selection: the rank window partitions on the
    # high-cardinality cluster id (never a corpus-wide sort), and only
    # the multi-member (near-dup) subset reaches it via the semi-join
    ("dedup_canonical",
     [r"\(\d+\) Window", r"hashpartitioning\(cluster_id#\d+L",
      r"LeftSemi"],
     [r"SinglePartition", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # host-fair interleave: per-host rank window + global top-k that
    # compiles to TakeOrderedAndProject — no global sort of the
    # frontier
    ("frontier_fair_topk",
     [r"TakeOrderedAndProject", r"hashpartitioning\(host#\d+"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # BM25: idf/stats re-enter as broadcasts, candidate tf relation is
    # query-vocabulary-bounded, top-k never a global sort
    ("bm25_topk",
     [r"TakeOrderedAndProject", r"BroadcastHashJoin",
      r"InMemoryTableScan"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # PageRank: each round ends in a localCheckpoint (VERDICT r03 #1 —
    # the per-round lineage cut), so the FINAL plan reads the last
    # round's materialized RDD (Scan ExistingRDD), not a 2^iters join
    # tree; the top-k compiles to TakeOrderedAndProject, never a
    # global sort; no python anywhere
    ("pagerank_topk",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD"],
     [r"\+- Sort .*global=true", r"Join",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # weighted sampling: key in the scan projection, sample = top-k —
    # the corpus never shuffles (no Exchange at all)
    ("weighted_sample_topk",
     [r"TakeOrderedAndProject", r"Scan parquet"],
     [r"Exchange", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # 10-iteration PageRank: the lineage cut means the final plan is
    # just top-k over the last round's materialized RDD — no join tree
    ("pagerank_deep",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD"],
     [r"\+- Sort .*global=true", r"Join",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # BFS: per-round checkpoints — final plan is one aggregate over
    # the visited RDD, no join above it
    ("bfs_reachability",
     [r"HashAggregate", r"Scan ExistingRDD"],
     [r"Join", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # revisit resolution: ONE url-keyed exchange feeds both the LAG
    # window and the final aggregate; digests hashed in the scan
    # projection (text never shuffles)
    ("warc_revisit_resolve",
     [r"Window", r"hashpartitioning\(url", r"md5"],
     [r"SortMergeJoin", r"hashpartitioning\(text",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # robots eval: model-sized rule table broadcast (nested-loop on the
    # prefix predicate), per-URL window on the high-cardinality key
    ("robots_prefix_match",
     [r"BroadcastNestedLoopJoin", r"Window",
      r"windowspecdefinition\(event_id"],
     [r"SortMergeJoin", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # skew salting: first exchange keys (host, _salt) — the hot host
    # fans out — the second keys host over salt-bounded partials
    ("salted_host_agg",
     [r"hashpartitioning\(host#\d+, _salt#\d+",
      r"hashpartitioning\(host#\d+, \d+\)", r"partial_sum"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # bigram LM: instance table cached once, both model tables
    # broadcast back; outer-explode (no size>0 recompute at the scan)
    ("bigram_lm_xent",
     [r"BroadcastHashJoin", r"InMemoryTableScan"],
     [r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # KL drift: one (source, token) count pass; marginals broadcast;
    # 1-row corpus total enters as a broadcast cross join
    ("source_kl_drift",
     [r"BroadcastHashJoin", r"BroadcastNestedLoopJoin",
      r"InMemoryTableScan"],
     [r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # outlink discovery: extraction+resolution must stay codegen
    # (regexp in the projection), never Python; explode is the
    # outer Generate (no re-evaluating size() filter at the scan)
    ("outlink_resolve",
     [r"Generate", r"explode\(regexp_extract_all", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # the discovery anti-join keys on the high-cardinality canonical
    # dst; both distincts are hash aggregates
    ("frontier_expand",
     [r"Join type: LeftAnti", r"explode\(regexp_extract_all"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas",
      r"BroadcastNestedLoopJoin"]),
    # host graph + anchor corpus: same codegen-only contract; the
    # rollups are two-phase hash aggregates on composite keys
    ("host_linkgraph",
     [r"explode\(regexp_extract_all", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    ("anchor_text_stats",
     [r"zip_with|zipwith", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # reg-domain budgeting is a scan-projection regexp + one
    # two-phase agg; no join anywhere
    ("domain_budget",
     [r"HashAggregate", r"regexp_extract"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas", r"Join"]),
    ("sitemap_extract",
     [r"explode\(regexp_extract_all", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas", r"Join"]),
    # round 4c. recrawl: ONE exchange on the url key feeds both the
    # lag window and the per-url aggregate (partitioning reuse); the
    # estimator is pure codegen arithmetic
    ("recrawl_schedule",
     [r"Window", r"hashpartitioning\(url_id#\d+"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas", r"Join"]),
    # trap detection: scan-projection regexes + one two-phase agg on
    # (host, template); distinct-URL expansion is map-side partial
    ("url_trap_detect",
     [r"partial_count", r"regexp_replace", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas", r"Join"]),
    # boilerplate: the per-host doc-count dim broadcasts; trigram df
    # aggregates two-phase on (source, md5-hash); raw text must never
    # key an exchange
    ("boilerplate_ngrams",
     [r"BroadcastHashJoin", r"partial_count"],
     [r"SortMergeJoin", r"hashpartitioning\([^)]*text#",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # posting gaps: lag window partitioned on the token key; no
    # posting arrays (collect_list) anywhere
    ("postings_delta",
     [r"Window", r"hashpartitioning\(token#\d+"],
     [r"collect_list",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # reciprocity: equi-join on the flipped (src, dst) composite —
    # never a nested-loop product
    ("link_reciprocity",
     [r"Left keys \[2\]", r"HashAggregate"],
     [r"BroadcastNestedLoopJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # round 4d. connected components: the alternating loop checkpoints
    # every round, so the FINAL plan aggregates over materialized RDDs
    # (label join + rollup), never the unrolled star-contraction tree
    ("connected_components",
     [r"Scan ExistingRDD", r"HashAggregate"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # WARC round-trip: record build is codegen concat; ONE exchange
    # (the file grouping) feeds the blob assembly; the parser is the
    # single Arrow python stage
    ("warc_parse_roundtrip",
     [r"MapInPandas", r"hashpartitioning\(file_id#\d+"],
     [r"SortMergeJoin", r"BatchEvalPython"]),
    # SURT keys: regexp/split/reverse in the scan projection, one
    # two-phase agg on (surt, url), no join
    ("url_surt",
     [r"partial_count", r"regexp_extract"],
     [r"Join", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # politeness audit: ONE host-keyed exchange serves the lag window
    # AND the final per-host aggregate
    ("host_gap_compliance",
     [r"Window", r"hashpartitioning\(host#\d+"],
     [r"Join", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # soft-404: pure scan projection — regex + length in codegen,
    # zero Exchange, only (doc_id, text) read
    ("soft404_detect",
     [r"Scan parquet", r"ReadSchema: struct<doc_id:bigint,text:string>"],
     [r"Exchange", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # content drift: simhash collapses text to a LONG before any
    # shuffle; lag window + aggregate share the url_id key; raw text
    # never keys an exchange
    ("content_drift_simhash",
     [r"Window", r"hashpartitioning\(url_id#\d+"],
     [r"hashpartitioning\([^)]*text#", r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # chunk dedup rewrite: the first-occurrence window partitions on
    # the md5 chunk hash (high cardinality — never a global sort);
    # reassembly aggregates on doc_id; no join, no python
    ("chunk_dedup_rewrite",
     [r"\(\d+\) Window", r"md5\(cast\(col#\d+ as binary\)\) AS _w0",
      r"hashpartitioning\(_w0#\d+", r"hashpartitioning\(doc_id#\d+L"],
     [r"SinglePartition", r"Join",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # robots parsing: running-count window on the host key; the
    # user-agent group dimension joins back BROADCAST; no python
    ("robots_rules_parse",
     [r"\(\d+\) Window", r"BroadcastHashJoin"],
     [r"SortMergeJoin", r"SinglePartition",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # stratified A-ES: key in the scan projection, rank window on the
    # stratum key — never a global sort, no join, no python
    ("stratified_weighted_sample",
     [r"\(\d+\) Window", r"hashpartitioning\(source#\d+"],
     [r"\+- Sort .*global=true", r"SinglePartition", r"Join",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # CDX build: offsets are a per-file window prefix-sum — one
    # file-keyed exchange, everything else scan projection; no join,
    # no python, no global sort
    ("cdx_index_build",
     [r"\(\d+\) Window", r"hashpartitioning\(file_id#\d+L"],
     [r"\+- Sort .*global=true", r"SinglePartition", r"Join",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # k-core: per-round checkpoints — the FINAL plan is one degree
    # aggregate over the last round's materialized edge RDD, no join
    # tree above it
    ("kcore_peel",
     [r"HashAggregate", r"Scan ExistingRDD"],
     [r"Join", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # CMS: counter aggregate combines map-side (partial_count before
    # the exchange on the 1024-cell key) and the probe join reads the
    # sketch as a BROADCAST; top-k probes are TakeOrderedAndProject
    ("cms_heavy_hitters",
     [r"partial_count", r"hashpartitioning\(row#\d+", r"BroadcastHashJoin",
      r"TakeOrderedAndProject"],
     [r"SortMergeJoin", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # DSIR: the 512-row log-ratio table joins back as a BROADCAST,
    # selection is a top-k (never a global sort), bucket counts
    # partial-aggregate map-side; pure JVM throughout
    ("dsir_select",
     [r"BroadcastHashJoin", r"TakeOrderedAndProject", r"partial_count"],
     [r"SortMergeJoin", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # DUST: the pair generator is an EQUI-join on the content digest
    # (url inequality only as residual condition) — never a cartesian
    # product — and rule support partial-aggregates map-side
    ("dust_rules",
     [r"digest#\d+", r"partial_count"],
     [r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # HyperANF: the returned plan is a UNION of per-radius aggregates
    # over the per-round checkpointed register RDDs (lineage cut — the
    # pagerank_topk lesson), with only 1-row/sketch-sized broadcasts
    ("hyperanf_nf",
     [r"Union", r"Scan ExistingRDD"],
     [r"SortMergeJoin", r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # Zipf: one vocabulary-keyed aggregate (map-side partial), head
    # via TakeOrderedAndProject; the row_number window runs on the
    # post-limit bounded head, never a global sort of the vocabulary
    ("zipf_slope",
     [r"partial_count", r"TakeOrderedAndProject"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # SemDeDup: pairs only inside a cluster — equi-join on cl with
    # the id inequality residual, never a cartesian product
    ("semdedup_prune",
     [r"partial_count"],
     [r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # bowtie: final plan aggregates over checkpointed reach sets with
    # node-keyed classification joins; no global sort, no python
    ("bowtie_classify",
     [r"Scan ExistingRDD", r"HashAggregate"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # PMI: vocabulary-keyed count aggregates (map-side partial),
    # 1-row totals broadcast, top-k via TakeOrderedAndProject
    ("pmi_collocations",
     [r"partial_count", r"TakeOrderedAndProject"],
     [r"CartesianProduct\b.*\n.*Scan parquet",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # moments: ONE source-keyed aggregate carries the whole sketch
    # (partial sums map-side); exact-quantile verification joins as a
    # broadcast; no global sort, no python
    ("moments_quantiles",
     [r"partial_sum", r"BroadcastHashJoin"],
     [r"SortMergeJoin", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # bloom decontamination: the bit table joins as a BROADCAST (the
    # pre-filter), candidates verify afterwards; top-k, no python
    ("bloom_decontaminate",
     [r"BroadcastHashJoin", r"TakeOrderedAndProject"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # RFC robots: the per-host rule dim joins as a BROADCAST; the
    # longest-match rank is a (host, path)-keyed window; no python
    ("robots_rfc_match",
     [r"BroadcastHashJoin", r"\(\d+\) Window"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # harmonic centrality: per-round checkpointed registers; top-k by
    # the exact column is TakeOrderedAndProject; no python
    ("harmonic_centrality",
     [r"Scan ExistingRDD", r"TakeOrderedAndProject"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # coverage: bounded head via TakeOrderedAndProject, map-side
    # partials, 1-row total broadcast — never a full-vocab window
    ("vocab_coverage",
     [r"partial_count", r"TakeOrderedAndProject"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # diversity: one (source, n, gram)-keyed aggregate; the distinct
    # expands the key so no small key carries the corpus
    ("ngram_diversity",
     [r"partial_count"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # OPIC: state localCheckpoint-ed per round (flat plan, like
    # pagerank); the total-history normalizer enters as a 1-row
    # broadcast, and the final importance is a top-k, never a sort
    ("opic_cash",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD",
      r"BroadcastNestedLoopJoin"],
     [r"\+- Sort .*global=true", r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # block-max metadata: one map-side-combinable agg on (term, block);
    # df is a broadcast dim, no per-term window/sort anywhere
    ("block_max_index",
     [r"partial_count", r"BroadcastHashJoin"],
     [r"\bWindow\b", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # incremental LSH: candidates keyed on the (band, bkey) bucket —
    # never on a metadata column like source
    ("lsh_delta_pairs",
     [r"Left keys \[2\]: \[band#\d+, bkey#\d+\]"],
     [r"source#"]),
    # PQ-ADC: encoding + LUT scoring are codegen scan projections,
    # search is a top-k over codes — no shuffle before the take
    ("ann_pq_adc",
     [r"TakeOrderedAndProject"],
     [r"Exchange hashpartitioning", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # spam mass: both chains end checkpointed (flat lineage), the
    # Σpr/Σtr scale is a 1-row broadcast, final is a top-k
    ("spam_mass",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD",
      r"BroadcastNestedLoopJoin"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # range coalescing: every window rides the per-file partition key
    # (unbounded file axis), never a global sort
    ("warc_range_coalesce",
     [r"hashpartitioning\(file_id#"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # effective diameter: lag window + target over the T+1-row ANF
    # curve (radius-bounded, never data-sized); the curve's per-round
    # registers are checkpointed RDDs, the 1-row target broadcasts,
    # the hit row is a top-1 — no SMJ, no python
    ("effective_diameter",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD",
      r"BroadcastNestedLoopJoin"],
     [r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # SALSA: per-half-step checkpointed frames (hits discipline), the
    # degree-weighted edge tables cached, 1-row norm broadcasts, top-k
    ("salsa_scores",
     [r"TakeOrderedAndProject", r"Scan ExistingRDD",
      r"BroadcastNestedLoopJoin"],
     [r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # co-citation: pair generator is an EQUI-join on the citing page
    # (fanout-capped), pair counts map-side combined, head is top-k
    ("cocitation_pairs",
     [r"TakeOrderedAndProject", r"partial_count"],
     [r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # Good-Turing: (source, token) agg collapses the corpus to
    # vocabulary-sized state map-side; no python, no pair joins
    ("gt_unseen_mass",
     [r"partial_count"],
     [r"CartesianProduct", r"SortMergeJoin",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # keywords: the rank window partitions on doc_id (the growing
    # axis), tf map-side combined, final head a top-k
    ("tfidf_keywords",
     [r"hashpartitioning\(doc_id#", r"partial_count",
      r"TakeOrderedAndProject"],
     [r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # HRW: assignment is a scan projection (array_max over 9 structs)
    # — no Generate/explode, no per-key shuffle before the two
    # shard-keyed aggs
    ("rendezvous_assign",
     [r"partial_count"],
     [r"Generate", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # WAND: query-vocabulary isin bounds postings; theta is a top-k +
    # 1-row broadcast; survivors prune scoring via a block-keyed
    # LEFT-SEMI join (block count grows with the corpus — never
    # collected); final head a top-k
    ("wand_topk",
     [r"TakeOrderedAndProject", r"LeftSemi",
      r"BroadcastNestedLoopJoin"],
     [r"CartesianProduct\b.*\n.*Scan parquet",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # Heaps: one vocabulary-keyed agg -> source-sized points -> 1-row
    # OLS moments; regression never sees corpus-sized data
    ("heaps_law",
     [r"partial_count"],
     [r"\bWindow\b", r"\+- Sort .*global=true",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # novelty: shingles md5-hashed in the scan projection (text never
    # shuffles), base/delta distinct sets, hash-keyed left join
    ("shingle_novelty",
     [r"partial_count"],
     [r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # CCNet buckets: LM counts broadcast (vocab^2-bounded model dim),
    # scoring agg keyed on doc_id, thresholds a 1-row broadcast —
    # never a corpus-wide sort
    ("ccnet_ppl_buckets",
     [r"BroadcastHashJoin", r"BroadcastNestedLoopJoin",
      r"partial_count"],
     [r"\bWindow\b", r"\+- Sort .*global=true", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # hashed classifier: weight computed in the projection from the
    # bucket id — ZERO joins; two map-side-combined aggs
    ("hashed_classifier_score",
     [r"partial_avg|partial_sum"],
     [r"Join", r"\bWindow\b", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # EF size model: distinct postings -> vocab-sized df agg; corpus
    # size a 1-row broadcast; integer-exact bit widths (no float log2)
    ("ef_postings_size",
     [r"BroadcastNestedLoopJoin", r"partial_count"],
     [r"\bWindow\b", r"\+- Sort .*global=true", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # logreg training curve: per-step weights re-enter as broadcast
    # literal dims (model-sized); metrics derived from the cached
    # sparse feature table — never a corpus-wide sort or python UDF
    ("logreg_quality_train",
     [r"BroadcastHashJoin", r"partial_avg|partial_sum"],
     [r"\bWindow\b", r"\+- Sort .*global=true", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # MMR: corpus-sized work is ONLY the relevance top-k; the pool^2
    # sim table and every selection dim are broadcast (pool-bounded);
    # the final 5-row rank sort is not corpus-sized
    ("mmr_diversify",
     [r"TakeOrderedAndProject", r"BroadcastHashJoin"],
     [r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # funnel: ONE (doc,token) count agg feeds all three rules; the
    # funnel itself is arithmetic over a 4-row rule dim x 1-row total
    # — never a per-rule corpus re-pass, no window
    ("filter_cascade_funnel",
     [r"partial_count"],
     [r"\bWindow\b", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # containment: bench shingles broadcast into one equi-join over
    # the hashed corpus stream; (train,bench)-keyed count agg —
    # never an all-pairs product, text never shuffles
    ("benchmark_containment",
     [r"BroadcastHashJoin", r"partial_count"],
     [r"\bWindow\b", r"\+- Sort .*global=true", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
    # CDC: doc_id-keyed running-sum window (the growing axis), chunk
    # hash md5'd as a scalar after the group; no joins at all
    ("cdc_chunk_profile",
     [r"\bWindow\b", r"partial_count"],
     [r"Join", r"CartesianProduct",
      r"BatchEvalPython|ArrowEvalPython|MapInPandas"]),
]


def audit_one(name: str, plan: str, must: list[str], must_not: list[str]) -> list[str]:
    errors = []
    for pat in must:
        if not re.search(pat, plan):
            errors.append(f"{name}: expected /{pat}/ in plan")
    for pat in must_not:
        if re.search(pat, plan):
            errors.append(f"{name}: must NOT contain /{pat}/")
    return errors


def run_audits(spark, verbose: bool = False) -> list[str]:
    # other suites may have .cache()d test tables in this session; a
    # cached scan (InMemoryTableScan, all columns) would mask the
    # pushdown/pruning shapes these audits pin
    spark.catalog.clearCache()
    errors = []
    for name, must, must_not in AUDITS:
        df = QUERIES[name].fn(spark, SF)
        plan = plan_of(df)
        if verbose:
            print(f"\n===== {name} =====\n{plan}")
        errs = audit_one(name, plan, must, must_not)
        errors.extend(errs)
        print(f"{'ok  ' if not errs else 'FAIL'}  {name}" + ("" if not errs else f"  {errs}"))
    # extraction job: pure map-side — no Exchange anywhere
    from edgar_crawler_spark.operators.extract_job import extract_items_job
    from edgar_crawler_spark.tables import load_table

    pages_like = load_table(spark, SF, "documents").selectExpr(
        "concat('u', doc_id) AS url",
        "cast(text AS binary) AS html",
        "'1' AS cik", "'c' AS company", "'8-K' AS form_type",
        "'2020-01-01' AS filing_date", "'f' AS filename",
    )
    plan = plan_of(extract_items_job(pages_like))
    errs = audit_one("extract_items_job(map-side)", plan, [r"MapInPandas"], [r"Exchange"])
    errors.extend(errs)
    print(("ok  " if not errs else "FAIL") + "  extract_items_job(map-side)")
    return errors


if __name__ == "__main__":
    from edgar_crawler_spark.session import get_spark

    spark = get_spark("explain-audit", cores=4, shuffle_partitions=4)
    errs = run_audits(spark, verbose="-v" in sys.argv)
    print(f"\n{len(AUDITS) + 1 - len(set(e.split(':')[0] for e in errs))}"
          f"/{len(AUDITS) + 1} plan audits pass")
    sys.exit(1 if errs else 0)
