"""Distributed BPE tokenizer training.

The classic byte-pair-encoding trainer as an iterative Spark job: each
round counts adjacent-symbol pair frequencies across the corpus (the
`bpe_pair_counts` query plan — explode of zipped neighbors, two-level
count, pair-vocabulary-sized shuffle), picks the most frequent pair
(count desc, then lexicographic — fully deterministic), and merges its
non-overlapping occurrences greedily left-to-right inside every
document via a NATIVE array fold (`F.aggregate`, no Python in the per-
token path). The only driver traffic per round is the ONE winning pair
— the same bounded-iteration shape as the Lloyd k-means in
operators/similarity.py.

Merged symbols join with a single space; input symbols come from
whitespace tokenization so a space can never occur inside an unmerged
symbol — merged symbols are therefore self-describing and rounds
compose ("a b" can later merge with "c" into "a b c").

Scale notes: per-round lineage is cut with localCheckpoint (iterative
plans otherwise grow unboundedly); the corpus stays partitioned by its
scan layout the whole time (the fold is a pure map); pair counting is
the only shuffle and it carries (pair, partial count), never
documents. Verified against a pure-Python reference implementation on
randomized corpora (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import spread, tokens_col


def merge_pair_col(w: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    occurrences in token array `w` into the single symbol
    'left right'. Non-overlapping: a symbol consumed by one merge
    cannot start another in the same round."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    return F.aggregate(
        w,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (t == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(lit_l, F.lit(" "), lit_r)),
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    w = F.col("w")
    pairs = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    )
    return (
        symbols.select(F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to `n_merges` BPE merges over `docs[text_col]`.

    Returns (merges, symbolized) where `merges` is the ordered merge
    list and `symbolized` the corpus as (doc_id, w: array<string>)
    after applying them. Stops early when no pair reaches
    `min_count`."""
    cur = (
        spread(docs)
        .select("doc_id", tokens_col(text_col).alias("w"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_count:
            break
        l, r = top[0].l, top[0].r
        merges.append((l, r))
        # localCheckpoint cuts the per-round lineage so the plan stays
        # one-fold deep regardless of merge count
        cur = cur.select(
            "doc_id", merge_pair_col(F.col("w"), l, r).alias("w")
        ).localCheckpoint()
    return merges, cur


def apply_bpe(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize new text with a trained merge list: fold the merges in
    training order. One composite projection, no shuffle."""
    w = tokens_col(text_col)
    for l, r in merges:
        w = merge_pair_col(w, l, r)
    return docs.select("doc_id", w.alias("w"))


def train_bpe_py(
    texts: list[str], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (the test oracle)."""
    corpora = [[t for t in s.lower().split() if t] for s in texts]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w in corpora:
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), _n = best
        merges.append((l, r))
        merged = l + " " + r
        out = []
        for w in corpora:
            nw: list[str] = []
            for t in w:
                if nw and nw[-1] == l and t == r:
                    nw[-1] = merged
                else:
                    nw.append(t)
            out.append(nw)
        corpora = out
    return merges
