"""URL-seen: distributed bloom build + (bloom pre-filter → exact anti-join).

Reference semantics (/root/reference/download_filings.py:151-158): a
frontier row survives iff its `html_index` URL is absent from the
metadata ledger. Exactness is non-negotiable (a false "seen" would
silently drop a filing), so the bloom is ONLY a pre-filter: rows the
bloom flags as maybe-seen go through an exact left-anti join; rows the
bloom clears skip the join entirely. At 10^10 seen URLs with a fresh
frontier that is mostly-unseen, the anti-join input shrinks by ~99%
(the bloom's true-positive + fpp fraction), which is the difference
between shuffling 10^10 rows and shuffling 10^8.
"""

from __future__ import annotations

from typing import Iterator
from uuid import uuid4

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import BloomFilter, ShardedBloom, shard_of_many
from .cuckoo import CuckooFilter, ShardedCuckoo

# per-python-worker deserialized-filter cache (see maybe_seen below)
_FILTER_CACHE: dict[str, "ShardedBloom | ShardedCuckoo"] = {}


def build_sharded_bloom(
    seen: DataFrame,
    url_col: str = "url",
    n_shards: int = 16,
    expected_per_shard: int | None = None,
    fpp: float = 0.01,
) -> ShardedBloom:
    """Build the sharded bloom distributed: every input partition folds
    its rows into per-shard bitmaps (map-side), then bitmaps OR-merge
    per shard in a tiny shuffle of `n_shards × partitions` rows. The
    driver only ever sees finished bitmaps.
    """
    if expected_per_shard is None:
        n = seen.count()
        expected_per_shard = max(64, (n + n_shards - 1) // n_shards)
    exp, p, ns = expected_per_shard, fpp, n_shards

    def fold(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local: dict[int, BloomFilter] = {}
        for pdf in pdfs:
            keys = pdf[url_col].astype(str).to_numpy(dtype=object)
            if len(keys) == 0:
                continue
            sh = shard_of_many(keys, ns)
            for s in np.unique(sh):
                bf = local.get(int(s))
                if bf is None:
                    bf = local[int(s)] = BloomFilter.empty(exp, p)
                bf.add_many(keys[sh == s].tolist())
        if local:
            yield pd.DataFrame(
                {
                    "shard": list(local.keys()),
                    "bitmap": [bf.to_bytes() for bf in local.values()],
                }
            )

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged: BloomFilter | None = None
        for raw in pdf["bitmap"]:
            bf = BloomFilter.from_bytes(bytes(raw))
            merged = bf if merged is None else merged.merge(bf)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [merged.to_bytes()]}
        )

    partial = seen.select(url_col).mapInPandas(fold, "shard int, bitmap binary")
    # per-shard OR-merge happens IN SPARK (groupBy shard → one reducer
    # per shard), so the driver collects exactly n_shards finished
    # bitmaps — never the partitions × n_shards partials. At 10^10
    # keys / 1024 shards a partial set is thousands × 12 MB (a driver
    # OOM); the finished set is 1024 × 12 MB spread over one tiny
    # shuffle whose reducers each touch only their shard.
    finished = partial.groupBy("shard").applyInPandas(
        or_merge, "shard int, bitmap binary"
    )
    shards = {
        int(r["shard"]): BloomFilter.from_bytes(bytes(r["bitmap"]))
        for r in finished.collect()
    }
    return ShardedBloom(n_shards=ns, shards=shards)


def build_sharded_cuckoo(
    seen: DataFrame,
    url_col: str = "url",
    n_shards: int = 16,
    expected_per_shard: int | None = None,
) -> ShardedCuckoo:
    """Cuckoo variant of `build_sharded_bloom` (deletable — see
    cuckoo.py for when to prefer it). Same distributed shape: partial
    per-shard filters fold map-side, then merge by fingerprint
    relocation (partial-key hashing makes that possible without the
    original keys)."""
    if expected_per_shard is None:
        n = seen.count()
        expected_per_shard = max(64, (n + n_shards - 1) // n_shards)
    exp, ns = expected_per_shard, n_shards

    def fold(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local: dict[int, CuckooFilter] = {}
        for pdf in pdfs:
            keys = pdf[url_col].astype(str).to_numpy(dtype=object)
            if len(keys) == 0:
                continue
            sh = shard_of_many(keys, ns)
            for s in np.unique(sh):
                cf = local.get(int(s))
                if cf is None:
                    cf = local[int(s)] = CuckooFilter.empty(exp)
                if not cf.add_many(keys[sh == s].tolist()):
                    raise OverflowError("cuckoo shard overflow; raise capacity")
        if local:
            yield pd.DataFrame(
                {
                    "shard": list(local.keys()),
                    "table": [cf.to_bytes() for cf in local.values()],
                }
            )

    def cf_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged: CuckooFilter | None = None
        for raw in pdf["table"]:
            cf = CuckooFilter.from_bytes(bytes(raw))
            if merged is None:
                merged = cf
            else:
                merged.merge(cf)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "table": [merged.to_bytes()]}
        )

    partial = seen.select(url_col).mapInPandas(fold, "shard int, table binary")
    # same shape as the bloom build: per-shard merge in Spark, driver
    # collects n_shards finished tables only (see comment there)
    finished = partial.groupBy("shard").applyInPandas(
        cf_merge, "shard int, table binary"
    )
    shards = {
        int(r["shard"]): CuckooFilter.from_bytes(bytes(r["table"]))
        for r in finished.collect()
    }
    return ShardedCuckoo(n_shards=ns, shards=shards)


def filter_unseen(
    frontier: DataFrame,
    seen: DataFrame,
    bloom: ShardedBloom | ShardedCuckoo | None,
    url_col: str = "url",
) -> DataFrame:
    """Frontier rows whose canonical URL is NOT in `seen` — exact.

    With a bloom: maybe-seen rows take the exact anti-join, clear rows
    bypass it, and the two legs union back. Without one, plain
    anti-join. `seen` is broadcast when small; at scale both sides
    hash-partition on the url (Catalyst picks SortMergeJoin and AQE
    handles residual skew — the url key is near-unique so none).
    """
    if bloom is None:
        return frontier.join(seen.select(url_col), on=url_col, how="left_anti")

    spark = frontier.sparkSession
    kind = "cuckoo" if isinstance(bloom, ShardedCuckoo) else "bloom"
    b = spark.sparkContext.broadcast((kind, bloom.to_rows()))
    ns = bloom.n_shards
    b_key = uuid4().hex  # unique per broadcast — never aliases filters

    @F.pandas_udf("boolean")
    def maybe_seen(urls: pd.Series) -> pd.Series:
        # deserialize the broadcast filter ONCE per python worker, not
        # once per Arrow batch — workers are reused across batches, so
        # without this every ~10k-row batch re-parses every shard
        # bitmap. Keyed on the broadcast identity; bounded (workers
        # see at most a handful of live filters).
        sb = _FILTER_CACHE.get(b_key)
        if sb is None:
            k, rows = b.value
            cls = ShardedCuckoo if k == "cuckoo" else ShardedBloom
            sb = cls.from_rows(ns, rows)
            while len(_FILTER_CACHE) >= 4:
                _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
            _FILTER_CACHE[b_key] = sb
        return pd.Series(sb.might_contain_many(urls.astype(str).tolist()))

    flagged = frontier.withColumn("_maybe_seen", maybe_seen(F.col(url_col)))
    clear = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspect = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    survivors = suspect.join(seen.select(url_col), on=url_col, how="left_anti")
    return clear.unionByName(survivors)
