"""Custom stateful streaming operator: URL-seen as
applyInPandasWithState.

The batch engine's URL-seen is bloom + anti-join against a committed
snapshot (frontier/seen.py). The streaming dual keeps the seen set in
the STATE STORE, keyed by url shard: each micro-batch of discovered
URLs flows through `applyInPandasWithState`, each shard's state holds
that shard's seen set, and only first-occurrences are emitted
downstream. The state store rides the streaming checkpoint, so a
restarted query resumes with its seen set intact — the streaming
version of snapshot exact-resume.

Scale notes:
- the shard key bounds per-group state and spreads it across
  executors (state store partitions follow the grouping key);
- state is a plain array<string> here; at 10^10 URLs per-shard state
  would hold the bloom BITMAP instead (same bytes as
  frontier/bloom.py serializes) + RocksDB state backend — the
  operator shape does not change, only the state payload;
- NoTimeout: a crawl's seen set never expires.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "url string, shard int"
STATE_SCHEMA = "urls array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdfs:
        for u in pdf["url"].astype(str):
            if u not in seen:
                seen.add(u)
                fresh.append(u)
    state.update((sorted(seen),))
    yield pd.DataFrame({"url": fresh, "shard": [key[0]] * len(fresh)})


def streaming_url_seen(urls: DataFrame, n_shards: int = 16) -> DataFrame:
    """urls: a STREAMING DataFrame with a `url` column. Returns the
    first-occurrence stream (exactly-once per url across all
    micro-batches and restarts, courtesy of the state store)."""
    sharded = urls.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_url_seen_stream(
    spark: Any,
    urls_path: str,
    out_path: str,
    checkpoint: str,
) -> Any:
    """Drive the operator: file-source stream -> stateful dedup ->
    parquet sink, availableNow (drain + stop)."""
    urls = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 4)
        .parquet(urls_path)
    )
    deduped = streaming_url_seen(urls)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
