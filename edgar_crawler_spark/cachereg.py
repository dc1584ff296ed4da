"""Tracked-cache registry (ADVICE r02: un-unpersisted `.cache()`s).

Several pair-generating queries cache an intermediate that is
referenced from multiple join sides (signatures, band tables, exploded
term tables). The cached plan must stay alive until the CALLER
materializes the returned DataFrame, so the query function itself
cannot unpersist it — but in a long-lived session (bench loop, the
driver's 50-query sweep) the leaked caches accumulate executor memory
until eviction pressure.

Fix: route every such `.cache()` through :func:`tracked_cache` and have
harness loops call :func:`release_caches` after each query's result is
materialized. `release_caches` is idempotent and safe mid-flight
(unpersist on a live plan only drops the storage level; recomputation
still yields correct results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """`df.cache()` that registers the handle for later release."""
    df = df.cache()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.
    Call after the consumer has materialized the query result."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
