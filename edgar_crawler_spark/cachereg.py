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

import threading

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame

# guards _LIVE: queries may run from concurrent harness threads
# (ADVICE r03 #2 — the module-global list was not thread-safe)
_LOCK = threading.Lock()
_LIVE: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """`df.cache()` that registers the handle for later release."""
    df = df.cache()
    with _LOCK:
        _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.
    Call after the consumer has materialized the query result.

    Only the stopped-session/JVM-gone family is swallowed (there is
    nothing left to release then); any other unpersist failure — e.g.
    a wedged executor surfacing as a genuine Py4J error mid-release —
    re-raises after draining the registry, instead of being silently
    counted as released (ADVICE r03 #2)."""
    n = 0
    first_err: Exception | None = None
    while True:
        with _LOCK:
            if not _LIVE:
                break
            df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except (Py4JError, RuntimeError, AttributeError) as e:
            # stopped SparkContext raises RuntimeError/AttributeError
            # (None _jsc) or a Py4J "connection refused"; a live-session
            # Py4J failure is real — keep draining, re-raise the first
            msg = str(e).lower()
            stopped = (
                "stopped" in msg
                or "shut down" in msg
                or "connection refused" in msg
                or "nonetype" in msg
                or isinstance(e, AttributeError)
            )
            if not stopped and first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err
    return n
