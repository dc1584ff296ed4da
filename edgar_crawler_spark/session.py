"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same settings apply
per-executor. All defaults are chosen for the 100 TB design point:
AQE on (runtime re-plan + skew-join splitting), Arrow on (every custom
operator here is a pandas/Arrow UDF, never row-at-a-time), UTC pinned
so results compare bit-for-bit against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "edgar_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]. shuffle_partitions defaults to the core
    count: at local scale 200 shuffle partitions would be ~190 empty
    files of scheduling overhead; on a cluster callers pass an explicit
    value sized so each shuffle partition is ~128MB.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env_cores) if env_cores else os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 4)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Extraction UDFs rebuild deep regex state; keep python workers alive.
        .config("spark.python.worker.reuse", "true")
        # Deterministic hashing inside python workers (anchor_hash etc.).
        .config("spark.executorEnv.PYTHONHASHSEED", "0")
        # Python DataSource connectors (sources/pyds.py) handle their
        # own predicate pushdown.
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
