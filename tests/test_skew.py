"""AQE skew-join handling: runtime split of a hot join key.

The dedup/near-dup candidate joins lean on AQE's skew-join for
mega-buckets (PLANS.md); this pins that the mechanism actually
engages in this engine's session config — a synthetic 95%-hot-key
join must show `isSkew=true` partitions in the FINAL adaptive plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestAqeSkewJoin:
    def test_hot_key_join_is_split(self, spark):
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        olds = {}
        # shrink the skew thresholds so the sandbox-sized hot key
        # qualifies; on a real cluster the defaults (256MB) apply
        tune = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        }
        for k, v in tune.items():
            olds[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        try:
            # left: 200k rows, 95% on key 0; right: 100 distinct keys
            left = (
                spark.range(200_000)
                .select(
                    F.when(F.col("id") % 20 != 0, F.lit(0))
                    .otherwise(F.col("id") % 100)
                    .alias("k"),
                    F.concat(F.lit("payload-"), F.col("id")).alias("v"),
                )
            )
            right = spark.range(100).select(
                F.col("id").alias("k"), F.lit("dim").alias("d")
            )
            joined = left.join(right, "k")
            # execute THIS DataFrame so its own AQE run finalizes, then
            # read the final adaptive plan from the same QueryExecution
            assert len(joined.collect()) == 200_000
            final_plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in final_plan
            assert "isSkew=true" in final_plan or "skewed" in final_plan.lower(), (
                final_plan[:2000]
            )
        finally:
            for k, v in olds.items():
                spark.conf.set(k, v)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
