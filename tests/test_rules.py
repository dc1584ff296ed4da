"""BloomAntiJoinRule: the driver-side Catalyst rewrite that injects the
sharded-bloom pre-filter into marked URL-seen anti-joins (rules.py —
SURVEY.md §7.3's injected-rule mechanism, re-expressed PySpark-side).

Covers: exactness vs the plain anti-join (incl. NULL urls), the plan
assertion (union + Arrow pre-filter appear; the exact anti-join
remains on the suspect leg only), transparent-wrapper handling, every
documented no-op guard, and bloom reuse across applies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from edgar_crawler_spark.rules import (
    BloomAntiJoinRule,
    mark_seen_ledger,
    optimize,
)


def _frontier(spark):
    # 200 urls + one NULL; 60 overlap the seen ledger.
    base = spark.range(200).selectExpr(
        "concat('https://www.sec.gov/f/', id) AS url", "id AS pri"
    )
    null_row = spark.sql("SELECT CAST(NULL AS STRING) AS url, -1L AS pri")
    return base.unionByName(null_row)


def _seen(spark):
    return spark.range(60).selectExpr(
        "concat('https://www.sec.gov/f/', id * 2) AS url"
    )


class TestBloomAntiJoinRule:
    def test_rewrite_is_exact_including_nulls(self, spark):
        frontier, seen = _frontier(spark), _seen(spark)
        plain = frontier.join(
            mark_seen_ledger(seen), on="url", how="left_anti"
        )
        rule = BloomAntiJoinRule()
        rewritten = rule.apply(plain)
        assert rule.last_action.startswith("rewrote left-anti on 'url'")
        assert rewritten.columns == plain.columns
        key = lambda r: (r["url"] or "", r["pri"])
        assert sorted(rewritten.collect(), key=key) == sorted(
            plain.collect(), key=key
        )
        # the NULL-url row never equals anything -> must survive
        assert rewritten.filter(F.col("url").isNull()).count() == 1

    def test_plan_shape_union_prefilter_and_residual_antijoin(self, spark):
        frontier, seen = _frontier(spark), _seen(spark)
        plain = frontier.join(mark_seen_ledger(seen), "url", "left_anti")
        rewritten = optimize(plain)
        plan = rewritten._jdf.queryExecution().executedPlan().toString()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        # routing split: clear leg ∪ suspect leg (CombineUnions may fold
        # it into the fixture's own null-row union — presence, not count)
        assert "Union" in plan
        # bloom pre-filter = Arrow-batched pandas UDF routing on _maybe_seen
        assert "ArrowEvalPython" in plan and "ArrowEvalPython" not in plain_plan
        assert "maybe_seen(" in plan and "maybe_seen(" not in plain_plan
        # exactness leg: the real anti-join is still there (suspects only)
        assert "LeftAnti" in plan

    def test_transparent_project_wrapper_is_reapplied(self, spark):
        frontier, seen = _frontier(spark), _seen(spark)
        wrapped = (
            frontier.join(mark_seen_ledger(seen), "url", "left_anti")
            .select("pri", "url")  # reorder: attribute-only Project
        )
        rule = BloomAntiJoinRule()
        out = rule.apply(wrapped)
        assert rule.last_action.startswith("rewrote")
        assert out.columns == ["pri", "url"]
        assert sorted(r["pri"] for r in out.collect()) == sorted(
            r["pri"] for r in wrapped.collect()
        )

    def test_noop_guards(self, spark):
        frontier, seen = _frontier(spark), _seen(spark)
        # unmarked ledger: never touched
        rule = BloomAntiJoinRule()
        plain = frontier.join(seen, "url", "left_anti")
        assert rule.apply(plain) is plain
        assert "not the marked seen ledger" in rule.last_action
        # wrong join type
        inner = frontier.join(mark_seen_ledger(seen), "url", "inner")
        assert rule.apply(inner) is inner
        assert "not a left-anti join" in rule.last_action
        # multi-key condition
        seen2 = mark_seen_ledger(seen.withColumn("pri", F.lit(0)))
        two_key = frontier.join(seen2, ["url", "pri"], "left_anti")
        assert rule.apply(two_key) is two_key
        assert "single same-named equality" in rule.last_action

    def test_bloom_built_once_then_reused(self, spark):
        frontier, seen = _frontier(spark), _seen(spark)
        rule = BloomAntiJoinRule()
        plain = frontier.join(mark_seen_ledger(seen), "url", "left_anti")
        rule.apply(plain)
        built = rule.bloom
        assert built is not None
        rule.apply(plain)
        assert rule.bloom is built
