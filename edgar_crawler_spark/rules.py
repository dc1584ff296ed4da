"""Driver-side Catalyst rewrite: auto-inject the bloom pre-filter into
URL-seen anti-joins.

SURVEY.md §7.3 floated one mechanism never built through round 4: a
rule that recognizes the reference's resume idiom — "frontier rows
whose URL is absent from the metadata ledger"
(/root/reference/download_filings.py:151-158) — written as a PLAIN
DataFrame anti-join, and injects the sharded-bloom pre-filter from
frontier/seen.py automatically, so callers declare intent and the
engine picks the physical strategy.

Why not SparkSessionExtensions.injectOptimizerRule? That API takes a
JVM `Rule[LogicalPlan]` class; a pure-PySpark repo has no JVM jar to
inject. And Spark's own InjectRuntimeFilter deliberately never
bloom-filters the preserved side of a LEFT ANTI join — a runtime
`might_contain` KEEP-filter on the left would need the complement of
the bloom, which a bloom cannot give without false drops. The correct
anti-join shape is a ROUTING split, not a filter:

    anti(F, S)  ==  F[!might_contain]  UNION  anti(F[might_contain], S)

(no false negatives ever, so the clear leg is exactly-unseen; the
suspect leg keeps exactness through the real anti-join). That rewrite
changes the operator tree, so it lives here as a driver-side rule over
the ANALYZED Catalyst plan, inspected and rebuilt through py4j +
`Dataset.ofRows` — the same pattern-match/transform contract as a
`Rule[LogicalPlan]`, minus the jar.

Scope (deliberately tight — this is an optimizer, exactness is the
contract):

- fires only when the anti-join's build side is MARKED as the seen
  ledger (`mark_seen_ledger(df)` → a `SubqueryAlias` the analyzer
  preserves), so unrelated anti-joins are never touched;
- single-column equality condition with the same name both sides
  (the `on="url"` shape); anything else passes through unchanged;
- the join must sit at the plan root under transparent
  attribute-only wrappers (Project of plain attributes /
  SubqueryAlias); a mid-tree rewrite would need exprId remapping of
  every ancestor reference — out of scope, callers apply the rule at
  the stage boundary where the crawler uses it anyway.

At 10^10 seen URLs the payoff is the one documented in seen.py: a
mostly-unseen frontier routes ~99% of rows around the shuffle
entirely; only the maybe-seen sliver pays the sort-merge anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .frontier.bloom import ShardedBloom
from .frontier.cuckoo import ShardedCuckoo
from .frontier.seen import build_sharded_bloom, filter_unseen

SEEN_LEDGER_ALIAS = "__seen_ledger__"


def mark_seen_ledger(df: DataFrame, alias: str = SEEN_LEDGER_ALIAS) -> DataFrame:
    """Tag a DataFrame as the URL-seen ledger so BloomAntiJoinRule may
    rewrite anti-joins against it. The tag is a plain SubqueryAlias —
    visible in the analyzed plan, erased by the optimizer, zero cost."""
    return df.alias(alias)


def _of_rows(spark: SparkSession, jplan) -> DataFrame:
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def _attr_only_project(jplan) -> list[str] | None:
    """Column names if `jplan` is a Project of bare attributes, else None."""
    if jplan.nodeName() != "Project":
        return None
    pl = jplan.projectList()
    names = []
    for i in range(pl.size()):
        e = pl.apply(i)
        if e.getClass().getSimpleName() != "AttributeReference":
            return None
        names.append(e.name())
    return names


def _subtree_has_alias(jplan, alias: str) -> bool:
    if jplan.nodeName() == "SubqueryAlias" and jplan.alias() == alias:
        return True
    ch = jplan.children()
    return any(_subtree_has_alias(ch.apply(i), alias) for i in range(ch.size()))


def _single_key(jjoin) -> str | None:
    """Join key name for `left.k = right.k` single-equality conditions."""
    opt = jjoin.condition()
    if not opt.isDefined():
        return None
    cond = opt.get()
    if cond.getClass().getSimpleName() != "EqualTo":
        return None
    lhs, rhs = cond.left(), cond.right()
    if (
        lhs.getClass().getSimpleName() != "AttributeReference"
        or rhs.getClass().getSimpleName() != "AttributeReference"
        or lhs.name() != rhs.name()
    ):
        return None
    return lhs.name()


@dataclass
class BloomAntiJoinRule:
    """Rewrite `anti-join(frontier, marked seen ledger)` to the
    bloom-routed split. Bloom params mirror frontier/seen.py; a
    prebuilt filter (e.g. the crawler's wave-persistent ShardedBloom,
    or the deletable cuckoo variant) short-circuits the build."""

    alias: str = SEEN_LEDGER_ALIAS
    n_shards: int = 16
    fpp: float = 0.01
    bloom: ShardedBloom | ShardedCuckoo | None = None
    # filled by apply(): how the last plan matched, for tests/logs
    last_action: str = field(default="", compare=False)

    def apply(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        plan = df._jdf.queryExecution().analyzed()

        # Walk through transparent wrappers down to the join.
        wrappers: list[list[str]] = []  # re-applied top-down after rewrite
        node = plan
        while True:
            names = _attr_only_project(node)
            if names is not None:
                wrappers.append(names)
                node = node.children().apply(0)
                continue
            if node.nodeName() == "SubqueryAlias":
                node = node.children().apply(0)
                continue
            break

        if node.nodeName() != "Join" or node.joinType().sql() != "LEFT ANTI":
            self.last_action = "no-op: root is not a left-anti join"
            return df
        key = _single_key(node)
        if key is None:
            self.last_action = "no-op: not a single same-named equality key"
            return df
        if not _subtree_has_alias(node.right(), self.alias):
            self.last_action = "no-op: right side is not the marked seen ledger"
            return df

        frontier = _of_rows(spark, node.left())
        seen = _of_rows(spark, node.right())
        bloom = self.bloom
        if bloom is None:
            bloom = self.bloom = build_sharded_bloom(
                seen, url_col=key, n_shards=self.n_shards, fpp=self.fpp
            )
        out = filter_unseen(frontier, seen, bloom, url_col=key)
        for names in reversed(wrappers):
            out = out.select(*names)
        self.last_action = f"rewrote left-anti on {key!r} to bloom-routed split"
        return out


def optimize(df: DataFrame, rules: list | None = None) -> DataFrame:
    """Apply driver-side plan rules (default: BloomAntiJoinRule) once
    each, in order — the engine's stage-boundary optimizer hook."""
    for rule in rules if rules is not None else [BloomAntiJoinRule()]:
        df = rule.apply(df)
    return df
