"""Consolidated-analysis stage (reference: consolidate_output.py).

Reference behavior (/root/reference/consolidate_output.py:64-313):
glob the per-filing JSON dir, flatten to records, project metadata +
selected item texts, derive `filing_year`, `fiscal_year` and
`{item}_length` columns (:158-186), compute summary aggregates
(:212-271), write an analysis CSV (:188-210).

Here the input is the extraction output DataFrame (one row per filing
with an `items` map — operators/extract_job.py), so the JSON-dir scan
disappears: selecting from the output table IS the scan, and Catalyst
prunes the map accesses down to the requested keys. All derivations
are native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def consolidate(
    extracted: DataFrame,
    items: list[str],
) -> DataFrame:
    """Per-filing analysis frame: metadata + item text + derived
    columns (consolidate_output.py:104-186)."""
    cols = [
        "url",
        "filename",
        "cik",
        F.col("form_type").alias("filing_type"),
        "filing_date",
        F.substring("filing_date", 1, 4).cast("int").alias("filing_year"),
    ]
    for it in items:
        text = F.coalesce(F.col("items").getItem(it), F.lit(""))
        cols.append(text.alias(it))
        cols.append(F.length(text).alias(f"{it}_length"))
    return extracted.select(*cols)


def summary_stats(consolidated: DataFrame, items: list[str]) -> DataFrame:
    """Per-item coverage summary (consolidate_output.py:236-252):
    non-empty count, coverage %, mean length. One narrow aggregate row
    per item, unioned."""
    total = consolidated.count()
    outs = []
    for it in items:
        outs.append(
            consolidated.agg(
                F.lit(it).alias("item"),
                F.count(F.when(F.col(f"`{it}_length`") > 0, 1)).alias("n_nonempty"),
                F.round(
                    F.count(F.when(F.col(f"`{it}_length`") > 0, 1)) * 100.0 / total, 2
                ).alias("coverage_pct"),
                F.round(F.avg(f"`{it}_length`"), 2).alias("avg_length"),
            )
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def write_analysis_csv(consolidated: DataFrame, path: str) -> None:
    """CSV sink (consolidate_output.py:188-210). Distributed write —
    one file per partition; a 100 TB consolidation never funnels
    through the driver."""
    consolidated.write.mode("overwrite").option("header", True).csv(path)
