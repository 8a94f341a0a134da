"""Physical-plan inspection: the tooling behind "explain and iterate".

The scale contract for every operator in this engine is checked against the
*plan*, not vibes: filters must reach the parquet scan (PushedFilters),
projections must prune the read schema (ReadSchema), small dims must
broadcast, and shuffle (Exchange) counts must match the operator's design.
tests/test_plan_shapes.py pins these properties so a regression that, say,
silently turns a broadcast join into a sort-merge join fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string (what explain("formatted")
    prints; PythonSQLUtils is the same helper DataFrame.explain uses)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in some PushedFilters: [...] list."""
    plan = physical_plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    return all(frag in pushed for frag in fragments)


def scan_read_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (ReadSchema) — the
    column-pruning check: a scan reading more than the query needs is a
    plan bug at 100 TB."""
    plan = physical_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        {c.split(":")[0].strip() for c in s.split(",") if c.strip()} for s in schemas
    ]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges).

    Counts node headers ``(n) Exchange`` in formatted mode — the tree lists
    bare node names; partitioning details live in the node sections.
    """
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", physical_plan(df)))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", physical_plan(df)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better; a span
    break in a hot path usually means an interpreted expression snuck in."""
    return len(set(re.findall(r"codegen id : (\d+)", physical_plan(df))))
