"""As-of (time-travel) join — an operator Spark lacks natively
(SURVEY.md §2.3 J5).

Semantics: for each left row, attach the single right row with the same key
whose timestamp is the greatest one ≤ the left timestamp (backward as-of,
the pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` default).

Implementation is the union-window form, chosen for scale:

    tag(left=1, right=0) → union → window last_value(right payload)
    over (partition by key order by (ts, tag) rows unbounded preceding)

One shuffle on the key (the same shuffle any keyed join needs), no range
explosion, no per-group Python. The naive alternatives — non-equi join
(BroadcastNestedLoop, O(n·m)) or per-key ``merge_asof`` via applyInPandas
(Arrow hop + Python) — both collapse at 100 TB; this stays whole-stage
JVM with a single sort per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; right payload columns arrive as ``<col><suffix>``
    (null when no right row precedes the left row).

    Right rows with a NULL timestamp are EXCLUDED (pandas merge_asof
    raises on them; silently keeping them would sort a null-ts row first
    and fabricate a floor match for every left row). Ties among right
    rows sharing (key, ts) resolve deterministically to the greatest
    payload struct — callers needing a different tie-break should
    pre-reduce the right side (as the registry's asof query does with a
    groupBy max)."""
    from tabular_cdc_bootstrapper_spark.operators.cdc import _as_list

    keys = _as_list(on)
    right = right.filter(F.col(right_ts).isNotNull())
    payload = (
        list(right_payload)
        if right_payload is not None
        else [c for c in right.columns if c not in keys and c != right_ts]
    )

    # the payload travels as ONE struct, non-null whenever a right row
    # exists — so last(ignorenulls) skips left rows (null struct) but NOT a
    # right row whose payload VALUES are null. Per-column last(ignorenulls)
    # would conflate "no preceding right row" with "preceding right row with
    # a NULL field" and resurrect an older row's value (pandas merge_asof /
    # DuckDB ASOF JOIN both match the row, then surface its nulls).
    # single select per side (repeated withColumn stacks one Project node
    # per column — plan bloat and slow analysis at wide schemas)
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
    )
    rhs = rhs.select(
        *rhs.columns,
        *[F.lit(None).alias(c) for c in left.columns if c not in rhs.columns],
    )
    lhs = left.select(
        *left.columns,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rhs.schema["__p"].dataType).alias("__p"),
    )
    merged = lhs.select(rhs.columns).unionByName(rhs)

    # right rows sort before left rows at equal ts (__is_left ascending), so
    # a right row with ts == left ts IS matched (inclusive as-of)
    w = (
        Window.partitionBy(*keys)
        # __p as the final sort key: right rows tied on (key, ts) order by
        # payload struct, so last() picks the greatest one — deterministic
        # under retries/shuffle changes (left rows have null __p and sort
        # first within their (ts, tag) run; ignorenulls skips them anyway)
        .orderBy("__evt_ts", "__is_left", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.withColumn("__asof", F.last(F.col("__p"), ignorenulls=True).over(w))
    return out.filter(F.col("__is_left") == 1).select(
        *[c for c in out.columns if c not in ("__evt_ts", "__is_left", "__p", "__asof")],
        *[F.col("__asof")[c].alias(f"{c}{suffix}") for c in payload],
    )
