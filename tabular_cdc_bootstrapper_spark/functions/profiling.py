"""Schema-driven table profiling (the Deequ/profiler primitive).

Generalizes the round-6 per-table profiler (VERDICT r7 #8): profiles are
built from ``df.schema`` — any table, any column subset — with the same
single-scan plan the hand-written orders profiler proved out:

- ``profile_table``: EXACT null / distinct / min / max per column, one
  single-distinct two-phase aggregate branch per column (scan pruned to
  that column, NO Expand — the r15 optimization round retired the
  single-scan multi-distinct form whose Expand multiplied the row
  stream by #cols+1 through one scan task); the 1-row wide result
  unpivots driver-free with ``stack()``.
- ``profile_table_approx``: the 100 TB twin — ``approx_count_distinct``
  (HLL++) sketches aggregate the UN-expanded stream, so the plan is a
  plain single-pass partial→final agg, no Expand, ≤1 exchange
  (plan-pinned by tests/test_plan_shapes.py).
- ``profile_table_verified``: the approx profiler made ORACLE-CHECKABLE
  (VERDICT r7 #1, the hll_distinct_counts tolerance-verdict scheme):
  emits the deterministic half — exact nulls/min/max/n_distinct — plus a
  per-column boolean ``nd_within_5pct`` comparing the sketch estimate to
  the exact count IN the same plan. The exact counts come from one
  single-distinct aggregate branch PER column, not from the exact
  profiler's Expand: a single-distinct-column aggregate plans as a plain
  two-phase distinct (no Expand), and each branch's parquet scan prunes
  to exactly its one column — so the six single-column scans together
  read the same bytes as the exact profiler's one six-column scan,
  WITHOUT the 6× Expand row multiplication. That is a genuine
  alternative physical strategy for wide-table exact multi-distinct, not
  just a verification tax; at 100 TB you would run ``profile_table_
  approx`` alone (estimates, one sketch pass) and this verified form is
  how the estimates' accuracy envelope gets certified against samples.

Render contract (shared with the DuckDB oracles): every value casts to
string; float/double columns round to 2 dp through DECIMAL(18,2) first so
the rendering is engine-identical.

Reference parity: the reference has no profiler — this is EXT surface
(SURVEY.md §2.10 "profiling"), the "did the loader null a column?" check
a CDC bootstrap pipeline (README.md:6-10 of the reference) runs on every
newly landed table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col: Column, dtype: T.DataType) -> Column:
    """Engine-portable string rendering of a profiled min/max value."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.round(col, 2).cast("decimal(18,2)").cast("string")
    return col.cast("string")


def _resolve_cols(df: DataFrame, cols: Sequence[str] | None) -> list[tuple[str, T.DataType]]:
    by_name = {f.name: f.dataType for f in df.schema.fields}
    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    missing = [c for c in names if c not in by_name]
    if missing:
        raise ValueError(f"profile columns not in schema: {missing}")
    complex_t = [
        c for c in names
        if isinstance(by_name[c], (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]
    if complex_t:
        raise ValueError(
            f"profile supports atomic columns only (min/max/distinct are "
            f"not order-defined for these): {complex_t}"
        )
    return [(c, by_name[c]) for c in names]


def _stack(wide: DataFrame, cols: list[str], fields: str) -> DataFrame:
    """Unpivot the 1-row wide aggregate to long format, driver-free."""
    field_names = fields.split(",")
    stack_args = ", ".join(
        "'{c}', {vals}".format(
            c=c, vals=", ".join(f"{c}__{f}" for f in field_names)
        )
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(col_name, {', '.join(_LONG_NAMES[f] for f in field_names)})"
        )
    )


_LONG_NAMES = {
    "nulls": "n_nulls",
    "nd": "n_distinct",
    "ok": "nd_within_5pct",
    "min": "min_value",
    "max": "max_value",
}


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact column profile: (col_name, n_nulls, n_distinct, min_value,
    max_value), one row per column.

    Physical strategy (r15 optimization round): one single-distinct
    aggregate branch PER column — each branch's scan prunes to exactly
    its one column and plans as a plain two-phase distinct aggregate, so
    there is NO Expand anywhere. The pre-r15 form was a single scan
    whose multi-column ``countDistinct`` Catalyst planned via one Expand
    (row stream × (#cols + 1), all of it funnelled through the
    scan-parallelism of ONE wide scan): profiling a 6-column slice of
    lineitem spent 10-14 s of single-task CPU in that fused
    Expand+partial-aggregate stage at sf0.1. The per-column branches
    read the same total bytes (columnar scans), skip the row
    multiplication entirely, and AQE materializes the independent
    branches concurrently — measured 11.2 s → ~1.5 s on
    table_profile_lineitem, bit-identical output (same exact
    aggregates, same render). This is the alternative exact strategy the
    verified profiler below has always used for its exact half; see
    OPTIMIZATION_r15.md. The 1-row × 1-row crossJoins are literal
    broadcasts (house rule)."""
    resolved = _resolve_cols(df, cols)
    wide = None
    for c, dt in resolved:
        branch = df.select(c).agg(
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            _render(F.min(c), dt).alias(f"{c}__min"),
            _render(F.max(c), dt).alias(f"{c}__max"),
        )
        wide = branch if wide is None else wide.crossJoin(branch)
    return _stack(wide, [c for c, _ in resolved], "nulls,nd,min,max")


def profile_table_approx(
    df: DataFrame, cols: Sequence[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """Sketch profile: identical shape, ``n_distinct`` is the HLL++
    estimate. Expand-free single pass, ≤1 exchange — the 100 TB form."""
    resolved = _resolve_cols(df, cols)
    aggs = []
    for c, dt in resolved:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__nd"),
            _render(F.min(c), dt).alias(f"{c}__min"),
            _render(F.max(c), dt).alias(f"{c}__max"),
        ]
    return _stack(df.agg(*aggs), [c for c, _ in resolved], "nulls,nd,min,max")


def profile_table_verified(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    rsd: float = 0.02,
    tol: float = 0.05,
) -> DataFrame:
    """Sketch profile with a per-column tolerance VERDICT against exact
    counts computed Expand-free (module docstring): output columns
    (col_name, n_nulls, n_distinct, nd_within_5pct, min_value,
    max_value) where n_distinct is EXACT and nd_within_5pct certifies
    |hll − exact| ≤ tol·exact. Deterministic end to end (HLL++ is a
    deterministic algorithm for fixed input+rsd), so a DuckDB oracle can
    reproduce every column including the verdict."""
    resolved = _resolve_cols(df, cols)
    aggs = []
    for c, dt in resolved:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__approx"),
            _render(F.min(c), dt).alias(f"{c}__min"),
            _render(F.max(c), dt).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # one single-distinct branch per column: two-phase distinct agg (no
    # Expand), scan pruned to that one column; 1-row × 1-row crossJoins
    # are literal broadcasts (house rule)
    for c, _ in resolved:
        exact = df.select(c).agg(F.countDistinct(c).alias(f"{c}__nd"))
        wide = wide.crossJoin(exact)
    for c, _ in resolved:
        wide = wide.withColumn(
            f"{c}__ok",
            F.abs(F.col(f"{c}__approx") - F.col(f"{c}__nd"))
            <= F.lit(tol) * F.col(f"{c}__nd"),
        )
    return _stack(wide, [c for c, _ in resolved], "nulls,nd,ok,min,max")


def profile_oracle_sql(
    table: str, cols: Sequence[tuple[str, str]], verdict: bool = False
) -> str:
    """The DuckDB twin of profile_table / profile_table_verified, built
    from the same column list: ``cols`` is (name, kind) with kind in
    {'num', 'float'} — 'float' gets the DECIMAL(18,2) render. With
    ``verdict`` a constant TRUE nd_within_5pct column is emitted (the
    oracle asserts the law holds; Spark computes it sketch-vs-exact)."""
    parts = []
    for name, kind in cols:
        if kind == "float":
            mn = f"CAST(CAST(ROUND(MIN({name}), 2) AS DECIMAL(18,2)) AS VARCHAR)"
            mx = f"CAST(CAST(ROUND(MAX({name}), 2) AS DECIMAL(18,2)) AS VARCHAR)"
        else:
            mn, mx = f"CAST(MIN({name}) AS VARCHAR)", f"CAST(MAX({name}) AS VARCHAR)"
        verdict_col = "TRUE AS nd_within_5pct," if verdict else ""
        parts.append(
            f"""SELECT '{name}' AS col_name,
           CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {verdict_col}
           {mn} AS min_value,
           {mx} AS max_value
    FROM {table}"""
        )
    return "\n    UNION ALL\n    ".join(parts)


def read_and_profile(
    spark: SparkSession, path: str, cols: Sequence[str] | None = None
) -> DataFrame:
    """Convenience: profile a parquet table straight off storage."""
    return profile_table(spark.read.parquet(path), cols)
