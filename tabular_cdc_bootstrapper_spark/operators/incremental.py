"""Incremental aggregate maintenance: update a materialized aggregate from
a CDC changelog without recomputing it from the full table.

The reference wires a changelog → mirror pipeline and leaves analytics to
the warehouse (reference README.md:6-10); at 100 TB the aggregates OVER the
mirror are themselves too expensive to recompute per batch. This operator
is classic incremental view maintenance for algebraic aggregates
(count/sum): per micro-batch it touches only the CHANGED keys —

    agg_after(g) = agg_before(g)
                 + Σ contributions of touched keys' new state
                 − Σ contributions of touched keys' old state

which handles inserts, deletes, value updates, and the hard case: an
update that MOVES a row between groups (retraction from the old group,
insertion into the new one). Groups whose maintained count reaches zero
are dropped — which is why count is always maintained alongside the sums
(a sum alone can legitimately be 0 for a live group).

Scale shape: the only corpus-sized input is ``mirror_before``, touched via
one key-partitioned semi-join (co-partitioned with the mirror merge's own
shuffle, and prunable when the mirror is bucketed by key); everything else
is |batch|-sized. The final merge joins two GROUP-cardinality frames —
broadcast-sized by construction.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import _as_list, apply_changelog


def maintain_agg(
    agg_before: DataFrame,
    mirror_before: DataFrame,
    changelog: DataFrame,
    group_cols: str | Sequence[str],
    key_cols: str | Sequence[str],
    ts_cols: str | Sequence[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
    mirror_ts=None,
) -> DataFrame:
    """Maintain ``agg_before`` (count + sums per group) through one
    changelog batch; returns the post-batch aggregate.

    ``mirror_ts`` follows ``apply_changelog``: the default (null floor)
    means existing mirror rows lose to ANY batch event for the same key —
    the correct semantics for a changelog that post-dates the snapshot;
    pass a column to resume from a stored per-row ts instead.

    ``agg_before`` columns: ``group_cols`` + ``count_col`` + the keys of
    ``sum_cols``; ``sum_cols`` maps aggregate column → mirror value column
    (e.g. ``{"total_price": "o_totalprice"}``). ``mirror_before`` is the
    pre-batch current state (no op/ts envelope needed). Equivalent to —
    but touching-keys-only instead of — ``apply_changelog(...).groupBy(
    group).agg(count, sums)``; the invariant test pins that equality.
    """
    groups = _as_list(group_cols)
    keys = _as_list(key_cols)

    touched = changelog.select(*keys).distinct()
    # null-safe key probe: groupBy treats NULL keys as real groups, so a
    # mirror row with a NULL key must still be retracted when the batch
    # touches the NULL key — plain equality would skip it silently
    old = mirror_before.join(
        touched,
        reduce(
            lambda a, b: a & b,
            [mirror_before[k].eqNullSafe(touched[k]) for k in keys],
        ),
        "left_semi",
    )
    new = apply_changelog(
        changelog,
        keys,
        ts_cols,
        op_col=op_col,
        delete_op=delete_op,
        mirror=old,
        mirror_ts=mirror_ts,
        tiebreak_cols=tiebreak_cols,
        drop_envelope=(op_col, *([ts_cols] if isinstance(ts_cols, str) else ts_cols)),
    )

    def contributions(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *groups,
            F.lit(sign).alias("__sign"),
            *[F.col(src).alias(out) for out, src in sum_cols.items()],
        )

    delta = contributions(new, 1).unionByName(contributions(old, -1))
    delta_agg = delta.groupBy(*groups).agg(
        F.sum("__sign").alias(f"__d_{count_col}"),
        *[
            F.sum(F.col(out) * F.col("__sign")).alias(f"__d_{out}")
            for out in sum_cols
        ],
    )

    # null-safe group merge: NULL is a legitimate group value out of
    # groupBy, and plain equality in the full outer would split it into
    # two rows (stale pre-batch + bare delta), breaking incremental ==
    # recompute. Group columns re-emerge via per-side coalesce.
    merged = agg_before.join(
        delta_agg,
        reduce(
            lambda a, b: a & b,
            [agg_before[g].eqNullSafe(delta_agg[g]) for g in groups],
        ),
        "full_outer",
    ).select(
        *[F.coalesce(agg_before[g], delta_agg[g]).alias(g) for g in groups],
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col(f"__d_{count_col}"), F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(out), F.lit(0.0))
                + F.coalesce(F.col(f"__d_{out}"), F.lit(0.0))
            ).alias(out)
            for out in sum_cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)
