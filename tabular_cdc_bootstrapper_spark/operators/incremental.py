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


def maintain_join(
    view_before: DataFrame,
    fact_before: DataFrame,
    dim_before: DataFrame,
    fact_changelog: DataFrame | None,
    dim_changelog: DataFrame | None,
    fact_keys: str | Sequence[str],
    dim_keys: str | Sequence[str],
    fk_cols: str | Sequence[str],
    ts_cols: str | Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Maintain a materialized inner equi-join view ``fact ⋈ dim`` through
    one CDC batch touching either (or both) sides, without recomputing the
    join — classic incremental view maintenance for joins, specialized to
    the CDC-upsert changelogs this engine's mirrors speak (the reference
    delegates the mirror itself at tabular.py:58-62 and leaves derived
    views to the warehouse; at 100 TB those views are too expensive to
    rebuild per batch).

    ``view_before`` must carry the union of ``fact_before`` and
    ``dim_before`` columns (i.e. it was produced by the same inner join on
    ``fact[fk_cols] == dim[dim_keys]``; column names must not overlap).
    Either changelog may be ``None`` for a one-sided batch. The returned
    frame equals ``apply_changelog(fact) ⋈ apply_changelog(dim)`` — the
    invariant the law tests and the registry oracle pin — but is computed
    from three delta-driven parts:

    1. **fact-side**: post-batch state of the touched fact keys, joined to
       the post-batch dim (handles inserts, payload updates, deletes, and
       re-points to a different — possibly just-inserted — dim row);
    2. **dim-side**: fact rows (key NOT touched) referencing a touched dim
       key, re-joined to the touched dims' post-batch state (handles dim
       payload updates, dim deletes dropping view rows, and the hard case —
       a dim INSERT that makes previously-unmatched fact rows join, which
       is why this part reads ``fact_before``, not the view: inner-join
       views don't contain the unmatched fact rows);
    3. **untouched passthrough**: view rows touching neither key set.

    Scale shape: both touched-key frames are |batch|-sized, so every join
    against them broadcasts; the corpus-sized inputs (``view_before``,
    ``fact_before``) are each scanned once but only through broadcast
    semi/anti joins — no corpus shuffle, and the probes prune when the
    mirror/view are bucketed by their keys. ``dim_after`` is dim-bounded
    and joins a |batch|-sized fact delta.
    """
    fkeys = _as_list(fact_keys)
    dkeys = _as_list(dim_keys)
    fks = _as_list(fk_cols)

    overlap = set(fact_before.columns) & set(dim_before.columns)
    if overlap:
        raise ValueError(
            f"fact/dim column names must not overlap, got {sorted(overlap)}"
        )

    def _semi(df: DataFrame, probe: DataFrame, left: list[str], how: str) -> DataFrame:
        # probes carry renamed (__p_*) key columns — fresh attributes, so a
        # changelog derived from the mirror DataFrame itself (the common
        # harness shape) can't trip Spark's ambiguous-self-join analysis
        cond = reduce(
            lambda a, b: a & b,
            [df[l].eqNullSafe(probe[f"__p_{i}"]) for i, l in enumerate(left)],
        )
        return df.join(F.broadcast(probe), cond, how)

    def _probe(src: DataFrame, keys: list[str]) -> DataFrame:
        return src.select(
            *[F.col(k).alias(f"__p_{i}") for i, k in enumerate(keys)]
        ).distinct()

    def _apply(changelog: DataFrame, mirror: DataFrame, keys: list[str]) -> DataFrame:
        # strategy="window", not the max_by default: the combination of a
        # checkpointed changelog + broadcast-semi mirror + max_by's struct
        # aggregate trips a Spark Union.rewriteConstraints bug
        # (NoSuchElementException: key not found in AttributeMap). The two
        # strategies are result-identical (law-pinned in test_cdc_properties)
        # and cost-identical on these |batch|-sized frames.
        return apply_changelog(
            changelog,
            keys,
            ts_cols,
            op_col=op_col,
            delete_op=delete_op,
            mirror=mirror,
            tiebreak_cols=tiebreak_cols,
            strategy="window",
            drop_envelope=(
                op_col,
                *([ts_cols] if isinstance(ts_cols, str) else ts_cols),
            ),
        )

    empty_f = fact_changelog is None
    empty_d = dim_changelog is None

    def _empty_probe(src: DataFrame, keys: list[str]) -> DataFrame:
        return src.sparkSession.createDataFrame(
            [], _probe(src.limit(0), keys).schema
        )

    touched_f = (
        _empty_probe(fact_before, fkeys)
        if empty_f
        else _probe(fact_changelog, fkeys)
    )
    touched_d = (
        _empty_probe(dim_before, dkeys)
        if empty_d
        else _probe(dim_changelog, dkeys)
    )

    # post-batch state of the touched dim keys (|batch|-bounded)
    dim_touched_old = _semi(dim_before, touched_d, dkeys, "left_semi")
    dim_touched_new = (
        dim_touched_old if empty_d else _apply(dim_changelog, dim_touched_old, dkeys)
    )
    # full post-batch dim, assembled lazily: untouched rows + touched state.
    # Dim-bounded; only ever joined against the |batch|-sized fact delta.
    dim_after = _semi(dim_before, touched_d, dkeys, "left_anti").unionByName(
        dim_touched_new
    )

    # part 1 — fact-side delta ⋈ post-batch dim
    fact_touched_old = _semi(fact_before, touched_f, fkeys, "left_semi")
    fact_touched_new = (
        fact_touched_old if empty_f else _apply(fact_changelog, fact_touched_old, fkeys)
    )
    part_fact = fact_touched_new.join(
        dim_after,
        reduce(
            lambda a, b: a & b,
            [fact_touched_new[l] == dim_after[r] for l, r in zip(fks, dkeys)],
        ),
    )

    # part 2 — untouched fact rows referencing a touched dim key, re-joined
    # to that key's post-batch state (sourced from fact_before so a dim
    # insert can match fact rows the inner-join view never contained)
    fact_refresh = _semi(
        _semi(fact_before, touched_f, fkeys, "left_anti"),
        touched_d,
        fks,
        "left_semi",
    )
    part_dim = fact_refresh.join(
        F.broadcast(dim_touched_new),
        reduce(
            lambda a, b: a & b,
            [fact_refresh[l] == dim_touched_new[r] for l, r in zip(fks, dkeys)],
        ),
    )

    # part 3 — view rows touching neither side pass through unchanged
    untouched = _semi(
        _semi(view_before, touched_f, fkeys, "left_anti"),
        touched_d,
        fks,
        "left_anti",
    )

    cols = view_before.columns

    def _fresh(df: DataFrame) -> DataFrame:
        # per-branch re-alias → fresh attribute ids: the three parts share
        # fact/dim/view lineage, and Union constraint rewriting throws
        # (NoSuchElementException in AttributeMap) when branches carry
        # duplicate expression ids in different column positions
        return df.select(*[F.col(c).alias(c) for c in cols])

    return (
        _fresh(untouched)
        .unionByName(_fresh(part_fact))
        .unionByName(_fresh(part_dim))
    )


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
