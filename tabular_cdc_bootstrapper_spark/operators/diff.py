"""Snapshot diff → changelog: the inverse of ``apply_changelog``.

The reference ingests DMS-style I/U/D changelogs and folds them into a
mirror (batch_bootstrapper.py:49-94 hands files to the SaaS merge;
operators/cdc.py is the native fold). This operator goes the other way:
given two snapshots of a keyed table, emit the minimal changelog that
transforms old → new. That closes the CDC loop — backfilling a changelog
for a table that never had one, reconciling a mirror against a source
(anti-entropy repair), or turning periodic full exports into incremental
feeds.

Plan shape: ONE full outer join on the key (single shuffle; both sides
hash-partition on the key and AQE handles skew), then per-row op
classification:

- key only in new        → I (insert), new payload
- key only in old        → D (delete), old key
- key in both, payload ≠ → U (update), new payload
- key in both, payload = → no row (the minimal-changelog property)

Column-level inequality uses null-safe comparison (``<=>``), so a NULL →
value or value → NULL transition correctly classifies as U — plain ``!=``
would silently drop those rows (three-valued logic).

Round-trip law (pinned by tests/test_diff.py): for any old/new,
``apply_changelog(union(snapshot_as_inserts(old), table_diff(old,new)))``
reproduces ``new`` exactly.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | Sequence[str],
    op_col: str = "op",
    validate: bool = False,
) -> DataFrame:
    """Minimal I/U/D changelog transforming ``old`` into ``new``.

    Output schema: key columns + ``op`` + the non-key payload columns
    (taken from ``new`` for I/U; NULL for D — a delete carries only its
    key, the DMS convention the reference's generator follows,
    generate_sample_dms_parquet.py:43-55).

    PRECONDITION: ``key_cols`` must be unique within each snapshot (the
    definition of a keyed table state). Duplicate keys turn the full
    outer join into a per-key cross product and the emitted changelog no
    longer satisfies the round-trip law — silently. Pass
    ``validate=True`` to check (two extra aggregates over each input —
    one count + one distinct-count, each a single shuffle; off by default
    because the inputs are typically the output of `apply_changelog`,
    which is key-unique by construction) and raise ``ValueError`` with
    the offending side instead.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if validate:
        for side, df in (("old", old), ("new", new)):
            # distinct over a STRUCT of the keys, not the bare columns:
            # COUNT(DISTINCT k1, k2) skips any tuple with a NULL field,
            # while struct(k1, k2) is never NULL — so NULL-keyed rows
            # (which eqNullSafe joins like any value below) count exactly
            agg = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("nk"),
            ).collect()[0]
            if agg["n"] != agg["nk"]:
                raise ValueError(
                    f"table_diff precondition violated: {side} snapshot has "
                    f"{agg['n']} rows but only {agg['nk']} distinct key "
                    f"tuples over {keys}; duplicate keys would cross-"
                    "product through the full outer join"
                )
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: old has {sorted(old.columns)}, "
            f"new has {sorted(new.columns)}"
        )
    if op_col in new.columns:
        raise ValueError(
            f"op column {op_col!r} collides with an input column; pass a "
            "different op_col (diffing a changelog-bearing table needs a "
            "fresh name for the classification column)"
        )
    payload = [c for c in new.columns if c not in keys]

    # presence flags, not key-null checks: eqNullSafe joins NULL keys too,
    # and a legitimately-NULL key column must not read as "row absent"
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in payload],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in payload],
        F.lit(True).alias("__n_present"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")

    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    # null-safe payload inequality: NULL→value and value→NULL are updates
    changed = (
        reduce(
            lambda a, b: a | b,
            [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in payload],
        )
        if payload
        else F.lit(False)
    )
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit(None))
    )
    out = j.withColumn(op_col, op).filter(F.col(op_col).isNotNull())
    return out.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        op_col,
        *[
            F.when(F.col(op_col) != "D", F.col(f"__n_{c}")).alias(c)
            for c in payload
        ],
    )
