"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these operators are the explicit tools for the cases AQE can't see —
a groupBy where one key holds 30% of rows, or a join whose hot keys are
known upfront (the classic "null key / default tenant" hot spots).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups on (key, salt) — the hot key's rows split across
    ``n_salts`` reducers; phase 2 merges the partials on the key alone.
    ``aggs`` maps output column → (kind, input column) with kind in
    {sum, count, min, max}; these are the algebraic aggregates that merge
    losslessly (avg = sum/count composed by the caller).
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    phase1_exprs, phase2_exprs = [], []
    for out, (kind, col) in aggs.items():
        p = f"__p_{out}"
        if kind == "sum":
            phase1_exprs.append(F.sum(col).alias(p))
            phase2_exprs.append(F.sum(p).alias(out))
        elif kind == "count":
            phase1_exprs.append(F.count(col).alias(p))
            phase2_exprs.append(F.sum(p).cast("bigint").alias(out))
        elif kind == "min":
            phase1_exprs.append(F.min(col).alias(p))
            phase2_exprs.append(F.min(p).alias(out))
        elif kind == "max":
            phase1_exprs.append(F.max(col).alias(p))
            phase2_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {kind!r}")
    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(*phase1_exprs)
    return partial.groupBy(*key_cols).agg(*phase2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    once per salt. Use when the small side is too large to broadcast but
    the big side's key distribution is skewed; the hot key spreads over
    ``n_salts`` tasks instead of one straggler.

    Only join types that never EMIT unmatched small-side rows are legal:
    a small row exists once per salt replica, so right/full outer would
    null-extend it ``n_salts`` times. inner / left / left_semi / left_anti
    are unaffected (an anti/semi probe matches iff the key exists, which
    is replica-invariant)."""
    legal = {"inner", "left", "leftouter", "left_outer", "left_semi",
             "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in legal}:
        raise ValueError(
            f"salted_join cannot run how={how!r}: the replicated small side "
            "would emit every unmatched row n_salts times; use inner/left/"
            "semi/anti, or salt the other side"
        )
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
