"""table_diff (operators/diff.py): the round-trip law — applying the diff
changelog on top of the old snapshot reproduces the new snapshot — plus
null-transition and no-op edges."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import apply_changelog
from tabular_cdc_bootstrapper_spark.operators.diff import table_diff

# a snapshot is a dict key → payload (None allowed: nullable payloads)
snapshot_strategy = st.dictionaries(
    st.integers(1, 8),
    st.one_of(st.none(), st.text(alphabet="abc", min_size=0, max_size=2)),
    max_size=8,
)


def _df(spark, snap):
    rows = [(k, v) for k, v in snap.items()] or [(None, None)]
    df = spark.createDataFrame(rows, "id long, payload string")
    return df.filter(F.col("id").isNotNull()) if not snap else df


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=snapshot_strategy, new=snapshot_strategy)
def test_diff_round_trip(spark, old, new):
    """apply_changelog(old-as-inserts ∪ diff) == new, for ANY snapshots."""
    old_df, new_df = _df(spark, old), _df(spark, new)
    diff = table_diff(old_df, new_df, "id")

    base = old_df.withColumns({"op": F.lit("I"), "ts": F.lit(0)})
    delta = diff.withColumn("ts", F.lit(1))
    merged = apply_changelog(base.unionByName(delta), "id", "ts")
    got = {r["id"]: r["payload"] for r in merged.collect()}
    assert got == new

    # minimality: one row per changed key, none for unchanged keys
    ops = {r["id"]: r["op"] for r in diff.collect()}
    for k in set(old) | set(new):
        if k in old and k in new:
            expected = None if old[k] == new[k] else "U"
        elif k in new:
            expected = "I"
        else:
            expected = "D"
        assert ops.get(k) == expected, (k, old.get(k), new.get(k))


def test_null_transitions_are_updates(spark):
    old = _df(spark, {1: None, 2: "x", 3: "same"})
    new = _df(spark, {1: "now", 2: None, 3: "same"})
    ops = {r["id"]: (r["op"], r["payload"]) for r in table_diff(old, new, "id").collect()}
    assert ops == {1: ("U", "now"), 2: ("U", None)}  # 3 unchanged → absent


def test_identical_snapshots_empty_diff(spark):
    snap = _df(spark, {1: "a", 2: None})
    assert table_diff(snap, snap, "id").count() == 0


def test_delete_rows_carry_only_the_key(spark):
    old, new = _df(spark, {5: "gone"}), _df(spark, {})
    (row,) = table_diff(old, new, "id").collect()
    assert (row["id"], row["op"], row["payload"]) == (5, "D", None)


def test_schema_mismatch_rejected(spark):
    old = _df(spark, {1: "a"})
    with pytest.raises(ValueError, match="schema mismatch"):
        table_diff(old, old.withColumnRenamed("payload", "other"), "id")


def test_op_column_collision_rejected(spark):
    old = spark.createDataFrame([(1, "I")], "id long, op string")
    with pytest.raises(ValueError, match="op column"):
        table_diff(old, old, "id")


def test_validate_rejects_duplicate_keys(spark):
    """table_diff's key-uniqueness precondition: validate=True turns the
    silent cross-product failure mode into a ValueError naming the side."""
    unique = _df(spark, {1: "a", 2: "b"})
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "id long, payload string"
    )
    with pytest.raises(ValueError, match="old snapshot"):
        table_diff(dup, unique, "id", validate=True)
    with pytest.raises(ValueError, match="new snapshot"):
        table_diff(unique, dup, "id", validate=True)
    # unique inputs pass the check and diff normally
    assert table_diff(unique, unique, "id", validate=True).count() == 0


def test_validate_counts_null_keys_exactly(spark):
    """NULL keys join via eqNullSafe, so two NULL-keyed rows ARE
    duplicates; one NULL-keyed row is not (COUNT DISTINCT over a struct
    keeps NULL fields, unlike over bare columns)."""
    one_null = spark.createDataFrame(
        [(None, "a"), (2, "b")], "id long, payload string"
    )
    assert table_diff(one_null, one_null, "id", validate=True).count() == 0
    two_null = spark.createDataFrame(
        [(None, "a"), (None, "b")], "id long, payload string"
    )
    with pytest.raises(ValueError, match="old snapshot"):
        table_diff(two_null, one_null, "id", validate=True)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=snapshot_strategy, new=snapshot_strategy)
def test_scd2_over_diff_reconstructs_both_snapshots(spark, old, new):
    """Composition law (VERDICT r5 #8) linking the two CDC consumers:
    scd2_history over (old-as-inserts at ts=0 ∪ table_diff at ts=1) must
    reconstruct BOTH snapshots — the as-of-T read at T=0 gives `old`, the
    is_current slice gives `new`. This pins diff (changelog generation),
    apply-time ordering, and SCD2 interval tiling to one replay law."""
    from tabular_cdc_bootstrapper_spark.operators.cdc import scd2_history

    old_df, new_df = _df(spark, old), _df(spark, new)
    base = old_df.withColumns({"op": F.lit("I"), "ts": F.lit(0)})
    delta = table_diff(old_df, new_df, "id").withColumn("ts", F.lit(1))
    hist = scd2_history(base.unionByName(delta), "id", "ts")

    # as-of T=0: versions open at time 0 (valid_from <= 0 < valid_to)
    asof0 = {
        r["id"]: r["payload"]
        for r in hist.filter(
            (F.col("valid_from") <= 0)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > 0))
        ).collect()
    }
    assert asof0 == old

    # current slice: the new snapshot (deleted keys have no current row)
    current = {
        r["id"]: r["payload"]
        for r in hist.filter(F.col("is_current")).collect()
    }
    assert current == new
