"""General MERGE INTO (operators/merge.py): action precedence, conditional
updates, insert gating, null-safe keys, schema preservation. Oracle parity
at fixture scale: test_oracle_parity (merge_orders_corrections)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.merge import merge_into, src


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _s(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, op string")


def test_merge_update_delete_insert_in_one_pass(spark):
    target = _t(spark, [(1, 10), (2, 20), (3, 30)])
    source = _s(spark, [(1, 11, "U"), (2, 0, "D"), (9, 90, "I")])
    out = merge_into(
        target,
        source,
        on=["k"],
        update_cond=src("op") == "U",
        update_set={"v": src("v")},
        delete_cond=src("op") == "D",
        insert_cond=src("op") == "I",
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, 11), (3, 30), (9, 90)}
    assert out.columns == target.columns  # exactly the target schema


def test_merge_delete_takes_precedence_over_update(spark):
    """A matched row satisfying both conditions must be DELETED (standard
    MERGE precedence), never updated."""
    target = _t(spark, [(1, 10)])
    source = _s(spark, [(1, 99, "D")])
    out = merge_into(
        target,
        source,
        on=["k"],
        update_cond=F.lit(True),
        update_set={"v": src("v")},
        delete_cond=src("op") == "D",
    )
    assert out.count() == 0


def test_merge_conditional_update_keeps_nonqualifying_rows(spark):
    target = _t(spark, [(1, 10), (2, 20)])
    source = _s(spark, [(1, 11, "U"), (2, 22, "X")])
    out = merge_into(
        target,
        source,
        on=["k"],
        update_cond=src("op") == "U",
        update_set={"v": src("v")},
        insert_cond=F.lit(False),
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, 11), (2, 20)}


def test_merge_insert_gate_blocks_unqualified_source_rows(spark):
    target = _t(spark, [(1, 10)])
    source = _s(spark, [(8, 80, "I"), (9, 90, "X")])
    out = merge_into(
        target, source, on=["k"], insert_cond=src("op") == "I"
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, 10), (8, 80)}


def test_merge_update_can_reference_both_sides(spark):
    target = _t(spark, [(1, 10)])
    source = _s(spark, [(1, 5, "U")])
    out = merge_into(
        target,
        source,
        on=["k"],
        update_set={"v": F.col("v") + src("v")},
    )
    assert [(r.k, r.v) for r in out.collect()] == [(1, 15)]


def test_merge_null_keys_match_null_safely(spark):
    """eqNullSafe join keys: a NULL target key matches a NULL source key
    (one matched pair), not the cartesian of nothing."""
    target = spark.createDataFrame([(None, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame(
        [(None, 99, "U")], "k long, v long, op string"
    )
    out = merge_into(
        target,
        source,
        on=["k"],
        update_set={"v": src("v")},
        insert_cond=F.lit(False),
    )
    assert {(r.k, r.v) for r in out.collect()} == {(None, 99), (2, 20)}


def test_merge_single_shuffle_plan(spark):
    """The merge is one full-outer join: exactly one exchange pair, no
    cartesian/nested-loop fallback."""
    from tabular_cdc_bootstrapper_spark.plans.inspect import physical_plan

    target = _t(spark, [(1, 10)])
    source = _s(spark, [(1, 11, "U")])
    out = merge_into(target, source, on=["k"], update_set={"v": src("v")})
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_null_condition_acts_as_false(spark):
    """A WHEN condition evaluating to NULL must behave as FALSE (standard
    MERGE), not drop the row through three-valued logic."""
    target = _t(spark, [(1, 10)])
    source = spark.createDataFrame([(1, 11, None)], "k long, v long, op string")
    out = merge_into(
        target,
        source,
        on=["k"],
        update_cond=src("op") == "U",
        update_set={"v": src("v")},
        delete_cond=src("op") == "D",  # NULL op → NULL cond → keep
    )
    assert [(r.k, r.v) for r in out.collect()] == [(1, 10)]


def test_merge_rejects_multiple_source_rows_per_key(spark):
    """Iceberg/Delta MERGE semantics: two source rows matching one target
    key is an error, not silent duplication."""
    import pytest

    target = _t(spark, [(1, 10)])
    source = _s(spark, [(1, 11, "U"), (1, 12, "U")])
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(target, source, on=["k"], update_set={"v": src("v")})
    # opt-out for sources known-unique upstream skips the validation scan
    out = merge_into(
        target,
        _s(spark, [(1, 11, "U")]),
        on=["k"],
        update_set={"v": src("v")},
        validate_unique_source=False,
    )
    assert [(r.k, r.v) for r in out.collect()] == [(1, 11)]
