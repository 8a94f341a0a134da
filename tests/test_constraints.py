"""Declarative constraints (functions/constraints.py): each rule kind
counts exactly the planted violations, uniqueness handles NULL keys, and
the row-level rules share one scan. Oracle parity at fixture scale:
test_oracle_parity (orders_constraint_report)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.constraints import (
    Rule,
    check_constraints,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


def _report(df, rules):
    return {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in check_constraints(df, rules).collect()
    }


def test_row_level_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 5, "A", "x-1"), (2, -3, "B", "y-2"), (None, 500, "A", "zz")],
        "k long, v long, s string, code string",
    )
    got = _report(
        df,
        [
            not_null("k"),
            in_range("v", 0, 100),
            in_set("s", ["A"]),
            matches("code", "^[a-z]-[0-9]$"),
        ],
    )
    assert got["not_null(k)"] == (1, False)
    assert got["in_range(v,0,100)"] == (2, False)  # -3 and 500
    assert got["in_set(s)"] == (1, False)  # 'B'
    assert got["matches(code)"] == (1, False)  # 'zz'


def test_unique_counts_duplicates_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k long"
    )
    got = _report(df, [unique("k")])
    # 5 rows − 2 distinct non-null − 1 null-keyed = 2 extra copies of k=1
    assert got["unique(k)"] == (2, False)


def test_unique_passes_on_clean_keys(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    assert _report(df, [unique("k")])["unique(k)"] == (0, True)


def test_foreign_key_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = _report(child, [foreign_key("fk", parent, "pk")])
    assert got["foreign_key(fk)"] == (2, False)  # both 9-rows orphaned


def test_foreign_key_null_child_keys_pass(spark):
    """ADVICE r8: SQL FK semantics (ANSI MATCH SIMPLE) — a NULL child key
    is NOT an orphan; NULL checks belong to not_null rules."""
    child = spark.createDataFrame([(1,), (None,), (None,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    got = _report(
        child, [foreign_key("fk", parent, "pk"), not_null("fk")]
    )
    assert got["foreign_key(fk)"] == (1, False)  # only the 9-row
    assert got["not_null(fk)"] == (2, False)  # NULLs fail separately


def test_rule_requires_exactly_one_kind():
    with pytest.raises(ValueError):
        Rule("bad")
    with pytest.raises(ValueError):
        Rule("bad", violation_cond=F.lit(True), unique_cols=["k"])


def test_row_rules_share_one_scan(spark, sf_dir):
    """All row-level rules + uniqueness must ride a single orders scan —
    one scan node in the non-FK part of the plan (the FK anti-join adds
    its own, like the profiler's documented Expand cost)."""
    from tabular_cdc_bootstrapper_spark import queries as q
    from tabular_cdc_bootstrapper_spark.plans.inspect import scan_read_columns

    df = q.orders_constraint_report(spark, sf_dir)
    scans = scan_read_columns(df)
    # orders appears twice (agg + FK child side), customer once
    assert len(scans) <= 3


def test_empty_table_reports_zero_violations_everywhere(spark):
    """SUM over an empty table is NULL in SQL; the report must still read
    0 violations / passed=true for every rule kind (the legitimate
    empty-ingest case), consistent with the FK path."""
    empty = spark.createDataFrame([], "k long, s string")
    parent = spark.createDataFrame([(1,)], "pk long")
    got = _report(
        empty,
        [not_null("k"), unique("k"), foreign_key("k", parent, "pk")],
    )
    assert got == {
        "not_null(k)": (0, True),
        "unique(k)": (0, True),
        "foreign_key(k)": (0, True),
    }


def test_empty_unique_cols_rejected():
    with pytest.raises(ValueError, match="non-empty"):
        unique()
