"""Local mirror of the driver's correctness gate: every registry query with
an oracle runs on Spark AND DuckDB at the smoke scale factor; results must
match on row count, column names, and (order-insensitively) values."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tabular_cdc_bootstrapper_spark import queries as q


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            s = s.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else round(float(v), 6))
        out[c] = s.astype(str)
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(q.ORACLE_SQL)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spark_df = q.QUERIES[name](spark, sf_dir).toPandas()
    # the driver contract: queries that persist() intermediates (minhash,
    # span retention) rely on the caller clearing the cache per query —
    # without this, persisted frames accumulate across the session-scoped
    # spark fixture for the whole parametrized sweep
    spark.catalog.clearCache()
    duck_df = duck.execute(q.ORACLE_SQL[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )
    a, b = _normalize(spark_df), _normalize(duck_df)
    if not a.equals(b):
        diff = a.compare(b) if a.shape == b.shape else None
        raise AssertionError(f"{name}: value mismatch\n{diff}\n{a.head()}\n{b.head()}")


def test_all_queries_return_rows(spark, sf_dir):
    """Every registry query not already executed by the parametrized
    oracle sweep above must still RUN. Since r8 every entry carries an
    oracle, so this normally covers nothing — it exists as the net for
    any future rows-only entry (r16: it used to re-run all 160 queries
    the oracle sweep had just run, ~6 min of pure duplication in the
    driver's budgeted pytest pass)."""
    for name, fn in q.QUERIES.items():
        if name in q.ORACLE_SQL:
            continue  # executed (and value-checked) by the oracle sweep
        n = fn(spark, sf_dir).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


#: Registry entries that are rows-only BY DESIGN. EMPTY since r8: the
#: last member (table_profile_orders_approx) was converted to the
#: tolerance-verdict scheme (exact values + nd_within_5pct boolean, full
#: DuckDB oracle — VERDICT r7 #1), so every registry entry now carries an
#: oracle. The mechanism stays: anything rows-only NOT in this set is a
#: missing oracle, which the asserts below flag.
ROWS_ONLY_BY_DESIGN: set[str] = set()


def test_registry_order_prioritizes_oracle_backed():
    """The driver records correctness rows for the first 50 registry
    entries; every one of those must be oracle-backed, except the
    documented ROWS_ONLY_BY_DESIGN sketches (VERDICT r6 #3 put the approx
    profiler in the r7 window deliberately — its law test is the oracle).
    Since round 4 the other engine-specific sketches (HLL distinct,
    approximate percentiles) emit deterministic exact values + tolerance
    verdicts, so they carry full DuckDB oracles."""
    names = list(q.QUERIES)
    assert len(names) == len(q.QUERIES)
    assert {n for n in names[:50] if n not in q.ORACLE_SQL} <= ROWS_ONLY_BY_DESIGN
    # every query outside the window still has an oracle (re-checked
    # locally each round by test_query_matches_oracle)
    assert all(
        n in q.ORACLE_SQL for n in names[50:] if n not in ROWS_ONLY_BY_DESIGN
    )
    # ordering is consistent across the two dicts the driver reads
    oracle_names = list(q.ORACLE_SQL)
    assert oracle_names == [n for n in names if n in q.ORACLE_SQL]
