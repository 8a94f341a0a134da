"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle string DuckDB runs on the same parquet tables
(``None`` for non-SQL-expressible ops → driver does a rows-only check).
Column names/aliases match exactly between the two sides — the driver's
compare sorts columns by name before value-hashing.

Registered via the ``@query(name, oracle)`` decorator; ``__spark_entry__``
just re-exports the dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import apply_changelog

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# CDC flagship (SURVEY.md §2.5 W1 / §2.4 A1 / §2.3 J1-J2) — the reference's
# delegated DMS merge (tabular.py:58-62) exercised at oracle-checkable scale
# via a changelog derived deterministically from `orders` (FIXTURES.md §C):
#   ts=0 insert of every order; ts=1 update (status → 'X') where key%7=0;
#   ts=2 delete where key%13=0. Expected mirror: latest non-D row per key.
# ---------------------------------------------------------------------------

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def derived_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    inserts = o.select(*_ORDER_COLS).withColumns(
        {"op": F.lit("I"), "ts": F.lit(0).cast("int")}
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .select(*_ORDER_COLS)
        .withColumns({"op": F.lit("U"), "ts": F.lit(1).cast("int")})
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .select(*_ORDER_COLS)
        .withColumns({"op": F.lit("D"), "ts": F.lit(2).cast("int")})
    )
    return inserts.unionByName(updates).unionByName(deletes)


@query(
    "cdc_latest",
    oracle="""
    WITH changelog AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 'I' AS op, 0 AS ts
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, 'X', o_totalprice,
               o_orderdate, o_orderpriority, 'U', 1
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 'D', 2
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderkey ORDER BY ts DESC) AS rn
        FROM changelog
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: DMS changelog → current-state mirror (single-shuffle max_by)."""
    changelog = derived_orders_changelog(spark, sf_dir)
    return apply_changelog(
        changelog,
        key_cols="o_orderkey",
        ts_cols="ts",
        op_col="op",
        delete_op="D",
        drop_envelope=["op", "ts"],
    )
