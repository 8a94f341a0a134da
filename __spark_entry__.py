"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over tabular_cdc_bootstrapper_spark.queries — the registry of
every implemented operator from SURVEY.md §2 plus the north-star extensions.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tabular_cdc_bootstrapper_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship(spark)
    return _q.cdc_latest(spark, "/root/testdata/sf0.001")


def _ship(spark: SparkSession) -> None:
    # make the package importable on Python workers regardless of the
    # driver process's cwd/PYTHONPATH (needed by pandas-UDF operators)
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    try:
        ensure_self_on_workers(spark)
    except Exception:
        pass  # non-fatal: UDF-free queries don't need it


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE_SQL)
