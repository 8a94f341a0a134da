"""Control-plane tests: idempotent bootstrap + table-property wiring
(reference tabular.py:77-143, batch_bootstrapper.py:49-94)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tabular_cdc_bootstrapper_spark.catalog import (
    bootstrap_all,
    bootstrap_table,
    bootstrap_target,
    get_table_properties,
)
from tabular_cdc_bootstrapper_spark.config import CdcTarget, EngineConfig, split_storage_uri

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


@pytest.fixture()
def cfg(tmp_path):
    return EngineConfig(
        database="cdc_bootstrap_test",
        warehouse_dir=str(tmp_path / "wh"),
        targets=(
            CdcTarget(source_uri="s3://bkt/cdc/app_db/customers", key_column="id", ts_column="ts"),
        ),
    )


def test_bootstrap_idempotent_and_properties(spark, cfg):
    target = cfg.targets[0]
    changelog, mirror = bootstrap_target(spark, cfg, target, schema=SCHEMA)
    assert mirror.endswith(".customers") and changelog.endswith(".customers_changelog")

    mprops = get_table_properties(spark, mirror)
    assert mprops["etl.job-type"] == "cdc"
    assert mprops["cdc.type"] == "DMS"
    assert mprops["cdc.key-column"] == "id"
    assert mprops["cdc.ts-column"] == "ts"
    cprops = get_table_properties(spark, changelog)
    assert cprops["dependent-tables"] == mirror
    assert cprops["fileloader.file-filter"] == "**/LOAD*"

    # second run: existence probe short-circuits (tabular.py:91-99)
    assert bootstrap_table(spark, cfg.database, target.table_name) is False

    # mirror schema drops the envelope (FIXTURES.md A2)
    cols = [f.name for f in spark.table(mirror).schema.fields]
    assert cols == ["id", "name"]
    spark.sql(f"DROP DATABASE {cfg.database} CASCADE")


def test_bootstrap_error_isolation(spark, cfg):
    bad = CdcTarget(source_uri="s3://bkt/cdc/bad", key_column="", ts_column="ts")
    cfg2 = EngineConfig(cfg.database, cfg.warehouse_dir, (bad,) + cfg.targets)
    results = bootstrap_all(spark, cfg2, schema=SCHEMA)
    assert isinstance(results["s3://bkt/cdc/bad"], ValueError)
    assert isinstance(results[cfg.targets[0].source_uri], tuple)
    spark.sql(f"DROP DATABASE IF EXISTS {cfg.database} CASCADE")


def test_uri_helpers():
    assert split_storage_uri("s3://b/a/c/") == ("b", "a/c/")
    t = CdcTarget(source_uri="s3://b/cdc/db1/orders/")
    assert t.table_name == "orders"
    assert t.changelog_table_name == "orders_changelog"


def test_config_from_env():
    cfg = EngineConfig.from_env(
        {
            "TABULAR_BUCKET_NAME": "bkt",
            "TABULAR_BUCKET_MONITOR_PATH": "cdc/app/users",
            "TABULAR_CDC_ID_FIELD": "uid",
            "TABULAR_CDC_TIMESTAMP_FIELD": "loaded_at",
        }
    )
    (t,) = cfg.targets
    assert t.key_column == "uid" and t.ts_column == "loaded_at"
    assert t.table_name == "users"
