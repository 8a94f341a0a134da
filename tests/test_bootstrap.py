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


# ---------------------------------------------------------------------------
# New-folder auto-discovery (reference README.md:8: "will create tables in
# Iceberg when new folder paths are detected")
# ---------------------------------------------------------------------------


def _write_folder(spark, root, name, n=5):
    spark.createDataFrame(
        [(i, f"{name}{i}", "I", 0) for i in range(n)],
        "id long, name string, op string, ts long",
    ).coalesce(1).write.parquet(f"{root}/{name}/LOAD00000001_parquet")


def test_discover_targets_lists_first_level_folders(spark, tmp_path):
    from tabular_cdc_bootstrapper_spark.catalog import discover_targets

    root = str(tmp_path / "staged")
    assert discover_targets(spark, root) == ()  # missing root: no targets
    _write_folder(spark, root, "alpha")
    _write_folder(spark, root, "beta")
    tmpl = CdcTarget(source_uri="", key_column="uid", ts_column="seq")
    targets = discover_targets(spark, root, tmpl)
    assert [t.table_name for t in targets] == ["alpha", "beta"]
    # template carries the CDC wiring onto every synthesized target
    assert all(t.key_column == "uid" and t.ts_column == "seq" for t in targets)
    # full URIs, readable by spark directly
    assert spark.read.option("recursiveFileLookup", "true").parquet(
        targets[0].source_uri
    ).count() == 5


def test_bootstrap_discovered_picks_up_new_folder(spark, tmp_path):
    """Two folders bootstrap; a third appears; re-run bootstraps ONLY the
    newcomer and no-ops the rest — the reference's poll-loop contract."""
    from tabular_cdc_bootstrapper_spark.catalog import bootstrap_discovered

    root = str(tmp_path / "staged")
    _write_folder(spark, root, "cust")
    _write_folder(spark, root, "ord")
    cfg = EngineConfig(
        database="cdc_disc_test", warehouse_dir=str(tmp_path / "wh")
    )
    try:
        r1 = bootstrap_discovered(spark, cfg, root)
        assert len(r1) == 2 and not any(
            isinstance(v, Exception) for v in r1.values()
        )
        assert spark.catalog.tableExists("cdc_disc_test.cust")
        assert spark.catalog.tableExists("cdc_disc_test.cust_changelog")
        assert spark.catalog.tableExists("cdc_disc_test.ord")

        _write_folder(spark, root, "pay")  # the new folder path
        r2 = bootstrap_discovered(spark, cfg, root)
        assert len(r2) == 3
        assert spark.catalog.tableExists("cdc_disc_test.pay")
        # per-folder schema inference: mirror drops the CDC envelope
        cols = [f.name for f in spark.table("cdc_disc_test.pay").schema.fields]
        assert cols == ["id", "name", "ts"]  # default ts_column is transact_seq
        # idempotent on the ones that already existed: properties intact
        props = get_table_properties(spark, "cdc_disc_test.cust_changelog")
        assert props["dependent-tables"] == "cdc_disc_test.cust"
    finally:
        spark.sql("DROP DATABASE IF EXISTS cdc_disc_test CASCADE")


def test_bootstrap_discovered_configured_target_wins(spark, tmp_path):
    """An explicitly configured target with the same table name beats the
    synthesized default (custom key/ts columns must survive discovery)."""
    from tabular_cdc_bootstrapper_spark.catalog import (
        discover_targets,
        discovered_and_configured,
    )

    root = str(tmp_path / "staged")
    _write_folder(spark, root, "cust")
    _write_folder(spark, root, "ord")
    configured = CdcTarget(
        source_uri=f"file:{root}/cust", key_column="cust_id", ts_column="seq"
    )
    cfg = EngineConfig(targets=(configured,))
    merged = discovered_and_configured(cfg, discover_targets(spark, root))
    by_name = {t.table_name: t for t in merged}
    assert len(merged) == 2
    assert by_name["cust"].key_column == "cust_id"  # config won
    assert by_name["ord"].key_column == "id"  # synthesized default


def test_discovered_folder_schema_drift_widens(spark, tmp_path):
    """r14 (VERDICT r13 #5 — completes reference README.md:8-9 auto
    ingestion): a discovered folder whose LATER files ADD a column must
    widen the changelog+mirror registrations on the next poll, and the
    re-polled pipeline must land the new column's values (NULL for rows
    the widened batch didn't touch) — not stay pinned to the first-poll
    inferred schema."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_cdc_bootstrapper_spark.catalog import (
        bootstrap_discovered,
        discover_targets,
        point_table_to,
    )
    from tabular_cdc_bootstrapper_spark.streaming.pipeline import (
        run_cdc_pipeline_available_now,
    )

    root = str(tmp_path / "staged")
    d = os.path.join(root, "cust")
    os.makedirs(d)
    wire1 = pa.schema(
        [("id", pa.int64()), ("name", pa.string()),
         ("op", pa.string()), ("ts", pa.int64())]
    )
    pq.write_table(
        pa.table(
            {
                "id": list(range(6)),
                "name": [f"n{i}" for i in range(6)],
                "op": ["I"] * 6,
                "ts": [0] * 6,
            },
            schema=wire1,
        ),
        os.path.join(d, "LOAD00000001.parquet"),
    )
    cfg = EngineConfig(
        database="cdc_drift_test", warehouse_dir=str(tmp_path / "wh")
    )
    tmpl = CdcTarget(source_uri="", key_column="id", ts_column="ts")

    def poll():
        bootstrap_discovered(spark, cfg, root, template=tmpl)
        for t in discover_targets(spark, root, tmpl):
            schema = (
                spark.read.option("recursiveFileLookup", "true")
                .option("mergeSchema", "true")
                .parquet(t.source_uri)
                .schema
            )
            out = run_cdc_pipeline_available_now(
                spark,
                t.source_uri,
                schema,
                str(tmp_path / "work" / t.table_name),
                t,
                mirror_layout="snapshot",
            )
            loc = (out["mirror"].current() or {}).get("dir")
            point_table_to(spark, f"{cfg.database}.{t.table_name}", loc)

    try:
        poll()
        assert "email" not in spark.table("cdc_drift_test.cust").columns
        # drift: the next incremental batch carries a NEW email column
        wire2 = pa.schema(
            [("id", pa.int64()), ("name", pa.string()),
             ("email", pa.string()), ("op", pa.string()),
             ("ts", pa.int64())]
        )
        pq.write_table(
            pa.table(
                {
                    "id": [0, 2, 4],
                    "name": ["n0.v2", "n2.v2", "n4.v2"],
                    "email": ["e0", "e2", "e4"],
                    "op": ["U"] * 3,
                    "ts": [1] * 3,
                },
                schema=wire2,
            ),
            os.path.join(d, "2026-01-01T00-00-01.parquet"),
        )
        poll()
        mirror = spark.table("cdc_drift_test.cust")
        assert "email" in mirror.columns  # catalog widened (ADD COLUMNS)
        got = {
            r["id"]: (r["name"], r["email"])
            for r in mirror.select("id", "name", "email").collect()
        }
        assert got == {
            0: ("n0.v2", "e0"),
            1: ("n1", None),
            2: ("n2.v2", "e2"),
            3: ("n3", None),
            4: ("n4.v2", "e4"),
            5: ("n5", None),
        }
        # the changelog registration widened too
        assert "email" in spark.table(
            "cdc_drift_test.cust_changelog"
        ).columns
    finally:
        spark.sql("DROP DATABASE IF EXISTS cdc_drift_test CASCADE")
