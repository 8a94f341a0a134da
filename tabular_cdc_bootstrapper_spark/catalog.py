"""Control plane: idempotent bootstrap of (changelog, mirror) table pairs.

Native-Spark rebuild of the reference's bootstrapper (reference
batch_bootstrapper.py:33-94 main loop; tabular.py:77-143 bootstrap_table).
Where the reference POSTs to a SaaS REST API to materialize tables and set
loader properties, this engine creates catalog tables directly and stores
the same pipeline wiring as TBLPROPERTIES — config lives *on the table*,
not in app state (reference tabular.py:58-62,72-75).
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from tabular_cdc_bootstrapper_spark.config import CdcTarget, EngineConfig

log = logging.getLogger(__name__)


def cdc_mirror_properties(key_column: str, ts_column: str) -> dict[str, str]:
    """CDC wiring properties (reference tabular.py:58-62) — config-driven,
    not hardcoded (the reference hardcodes ('id','transact_seq') at
    tabular.py:68; SURVEY.md §1.4 flags that as a bug to fix)."""
    return {
        "etl.job-type": "cdc",
        "cdc.type": "DMS",
        "cdc.ts-column": ts_column,
        "cdc.key-column": key_column,
    }


def dependent_tables_property(mirror_fqn: str) -> dict[str, str]:
    """Changelog→mirror dependency edge (reference tabular.py:72-75)."""
    return {"dependent-tables": mirror_fqn}


def _q(ident: str) -> str:
    return ".".join(f"`{p}`" for p in ident.split("."))


def ensure_database(spark: SparkSession, database: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(database)}")


def bootstrap_table(
    spark: SparkSession,
    database: str,
    table: str,
    location: str | None = None,
    schema: T.StructType | None = None,
    properties: dict[str, str] | None = None,
) -> bool:
    """Idempotently create ``database.table``; returns True if created.

    Mirrors reference tabular.py:77-143: existence probe (:91-99) → early
    return (:99) → create (:101-143), minus the REST/OAuth layer (control
    plane is local). Schema may be omitted — the reference never declares
    one (tabular.py:130-139 passes only bucket/prefix/format; the loader
    infers) — in which case the table is registered lazily on first write.
    """
    fqn = f"{database}.{table}"
    if spark.catalog.tableExists(fqn):
        log.info("table %s exists — skipping bootstrap", fqn)
        return False
    cols = f" ({', '.join(f'`{f.name}` {f.dataType.simpleString()}' for f in schema.fields)})" if schema else ""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {_q(fqn)}{cols} USING PARQUET{loc}")
    if properties:
        set_table_properties(spark, fqn, properties)
    log.info("bootstrapped table %s", fqn)
    return True


def set_table_properties(spark: SparkSession, fqn: str, props: dict[str, str]) -> None:
    """Atomic property write (reference tabular.py:69-70 uses a pyiceberg
    transaction; Spark's ALTER TABLE SET TBLPROPERTIES is a single catalog
    op)."""
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {_q(fqn)} SET TBLPROPERTIES ({kv})")


def get_table_properties(spark: SparkSession, fqn: str) -> dict[str, str]:
    rows = spark.sql(f"SHOW TBLPROPERTIES {_q(fqn)}").collect()
    return {r["key"]: r["value"] for r in rows}


def bootstrap_target(
    spark: SparkSession, cfg: EngineConfig, target: CdcTarget,
    schema: T.StructType | None = None,
) -> tuple[str, str]:
    """Bootstrap one prefix → (changelog_fqn, mirror_fqn).

    Sequence mirrors reference batch_bootstrapper.py:49-94: derive names
    (:55-56) → changelog table with loader enabled (:59-71) → dependency
    property (:72) → mirror table, loader disabled (:75-87) → CDC props
    (:88)."""
    target.validate()
    ensure_database(spark, cfg.database)
    mirror = f"{cfg.database}.{target.table_name}"
    changelog = f"{cfg.database}.{target.changelog_table_name}"
    wh = cfg.warehouse_dir.rstrip("/")
    bootstrap_table(
        spark, cfg.database, target.changelog_table_name,
        location=f"{wh}/{target.changelog_table_name}", schema=schema,
        properties={
            **dependent_tables_property(mirror),
            # loader wiring the reference passes in its REST payload
            # (tabular.py:130-139): mode + exclusion filter
            "fileloader.mode": "CREATE_AUTO_LOAD",
            "fileloader.file-filter": target.changelog_exclude_glob,
            "fileloader.source-uri": target.source_uri,
        },
    )
    mirror_schema = None
    if schema is not None:
        keep = [f for f in schema.fields if f.name not in (target.op_column, target.ts_column, "table")]
        mirror_schema = T.StructType(keep)
    bootstrap_table(
        spark, cfg.database, target.table_name,
        location=f"{wh}/{target.table_name}", schema=mirror_schema,
        properties={
            **cdc_mirror_properties(target.key_column, target.ts_column),
            "fileloader.mode": "CREATE_LOAD",
            "fileloader.file-filter": target.initial_load_exclude_glob,
            "fileloader.source-uri": target.source_uri,
        },
    )
    return changelog, mirror


def bootstrap_all(
    spark: SparkSession, cfg: EngineConfig,
    schema: T.StructType | None = None,
) -> dict[str, tuple[str, str] | Exception]:
    """Per-target loop with error isolation — one bad prefix must not kill
    the run (reference batch_bootstrapper.py:49-94, try/except at :50,91-94).
    Returns {source_uri: (changelog, mirror) | exception}."""
    results: dict[str, tuple[str, str] | Exception] = {}
    for target in cfg.targets:
        try:
            results[target.source_uri] = bootstrap_target(spark, cfg, target, schema)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            # never log credentials (reference tabular.py:105 redacts)
            log.error("bootstrap failed for %s: %s", target.source_uri, exc)
            results[target.source_uri] = exc
    return results
