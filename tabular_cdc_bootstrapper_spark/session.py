"""SparkSession factory with scale-aware defaults.

Local test surface is local[N] single-JVM; the config block is written for a
real multi-executor cluster (AQE, skew-join handling, dynamic partition
overwrite) and degrades gracefully to local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tabular_cdc_bootstrapper_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for the 100 TB design point:

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
      and runtime join-strategy demotion — the big-cluster safety net.
    - ``partitionOverwriteMode=dynamic``: the CDC mirror overwrite only
      rewrites partitions that received changes (operators/cdc.py).
    - Arrow enabled: pandas-UDF paths (multimodal, similarity fallback) move
      batches, not rows.
    - shuffle partitions sized to local cores for tests; a cluster deployment
      overrides via ``spark.sql.shuffle.partitions`` (AQE coalesces down, so
      erring high is safe at scale).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        # ns-precision parquet (events fixture) read as raw ns-since-epoch;
        # set once at build so scans don't mutate shared session conf
        # (queries._t still sets it defensively for driver-owned sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r15: manifest reads pass explicit dir lists (often > 32 for
        # transform-partitioned mirrors); below this threshold the driver
        # lists serially (~µs/dir on a filesystem) instead of launching a
        # distributed listing JOB per read (~0.2-0.5 s of scheduling).
        # Scale knob, not a constant: on object stores, where each LIST
        # is a ~30 ms round trip, deployments set SPARK_GRAFT_LIST_PAR
        # back to Spark's default 32 so big dir sets keep listing in
        # parallel (OPTIMIZATION_r15.md)
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_PAR", "1024"),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        # NOTE: driver.memory (like master) only takes effect when this call
        # actually CREATES the JVM; on a reused/active session getOrCreate
        # silently keeps the existing driver size — intentional, configs
        # that require a fresh JVM can't be retrofitted
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Read every fixture parquet under ``sf_dir`` (TESTDATA.md contract).

    Plain ``spark.read.parquet`` — columnar scan, predicate pushdown and
    column pruning come from Catalyst; nothing to hand-tune here.
    """
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TESTDATA_TABLES}
