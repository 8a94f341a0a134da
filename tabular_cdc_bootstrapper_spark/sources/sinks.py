"""Sinks & table layout: partitioned / bucketed / compacted writes.

The reference's sink surface is "append parquet files into an Iceberg
table" (reference tabular.py:136 pins parquet; batch_bootstrapper.py:59-88
wires append vs one-shot). At 100 TB the *layout* of those writes decides
every downstream query's cost, so the engine exposes layout as first-class
operators:

- ``write_partitioned``: directory partitioning on low-cardinality keys →
  partition pruning for free on every predicate over them.
- ``write_bucketed``: hash-bucketed + sorted table → later joins/aggs on
  the bucket key skip the shuffle entirely (bucketed SMJ), the standard
  answer for repeated large-large joins like mirror ⋈ changelog.
- ``compact_small_files``: the streaming changelog accumulates one file
  per micro-batch; compaction rewrites to target-sized files so scan
  parallelism matches data, not file count (the classic small-files fix).
- ``multi_format``: CSV/JSON/ORC round-trip helpers (SURVEY.md §2.1 —
  format surface beyond the pinned parquet).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet; with the session's dynamic partition
    overwrite (session.py) an overwrite touches only partitions present in
    ``df`` — the CDC mirror update pattern."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) catalog table. Joins between
    tables bucketed the same way on the same key are shuffle-free."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    new file count. Coalesce (no shuffle) because compaction only merges —
    it must not repartition data it didn't need to move."""
    df = spark.read.parquet(path)
    total = sum(
        f.stat().st_size
        for f in os.scandir(path)
        if f.name.endswith(".parquet") or f.name.endswith(".zstd.parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + ".compact.old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak, ignore_errors=True)
    return sum(1 for f in os.scandir(path) if f.name.endswith(".parquet"))


def round_trip_format(
    df: DataFrame, spark: SparkSession, path: str, fmt: str
) -> DataFrame:
    """Write + read back in ``fmt`` (csv/json/orc/parquet) with an explicit
    schema on read — schema inference is disabled on purpose (SURVEY.md
    §1.3: pin schemas once a table is bootstrapped)."""
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt).schema(df.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def ingest_file_stats(df_with_src: DataFrame) -> DataFrame:
    """Per-source-file ingest stats (rows per file) — the observability
    counterpart of the loader's progress reporting (SURVEY.md §2.4 A2);
    expects a ``_src_file`` column from read_with_exclusion."""
    return df_with_src.groupBy("_src_file").agg(F.count("*").alias("rows"))
