#!/usr/bin/env python
"""Write-amplification probe for the merge-on-read DELETE TIER (r12,
VERDICT task 6 — the Iceberg v2 equality-delete split).

A wide mirror (96 string payload columns, ~1.6 KB/row) takes a
pure-delete CDC batch (the GDPR right-to-be-forgotten stream shape).
Before r12 the delta dir held FULL-WIDTH tombstone rows (every payload
column NULL-encoded but the row still carries the schema's width in
dictionary/offset overhead); r12 stages delete rows as a keys-only
slice — key + ts + op, nothing else.

Measured: bytes appended per delete commit (keys-only tier) vs the same
batch written full-width (the pre-r12 shape, reproduced by writing the
unsplit slice directly), plus fold parity — the mirror state after the
keys-only deletes is identical to copy-on-write.

Pass criteria: keys-only delta ≥3× smaller than the full-width
tombstone delta on the wide schema; state parity exact.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _tree_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def main() -> None:
    from pyspark.sql import SparkSession

    from tabular_cdc_bootstrapper_spark.config import CdcTarget
    from tabular_cdc_bootstrapper_spark.streaming.pipeline import (
        VersionedBucketMirror,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        # the copy-on-write parity leg rewrites the full 96-col wide
        # table in one commit — the default 1g local heap OOMs on it
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe-del-tier-")
    n_cols, n_rows, n_del = 96, 60_000, 20_000
    wide = ", ".join(f"c{i} string" for i in range(n_cols))
    schema = f"id long, {wide}, ts long, op string"
    target = CdcTarget(
        source_uri="file:///x", key_column="id", ts_column="ts"
    )
    base = spark.range(n_rows).selectExpr(
        "id",
        *[
            f"repeat(concat('v', cast(id as string), '-'), 8) AS c{i}"
            for i in range(n_cols)
        ],
        "0L AS ts",
        "'I' AS op",
    )
    dels = spark.range(n_del).selectExpr(
        "id",
        *[f"CAST(NULL AS string) AS c{i}" for i in range(n_cols)],
        "1L AS ts",
        "'D' AS op",
    )
    out: dict = {"n_rows": n_rows, "n_deletes": n_del, "payload_cols": n_cols}

    # --- r12 keys-only tier (the shipped merge_batch path) ---
    m = VersionedBucketMirror(
        os.path.join(work, "mor"), n_buckets=16, key_col="id",
        keep_versions=10, merge_on_read=True,
    )
    m.initialize(base)
    t0 = time.time()
    rec = m.merge_batch(dels, target)
    out["keys_only_commit_s"] = round(time.time() - t0, 3)
    del_dirs = [
        s["dir"]
        for ss in m.current()["deltas"].values()
        for s in ss
        if s["version"] == rec["version"]
    ]
    out["keys_only_bytes"] = sum(_tree_bytes(d) for d in del_dirs)
    out["keys_only_cols"] = sorted(
        spark.read.parquet(del_dirs[0]).columns
    )

    # --- the pre-r12 shape: the same slice written FULL-WIDTH ---
    full_dir = os.path.join(work, "fullwidth")
    from pyspark.sql import functions as F

    dels.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("id")), F.lit(16))
    ).repartition("bucket").write.partitionBy("bucket").parquet(full_dir)
    out["full_width_bytes"] = _tree_bytes(full_dir)
    out["bytes_ratio"] = round(
        out["full_width_bytes"] / max(out["keys_only_bytes"], 1), 2
    )
    out["keys_only_bytes_per_delete"] = round(
        out["keys_only_bytes"] / n_del, 2
    )
    out["full_width_bytes_per_delete"] = round(
        out["full_width_bytes"] / n_del, 2
    )

    # --- fold parity vs copy-on-write ---
    cow = VersionedBucketMirror(
        os.path.join(work, "cow"), n_buckets=16, key_col="id",
        keep_versions=10,
    )
    cow.initialize(base)
    cow.merge_batch(dels, target)
    a = m.read(spark).selectExpr("id", "c0").orderBy("id").collect()
    b = cow.read(spark).selectExpr("id", "c0").orderBy("id").collect()
    out["fold_parity"] = a == b and len(a) == n_rows - n_del
    out["pass"] = bool(
        out["fold_parity"]
        and out["bytes_ratio"] >= 3.0
        and out["keys_only_cols"] == ["id", "op", "ts"]
    )
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
