"""Metadata-only ALTER TABLE on the versioned bucket mirror (r11):
rename records a physical-name mapping in the manifest (reads fold
coalesce(new, old…) — zero data movement), drop removes the column from
the logical schema (bytes stay until the next compaction materializes
the logical names and retires the mapping), history reads under each
snapshot's own schema, and the guard rails (bucket key, live delta fold
params, name collisions, legacy manifests) raise instead of corrupting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.config import CdcTarget
from tabular_cdc_bootstrapper_spark.streaming.pipeline import (
    VersionedBucketMirror,
)

TARGET = CdcTarget(source_uri="file:///tmp/x", key_column="id", ts_column="ts")


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, ts long, op string")


@pytest.fixture
def mirror(spark, tmp_path):
    m = VersionedBucketMirror(
        str(tmp_path / "m"), n_buckets=8, key_col="id", keep_versions=10
    )
    m.initialize(_batch(spark, [(i, f"v0-{i}", 0, "I") for i in range(8)]))
    return m


def _raw_cols(spark, dirs):
    cols = set()
    for d in dirs:
        cols.update(spark.read.parquet(d).columns)
    return cols


def test_rename_reads_old_and_new_dirs_uniformly(spark, mirror):
    pre_version = mirror.current()["version"]
    rec = mirror.alter_schema(rename={"name": "label"})
    assert rec["operation"] == "alter_schema"
    assert rec["renames"] == {"label": ["name"]}
    out = mirror.read(spark)
    assert "label" in out.columns and "name" not in out.columns
    assert {r.id: r.label for r in out.collect()}[3] == "v0-3"
    # a merge under the NEW name mixes new-physical and old-physical dirs
    mirror.merge_batch(
        spark.createDataFrame(
            [(0, "renamed", 1, "U")],
            "id long, label string, ts long, op string",
        ),
        TARGET,
    )
    got = {r.id: r.label for r in mirror.read(spark).collect()}
    assert got[0] == "renamed" and got[5] == "v0-5" and len(got) == 8
    # time travel: the pre-alter snapshot reads under ITS schema
    old = mirror.read(spark, version=pre_version)
    assert "name" in old.columns and "label" not in old.columns


def test_drop_is_metadata_only_until_compaction(spark, mirror):
    mirror.alter_schema(drop=["op"])
    out = mirror.read(spark)
    assert "op" not in out.columns
    # the bytes are still in the old physical files (Iceberg drop)
    assert "op" in _raw_cols(spark, mirror.current()["buckets"].values())
    # compaction materializes the logical schema and reclaims them
    res = mirror.rewrite_data_files(spark, materialize=True)
    assert res["buckets_compacted"] > 0
    head = mirror.current()
    assert "op" not in _raw_cols(spark, head["buckets"].values())
    assert len(mirror.read(spark).collect()) == 8


def test_chained_rename_folds_all_historical_names(spark, mirror):
    mirror.alter_schema(rename={"name": "label"})
    mirror.merge_batch(
        spark.createDataFrame(
            [(9, "mid", 1, "I")], "id long, label string, ts long, op string"
        ),
        TARGET,
    )
    mirror.alter_schema(rename={"label": "tag"})
    assert mirror.current()["renames"] == {"tag": ["label", "name"]}
    got = {r.id: r.tag for r in mirror.read(spark).collect()}
    # v0 dirs (physical 'name'), merged dir (physical 'label'), all fold
    assert got[2] == "v0-2" and got[9] == "mid" and len(got) == 9
    # a full compaction retires the whole mapping
    mirror.rewrite_data_files(spark)
    assert "renames" not in mirror.current()
    assert "tag" in _raw_cols(spark, mirror.current()["buckets"].values())


def test_alter_guard_rails(spark, mirror):
    with pytest.raises(ValueError, match="bucket key"):
        mirror.alter_schema(rename={"id": "key"})
    with pytest.raises(ValueError, match="bucket key"):
        mirror.alter_schema(drop=["id"])
    with pytest.raises(ValueError, match="no column"):
        mirror.alter_schema(drop=["ghost"])
    mirror.alter_schema(rename={"name": "label"})
    with pytest.raises(ValueError, match="collides"):
        mirror.alter_schema(rename={"ts": "name"})  # historical name
    with pytest.raises(ValueError, match="collides"):
        mirror.alter_schema(rename={"ts": "label"})  # live name
    with pytest.raises(ValueError, match="nothing to do"):
        mirror.alter_schema()


def test_alter_on_mor_respects_fold_params(spark, tmp_path):
    m = VersionedBucketMirror(
        str(tmp_path / "m"), n_buckets=8, key_col="id", keep_versions=10,
        merge_on_read=True,
    )
    m.initialize(_batch(spark, [(i, f"v0-{i}", 0, "I") for i in range(8)]))
    m.merge_batch(_batch(spark, [(0, "x", 1, "U")]), TARGET)
    # ts/op are live fold params of the delta chain — refuse
    with pytest.raises(ValueError, match="delta specs"):
        m.alter_schema(rename={"ts": "event_ts"})
    # a non-fold column renames fine; the fold reads through the mapping
    m.alter_schema(rename={"name": "label"})
    got = {r.id: r.label for r in m.read(spark).collect()}
    assert got[0] == "x" and got[4] == "v0-4"
    # after folding, the fold params are free to alter
    m.rewrite_data_files(spark)
    m.alter_schema(rename={"ts": "event_ts"})
    assert "event_ts" in m.read(spark).columns


def test_rename_fold_preserves_column_pruning(spark, mirror):
    """The rename fold is pure plan work: selecting columns away from
    the renamed one keeps the scan's ReadSchema pruned to what the
    query needs — the coalesce projection must not force reading every
    historical column at 100 TB."""
    mirror.alter_schema(rename={"name": "label"})

    def read_schema(df) -> str:
        plan = df._jdf.queryExecution().executedPlan().toString()
        frags = [
            l.split("ReadSchema:")[1]
            for l in plan.splitlines()
            if "ReadSchema:" in l
        ]
        assert frags
        return frags[0]

    rs = read_schema(mirror.read(spark).select("id", "ts"))
    assert "label" not in rs and "name" not in rs
    # and when the renamed column IS selected, only it + its historical
    # alias reach the scan
    rs2 = read_schema(mirror.read(spark).select("label"))
    assert "label" in rs2 and "ts" not in rs2


def test_add_column_nullable_and_tombstone_guard(spark, mirror):
    """ADD COLUMN is metadata-only: old files read NULL through the
    manifest schema; a DROPPED name cannot be re-added while old files
    still hold its bytes (no field IDs — resurrecting them would be
    silent corruption), and materializing compaction clears the
    tombstone."""
    rec = mirror.alter_schema(add={"tier": "string"})
    assert rec["altered"]["add"] == ["tier"]
    out = mirror.read(spark)
    assert dict(out.dtypes)["tier"] == "string"
    assert all(r.tier is None for r in out.collect())
    # merge a batch carrying the new column
    mirror.merge_batch(
        spark.createDataFrame(
            [(0, "x", 1, "U", "gold")],
            "id long, name string, ts long, op string, tier string",
        ),
        TARGET,
    )
    got = {r.id: r.tier for r in mirror.read(spark).collect()}
    assert got[0] == "gold" and got[3] is None
    # drop it; the name is tombstoned until the bytes are reclaimed
    mirror.alter_schema(drop=["tier"])
    assert "tier" in mirror.current()["dropped"]
    with pytest.raises(ValueError, match="dropped-but-unreclaimed"):
        mirror.alter_schema(add={"tier": "string"})
    mirror.rewrite_data_files(spark, materialize=True)
    assert "dropped" not in mirror.current()
    # now the name is free again — and reads all-NULL (old bytes gone)
    mirror.alter_schema(add={"tier": "string"})
    assert all(r.tier is None for r in mirror.read(spark).collect())
    # invalid type strings fail loudly
    with pytest.raises(Exception):
        mirror.alter_schema(add={"zz": "not_a_type"})


def test_widen_type_is_metadata_only(spark, tmp_path):
    """ALTER COLUMN TYPE (widen) is one manifest commit: old int32 files
    read as bigint through the parquet widening promotions; merges then
    land values beyond 2^31; lossless-only and the bucket key refuses."""
    m = VersionedBucketMirror(
        str(tmp_path / "m"), n_buckets=8, key_col="id", keep_versions=10
    )
    m.initialize(
        spark.createDataFrame(
            [(i, i * 10, 0, "I") for i in range(8)],
            "id long, v long, ts long, op string",
        ).withColumn("v", F.col("v").cast("int"))
    )
    base_dirs = dict(m.current()["buckets"])
    rec = m.alter_schema(widen={"v": "bigint"})
    assert rec["buckets"] == base_dirs  # zero data movement
    assert rec["altered"]["widen"] == {"v": "bigint"}
    out = m.read(spark)
    assert dict(out.dtypes)["v"] == "bigint"
    assert {r.id: r.v for r in out.collect()}[3] == 30
    big = 2**35
    m.merge_batch(
        spark.createDataFrame(
            [(0, big, 1, "U")], "id long, v long, ts long, op string"
        ),
        TARGET,
    )
    got = {r.id: r.v for r in m.read(spark).collect()}
    assert got[0] == big and got[5] == 50
    with pytest.raises(ValueError, match="not lossless"):
        m.alter_schema(widen={"v": "int"})
    with pytest.raises(ValueError, match="bucket key"):
        m.alter_schema(widen={"id": "bigint"})
