"""The ``state_table`` streaming SINK data source + xxhash64 parity.

``spark.writeStream.format("state_table")`` commits CDC micro-batches
into a ``VersionedBucketMirror`` as merge-on-read delta appends: bucket
assignment happens on executor Python workers via ``functions/xxhash.py``
(must be bit-identical to the JVM ``F.xxhash64`` the table partitions
by), the driver-side commit is pure metadata, and a per-sink fence file
makes replayed batch ids free.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.xxhash import (
    spark_buckets,
    xxhash64_bytes,
    xxhash64_longs,
)
from tabular_cdc_bootstrapper_spark.streaming.datasource import (
    register_stream_sources,
)
from tabular_cdc_bootstrapper_spark.streaming.pipeline import (
    VersionedBucketMirror,
)


# ---------------------------------------------------------------------------
# xxhash64 parity — the correctness foundation of the sink's bucketing
# ---------------------------------------------------------------------------


def test_xxhash64_long_parity_with_spark(spark):
    ids = [
        0, 1, -1, 42, -42, 17, 2**62, -(2**62), 2**63 - 1, -(2**63),
        1234567890123456789, -987654321098765432,
    ]
    rng = np.random.default_rng(7)
    ids += [int(x) for x in rng.integers(-(2**63), 2**63 - 1, 50)]
    expected = [
        r[0]
        for r in spark.createDataFrame([(i,) for i in ids], "id long")
        .select(F.xxhash64("id"))
        .collect()
    ]
    got = list(xxhash64_longs(ids))
    assert got == expected


def test_xxhash64_string_parity_with_spark(spark):
    strs = [
        "", "a", "ab", "abc", "abcd", "hello", "hello world!",
        "x" * 31, "y" * 32, "z" * 33, "stripe" * 40,
        "ünïcødé-ключ-鍵", "s3://bucket/prefix/part-00001.parquet",
    ]
    expected = [
        r[0]
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select(F.xxhash64("s"))
        .collect()
    ]
    got = [xxhash64_bytes(s.encode("utf-8")) for s in strs]
    assert got == expected


def test_spark_buckets_matches_mirror_bucket(spark, tmp_path):
    import pandas as pd

    m = VersionedBucketMirror(str(tmp_path / "m"), n_buckets=13, key_col="k")
    ids = list(range(-50, 50)) + [2**62, -(2**62)]
    sdf = spark.createDataFrame([(i,) for i in ids], "k long").select(
        "k", m._bucket(F.col("k")).alias("b")
    )
    expected = {r["k"]: r["b"] for r in sdf.collect()}
    got = spark_buckets(pd.Series(ids, dtype="int64"), 13)
    assert {i: int(b) for i, b in zip(ids, got)} == expected


# ---------------------------------------------------------------------------
# sink end-to-end
# ---------------------------------------------------------------------------


def _init_mirror(spark, root, n=300, mor=True, key="id"):
    base = spark.range(0, n).select(
        F.col("id").alias(key) if key != "id" else F.col("id"),
        (F.col("id") * 1.0).alias("v"),
    )
    m = VersionedBucketMirror(
        root, n_buckets=8, key_col=key, keep_versions=10, merge_on_read=mor
    )
    m.initialize(base)
    return m


def _run_sink(spark, srcdir, m, ckpt, key="id"):
    register_stream_sources(spark)
    q = (
        spark.readStream.schema(f"{key} long, v double, op string, ts long")
        .parquet(f"{srcdir}/*.parquet")
        .writeStream.format("state_table")
        .option("path", m.root)
        .option("keyCol", key)
        .option("tsCols", "ts")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_sink_availablenow_and_incremental_restart(spark, tmp_path):
    work = str(tmp_path)
    m = _init_mirror(spark, f"{work}/m")
    srcdir = f"{work}/src"
    os.makedirs(srcdir)
    spark.range(0, 50).select(
        F.col("id"),
        F.lit(-5.0).alias("v"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
        F.lit(1).cast("long").alias("ts"),
    ).write.parquet(f"{srcdir}/f1.parquet")
    _run_sink(spark, srcdir, m, f"{work}/ckpt")
    got = m.read(spark)
    assert got.count() == 295  # ids 0,10,20,30,40 deleted
    assert got.filter("v = -5.0").count() == 45
    cur = m.current()
    assert cur["operation"] == "sink_commit"
    assert cur["sink_batch_id"] == 0
    # second trigger from the SAME checkpoint picks up only the new file
    spark.range(40, 80).select(
        F.col("id"),
        F.lit(7.5).alias("v"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("ts"),
    ).write.parquet(f"{srcdir}/f2.parquet")
    _run_sink(spark, srcdir, m, f"{work}/ckpt")
    got2 = m.read(spark)
    assert got2.filter("v = 7.5").count() == 40
    assert got2.count() == 296  # deleted id 40 re-inserted by ts=2 upsert
    assert m.current()["sink_batch_id"] == 1


def test_sink_fence_skips_replayed_batch(spark, tmp_path):
    # crash between the source-offset commit and the fence write replays
    # the batch id: commit() must no-op and clean the restaged files
    from tabular_cdc_bootstrapper_spark.streaming.datasource import (
        StateTableStreamWriter,
        _SinkBatchMessage,
    )

    work = str(tmp_path)
    m = _init_mirror(spark, f"{work}/m")
    srcdir = f"{work}/src"
    os.makedirs(srcdir)
    spark.range(0, 20).select(
        F.col("id"),
        F.lit(-1.0).alias("v"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("ts"),
    ).write.parquet(f"{srcdir}/f1.parquet")
    _run_sink(spark, srcdir, m, f"{work}/ckpt")
    v_after = m.current()["version"]
    # replay batch 0 by hand with a fresh staged file
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "op", "type": "string", "nullable": True, "metadata": {}},
                {"name": "ts", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = StateTableStreamWriter(
        schema,
        {"path": m.root, "keyCol": "id", "tsCols": "ts"},
    )
    staged = os.path.join(m.root, "_sink", "staging", "replay.parquet")
    pq.write_table(
        pa.table({"id": [3], "v": [-777.0], "op": ["U"], "ts": [9]}), staged
    )
    w.commit([_SinkBatchMessage({3: [staged]}, 1, {})], batchId=0)
    assert m.current()["version"] == v_after  # nothing published
    assert not os.path.exists(staged)  # restage cleaned
    assert m.read(spark).filter("v = -777.0").count() == 0


def test_sink_onto_copy_on_write_table(spark, tmp_path):
    # delta specs fold on read regardless of the table's own merge mode;
    # rewrite_data_files later folds them into the base
    work = str(tmp_path)
    m = _init_mirror(spark, f"{work}/m", mor=False)
    srcdir = f"{work}/src"
    os.makedirs(srcdir)
    spark.range(0, 30).select(
        F.col("id"),
        F.lit(-2.0).alias("v"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("ts"),
    ).write.parquet(f"{srcdir}/f1.parquet")
    _run_sink(spark, srcdir, m, f"{work}/ckpt")
    assert m.read(spark).filter("v = -2.0").count() == 30
    m.rewrite_data_files(spark)
    assert not (m.current().get("deltas") or {})
    assert m.read(spark).filter("v = -2.0").count() == 30


def test_sink_string_keys(spark, tmp_path):
    work = str(tmp_path)
    base = spark.range(0, 100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
        (F.col("id") * 1.0).alias("v"),
    )
    m = VersionedBucketMirror(
        f"{work}/m", n_buckets=8, key_col="k", keep_versions=10,
        merge_on_read=True,
    )
    m.initialize(base)
    srcdir = f"{work}/src"
    os.makedirs(srcdir)
    spark.range(0, 40).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
        F.lit(-3.0).alias("v"),
        F.when(F.col("id") % 4 == 0, "D").otherwise("U").alias("op"),
        F.lit(1).cast("long").alias("ts"),
    ).write.parquet(f"{srcdir}/f1.parquet")
    register_stream_sources(spark)
    q = (
        spark.readStream.schema("k string, v double, op string, ts long")
        .parquet(f"{srcdir}/*.parquet")
        .writeStream.format("state_table")
        .option("path", m.root)
        .option("keyCol", "k")
        .option("tsCols", "ts")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = m.read(spark)
    assert got.count() == 90  # 10 deletes (id%4==0 of 0..39)
    assert got.filter("v = -3.0").count() == 30


def test_sink_option_and_state_guards(spark, tmp_path):
    register_stream_sources(spark)
    from tabular_cdc_bootstrapper_spark.streaming.datasource import (
        StateTableStreamWriter,
    )
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "op", "type": "string", "nullable": True, "metadata": {}},
                {"name": "ts", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    # uninitialized table refused
    with pytest.raises(ValueError, match="not an initialized"):
        StateTableStreamWriter(
            schema,
            {"path": str(tmp_path / "nope"), "keyCol": "id", "tsCols": "ts"},
        )
    m = _init_mirror(spark, str(tmp_path / "m"))
    # composite keys refused (the mirror buckets by ONE key)
    with pytest.raises(ValueError, match="ONE key"):
        StateTableStreamWriter(
            schema, {"path": m.root, "keyCol": "a,b", "tsCols": "ts"}
        )
    # missing envelope column refused
    with pytest.raises(ValueError, match="missing from the"):
        StateTableStreamWriter(
            schema, {"path": m.root, "keyCol": "nope", "tsCols": "ts"}
        )


def test_table_to_table_streaming_composition(spark, tmp_path):
    """readStream.format('table_changes') → writeStream.format(
    'state_table'): table A's commits stream into table B entirely under
    Spark's checkpoint machinery; after the drain B's head equals A's."""
    work = str(tmp_path)
    register_stream_sources(spark)
    a = VersionedBucketMirror(
        f"{work}/a", n_buckets=8, key_col="id", keep_versions=10
    )
    base = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 9).alias("g"), (F.col("id") * 1.0).alias("v")
    )
    a.initialize(base)
    # two committed mutations on A
    a.delete_where(spark, "g = 4")
    a.update_where(spark, "g = 2", {"v": "v + 1000"})
    b = VersionedBucketMirror(
        f"{work}/b", n_buckets=8, key_col="id", keep_versions=10,
        merge_on_read=True,
    )
    b.initialize(base)
    feed = (
        spark.readStream.format("table_changes")
        .option("path", a.root)
        .option("keyCols", "id")
        .option("startingVersion", str(a.history()[0]["version"]))
        .option("dropCols", "")
        .load()
    )
    # the change feed's op column IS the sink's op column; a synthetic
    # monotonic ts orders replays (I/U/D diffs of consecutive snapshots
    # are already latest-per-key per window)
    q = (
        feed.withColumn("ts", F.lit(1).cast("long"))
        .writeStream.format("state_table")
        .option("path", b.root)
        .option("keyCol", "id")
        .option("tsCols", "ts")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = b.read(spark).select("id", "g", "v")
    exp = a.read(spark).select("id", "g", "v")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
