"""Sink/layout tests: partitioned writes prune, bucketed joins skip the
shuffle, compaction preserves data, non-parquet formats round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.plans.inspect import (
    exchange_count,
    physical_plan,
)
from tabular_cdc_bootstrapper_spark.sources.sinks import (
    compact_small_files,
    round_trip_format,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_part")
    write_partitioned(o, out, ["o_orderstatus"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    )
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    # partition pruning: only the F directory is scanned
    plan = physical_plan(df)
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan
    assert df.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS sink_test")
    spark.sql(f"ALTER DATABASE sink_test SET LOCATION '{tmp_path}/wh'")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "sink_test.orders_b", "o_orderkey", 8, "o_orderkey")
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "sink_test.lineitem_b", "o_orderkey", 8, "o_orderkey",
    )
    ob, lb = spark.table("sink_test.orders_b"), spark.table("sink_test.lineitem_b")
    joined = ob.join(lb, "o_orderkey")
    n_exchanges = exchange_count(joined)
    assert n_exchanges == 0, physical_plan(joined)
    assert joined.count() == l.count()
    spark.sql("DROP DATABASE sink_test CASCADE")


def test_compaction_preserves_data(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "many_files")
    o.repartition(20).write.parquet(out)
    before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert before >= 20
    n_after = compact_small_files(spark, out)
    assert n_after < before
    assert spark.read.parquet(out).count() == o.count()


def test_format_round_trips(spark, sf_dir, tmp_path):
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    for fmt in ("csv", "json", "orc", "parquet"):
        back = round_trip_format(n, spark, str(tmp_path / f"rt_{fmt}"), fmt)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect())), fmt
