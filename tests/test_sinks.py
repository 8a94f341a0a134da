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


def test_end_to_end_clean_corpus_materialization(spark, sf_dir, tmp_path):
    """The whole cleaning pipeline as one integration law: detect near-dup
    pairs (MinHash, verified) on a corpus with planted exact + near
    duplicates, derive the keep/drop decision (dedup_clusters canonical),
    MATERIALIZE the cleaned corpus partitioned by lang, and verify the
    re-read output: planted copies gone, canonicals kept, every
    non-clustered document untouched, partition layout readable with
    pruning."""
    from pyspark.sql import functions as F

    from tabular_cdc_bootstrapper_spark.functions.dedup import (
        verified_near_duplicates,
    )
    from tabular_cdc_bootstrapper_spark.functions.graph import dedup_clusters

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    exact_copy = base.filter(F.col("doc_id") == 2).withColumn(
        "doc_id", F.lit(7_000_002)
    )
    near_copy = (
        base.filter(F.col("doc_id") == 3)
        .withColumn("doc_id", F.lit(7_000_003))
        .withColumn(
            "text", F.concat(F.lit("zzz "), F.expr("substring(text, 5, length(text))"))
        )
    )
    corpus = base.unionByName(exact_copy).unionByName(near_copy)

    pairs = verified_near_duplicates(corpus, threshold=0.5, persist=False)
    decision = dedup_clusters(pairs)
    keep = corpus.join(
        decision.filter(~F.col("is_canonical")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    out = str(tmp_path / "clean_corpus")
    keep.write.partitionBy("lang").mode("overwrite").parquet(out)

    cleaned = spark.read.parquet(out)
    ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    # canonical (min-id) survivors stay, planted copies are dropped
    assert {2, 3} <= ids
    assert not ({7_000_002, 7_000_003} & ids)
    # drops == planted copies + the fixture's NATURAL near-dup
    # non-canonicals (pairs (0,50) and (8,12) exist in the first 80 docs —
    # the pipeline finding them is part of the law; their canonicals stay)
    assert {0, 8} <= ids
    assert ids == {r["doc_id"] for r in corpus.select("doc_id").collect()} - {
        7_000_002,
        7_000_003,
        50,
        12,
    }
    # partition pruning works on the materialized layout
    one_lang = cleaned.filter(F.col("lang") == "en")
    assert one_lang.count() == len(
        [r for r in corpus.collect() if r["lang"] == "en" and r["doc_id"] in ids]
    )


def test_compaction_with_zorder_reclusters(spark, tmp_path):
    """OPTIMIZE-with-ZORDER shape: compacting small files with zorder_by
    preserves the data AND leaves every output file with a tight
    two-dimensional bounding box (the min/max stats scans prune on)."""
    import glob

    import pandas as pd

    from tabular_cdc_bootstrapper_spark.sources.sinks import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    n = 4096
    rows = [(i, (i * 2654435761) % 4096, (i * 40503) % 4096) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    df.repartition(64).write.parquet(path)  # 64 small unclustered files
    before = {(r.id, r.x, r.y) for r in spark.read.parquet(path).collect()}

    n_files = compact_small_files(
        spark, path, target_file_bytes=4 * 1024, zorder_by=["x", "y"]
    )
    after = {(r.id, r.x, r.y) for r in spark.read.parquet(path).collect()}
    assert after == before
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == n_files and n_files > 1
    boxes = []
    for f in files:
        pdf = pd.read_parquet(f, columns=["x", "y"])
        boxes.append(
            (pdf.x.max() - pdf.x.min() + 1) * (pdf.y.max() - pdf.y.min() + 1)
        )
    # clustered rewrite: average per-file box well under the global box
    assert sum(boxes) / len(boxes) < (4096 * 4096) / 3
