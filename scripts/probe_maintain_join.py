#!/usr/bin/env python
"""10×-corpus probe of maintain_join (r9): fixed-size two-sided CDC batch
(2k fact events + 200 dim events) applied to a fact⋈dim view at 100k and
1M fact rows. Times incremental maintenance vs a from-scratch recompute
of the join at each size. Pass criterion: the incremental path's growth
for 10× corpus stays well below linear (its only corpus-sized work is
broadcast-probe scans — no corpus shuffle), while recompute shuffles the
whole fact side every batch.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def frames(spark, n_fact: int):
    from pyspark.sql import functions as F

    n_dim = n_fact // 10
    fact = spark.range(n_fact).select(
        F.col("id").alias("fid"),
        (F.col("id") % (n_dim + 100)).alias("dref"),  # ~9% unmatched
        (F.col("id") * 7 % 1000).cast("double").alias("fval"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("did"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("dval"),
    )
    return fact, dim


def batch(spark, n_fact: int):
    from pyspark.sql import functions as F

    n_dim = n_fact // 10
    fb = (
        spark.range(1000)
        .select(
            (F.col("id") * 17 % n_fact).alias("fid"),
            (F.col("id") % n_dim).alias("dref"),
            F.lit(-1.0).alias("fval"),
            F.lit("U").alias("op"),
            F.lit(1).cast("int").alias("ts"),
        )
        .unionByName(
            spark.range(1000).select(
                (F.col("id") * 31 % n_fact).alias("fid"),
                F.lit(None).cast("long").alias("dref"),
                F.lit(None).cast("double").alias("fval"),
                F.lit("D").alias("op"),
                F.lit(2).cast("int").alias("ts"),
            )
        )
    )
    db = spark.range(200).select(
        (F.col("id") * 13 % n_dim).alias("did"),
        F.lit("moved").alias("dval"),
        F.lit("U").alias("op"),
        F.lit(1).cast("int").alias("ts"),
    )
    return fb, db


def main() -> None:
    from tabular_cdc_bootstrapper_spark.operators.incremental import maintain_join
    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    spark = get_spark("probe-maintain-join", shuffle_partitions=32)
    ensure_self_on_workers(spark)
    out = {}
    for n in (100_000, 1_000_000):
        fact, dim = frames(spark, n)
        fact = fact.localCheckpoint(eager=True)
        dim = dim.localCheckpoint(eager=True)
        view = fact.join(dim, fact["dref"] == dim["did"]).localCheckpoint(
            eager=True
        )
        fb, db = batch(spark, n)
        fb = fb.localCheckpoint(eager=True)
        db = db.localCheckpoint(eager=True)
        inc_runs, rec_runs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            maintain_join(
                view, fact, dim, fb, db, "fid", "did", "dref", "ts"
            ).count()
            inc_runs.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
            from tabular_cdc_bootstrapper_spark.operators.cdc import (
                apply_changelog,
            )

            t0 = time.perf_counter()
            f1 = apply_changelog(
                fb, "fid", "ts", mirror=fact, drop_envelope=("op", "ts")
            )
            d1 = apply_changelog(
                db, "did", "ts", mirror=dim, drop_envelope=("op", "ts")
            )
            f1.join(d1, f1["dref"] == d1["did"]).count()
            rec_runs.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        out[n] = {
            "incremental_median3": statistics.median(inc_runs),
            "recompute_median3": statistics.median(rec_runs),
            "inc_runs": inc_runs,
            "rec_runs": rec_runs,
        }
        print(json.dumps({"n_fact": n, **out[n]}), flush=True)
    print(
        json.dumps(
            {
                "inc_growth_for_10x": round(
                    out[1_000_000]["incremental_median3"]
                    / out[100_000]["incremental_median3"],
                    2,
                ),
                "rec_growth_for_10x": round(
                    out[1_000_000]["recompute_median3"]
                    / out[100_000]["recompute_median3"],
                    2,
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
