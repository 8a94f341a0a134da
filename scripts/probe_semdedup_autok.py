#!/usr/bin/env python
"""10×-corpus probe of semantic_dedup with the auto-derived k (VERDICT r8
task 2). Deterministic synthetic corpus (rotated distinct vectors, the
same shape as the r8 fixed-k probe): times k=None (auto_semdedup_k) at
2 k and 20 k rows. Pass criterion: auto-k keeps wall growth for 10× rows
far below the fixed-k 4.6× (the n²/k blowup), i.e. the flat k ∝ n regime.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def vecs(spark, n: int, dim: int = 16):
    from pyspark.sql import functions as F

    # semantically-distinct deterministic vectors: id-dependent rotation
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.cos((F.col("id") % 997) * 0.01 + j * 0.37)
                + 0.001 * ((F.col("id") + j) % 13)
            ),
        ).alias("embedding"),
    )


def main() -> None:
    from tabular_cdc_bootstrapper_spark.functions.dedup import (
        auto_semdedup_k,
        semantic_dedup,
    )
    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    spark = get_spark("probe-semdedup-autok", shuffle_partitions=32)
    ensure_self_on_workers(spark)
    out = {}
    for n in (2_000, 20_000):
        df = vecs(spark, n).localCheckpoint(eager=True)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            semantic_dedup(df, k=None, iters=2, id_col="vec_id").count()
            runs.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        out[n] = {
            "k_auto": auto_semdedup_k(n),
            "median3": statistics.median(runs),
            "runs": runs,
        }
        print(json.dumps({"n": n, **out[n]}), flush=True)
    growth = out[20_000]["median3"] / out[2_000]["median3"]
    print(json.dumps({"growth_for_10x": round(growth, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
