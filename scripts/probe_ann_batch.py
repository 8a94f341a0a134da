#!/usr/bin/env python
"""100×-queries probe of ann_query's two query-side strategies (VERDICT
r8 task 8): broadcast (interactive shape) vs shuffle_hash (batch-
inference shape) at 5 / 500 / 2000 queries against the sf0.1 embedding
index. The point is structural — the shuffle path has no
query-frame-must-fit-in-memory ceiling — but the probe also shows its
wall-clock stays in the same regime at batch sizes where broadcast still
works, so the auto threshold is a safe default."""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        ann_query,
        build_ann_index,
    )
    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-ann-batch", shuffle_partitions=32)
    ensure_self_on_workers(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = tempfile.mkdtemp(prefix="spark_graft_ann_batch_probe_")
    build_ann_index(
        spark, emb, root, n_centroids=64, n_subspaces=8, n_codes=16, dim=64
    )
    from tabular_cdc_bootstrapper_spark.functions.ann_index import AnnIndex

    idx = AnnIndex(root)
    for n_q in (5, 500, 2000):
        q = emb.filter(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("qid"), "embedding"
        ).localCheckpoint(eager=True)
        for mode in (True, False):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                ann_query(spark, idx, q, k=10, broadcast_queries=mode).count()
                runs.append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
            print(json.dumps({
                "n_queries": n_q,
                "mode": "broadcast" if mode else "shuffle",
                "median3": statistics.median(runs),
                "runs": runs,
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
