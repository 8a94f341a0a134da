#!/usr/bin/env python
"""Standalone median-of-5 re-certification of pq_adc_topk (VERDICT r8 #1).

Runs ONLY pq_adc_topk at sf0.1 in a fresh interpreter, serialized (no
concurrent Spark work), with the UDF-heavy one-run warm discard, and
prints per-run + median seconds. House rule: a >2x-vs-baseline spike
that does not reproduce under this procedure is adjudicated host noise
(BASELINE.md adjudication rule, [[bench-discipline]]).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark import queries as q
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    spark = get_spark("recert-pq-adc", shuffle_partitions=int(cpus))
    ensure_self_on_workers(spark)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    fn = q.QUERIES["pq_adc_topk"]
    runs: list[float] = []
    for i in range(6):  # 1 warm discard + 5 timed
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        if i > 0:
            runs.append(round(dt, 3))
        print(json.dumps({"run": i, "sec": round(dt, 3), "warm": i == 0}),
              flush=True)
    print(json.dumps({
        "q": "pq_adc_topk",
        "median5": round(statistics.median(runs), 3),
        "runs": runs,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
