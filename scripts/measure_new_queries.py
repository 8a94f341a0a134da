#!/usr/bin/env python
"""Median-of-5 at sf0.1 for queries named on argv — the BASELINE.md row
measurement procedure (serialized, 1 warm discard, clearCache between
runs)."""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import os

    from tabular_cdc_bootstrapper_spark import queries as q
    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure-new", shuffle_partitions=32)
    ensure_self_on_workers(spark)
    for t in "orders lineitem documents embeddings".split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    for name in sys.argv[1:]:
        fn = q.QUERIES[name]
        runs = []
        for i in range(6):  # 1 warm discard + 5
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            if i > 0:
                runs.append(dt)
        print(json.dumps({
            "q": name, "median5": statistics.median(runs), "runs": runs,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
