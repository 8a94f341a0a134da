#!/usr/bin/env python
"""Benchmark: run every registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Per-query timing is end-to-end (plan + execute + count) after a shared
warm-up of the JVM; `value` is total wall-clock seconds across all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark import queries as q

    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_spark("bench", shuffle_partitions=int(cpus))

    # warm up the JVM + parquet footer cache outside the timed region
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in q.QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
