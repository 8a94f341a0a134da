#!/usr/bin/env python
"""Benchmark: run every registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Per-query timing is end-to-end (plan + execute + count) after a shared
warm-up of the JVM; each query reports the MEDIAN of $SPARK_GRAFT_RUNS
(default 3) runs — single-run wall-clock on a shared host carries ±15%+
noise, enough to fake 2× regressions. `value` is the sum of medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import pandas as _pd  # module-level: `from __future__ import annotations`
# stringifies hints, and pandas_udf resolves them against module globals

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark import queries as q

    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_spark("bench", shuffle_partitions=int(cpus))

    # ship the package to python workers: pandas-UDF closures deserialize
    # by module reference, and when bench runs from outside the repo the
    # workers' sys.path has no way to import it otherwise
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    ensure_self_on_workers(spark)

    # warm up the JVM, parquet footer cache, and python UDF workers outside
    # the timed region (shared session setup; per-query planning/codegen is
    # still inside each query's timing)
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pyspark.sql import functions as _F

    @_F.pandas_udf("long")
    def _noop(s: _pd.Series) -> _pd.Series:
        return s

    spark.range(1000).select(_noop("id")).count()

    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in q.QUERIES.items():
        # per-query error isolation (same discipline as catalog.py C1):
        # one broken query must not zero the whole round's perf signal
        try:
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
                # queries that persist() intermediates (minhash, hll) must
                # not hand later runs a warm cache — each run times cold
                spark.catalog.clearCache()
            dt = round(statistics.median(runs), 3)  # true median, even n too
            timings[name] = dt
            total += dt
        except Exception as exc:  # noqa: BLE001 — report, don't die
            spark.catalog.clearCache()
            msg = f"{type(exc).__name__}: {exc}"[:500]
            timings[name] = {"err": msg}
            errors[name] = msg
            print(f"bench: {name} FAILED: {msg}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                # value sums only the SURVIVING queries: a non-zero
                # n_failed means the headline total is not comparable
                # round-over-round — check errors before trending it
                "n_failed": len(errors),
                "sf": sf,
                "runs_per_query": n_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
