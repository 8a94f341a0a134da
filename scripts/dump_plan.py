#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for registry queries to plans/<round>/.

Usage: python scripts/dump_plan.py <suffix> <query> [<query> ...]
Writes plans/$SPARK_GRAFT_PLANS/<query>_<suffix>.txt (default r16).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tabular_cdc_bootstrapper_spark.session import get_spark
    from tabular_cdc_bootstrapper_spark import queries as q

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_spark("dump_plan", shuffle_partitions=int(cpus))
    from tabular_cdc_bootstrapper_spark.shipping import ensure_self_on_workers

    ensure_self_on_workers(spark)
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS", "r16")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {out_dir.relative_to(REPO)}/{name}_{suffix}.txt ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
