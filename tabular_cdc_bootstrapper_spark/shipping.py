"""Ship this package to Spark Python workers.

Python-UDF closures (pandas_udf / mapInPandas / applyInPandas) are
cloudpickled *by reference* for functions defined in importable modules —
the worker process must be able to ``import tabular_cdc_bootstrapper_spark``
itself. When the driver script runs from outside the repo (the harness
does), workers inherit a PYTHONPATH without it. ``ensure_self_on_workers``
zips the package once and registers it via ``sc.addPyFile`` so every
executor can import it, local or cluster.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_self_on_workers(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(os.environ.get("TMPDIR", "/tmp")) / "tabular_cdc_bootstrapper_spark_pkg.zip"
    sources = sorted(pkg_dir.rglob("*.py"))
    # rebuild whenever any source is newer than the zip: a stale zip ships
    # old module code to workers, and cloudpickle-by-reference then fails
    # with AttributeError on symbols added since (or silently runs old code)
    newest_src = max(p.stat().st_mtime for p in sources)
    if not zip_path.exists() or zip_path.stat().st_mtime <= newest_src:
        tmp = zip_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sources:
                zf.write(py, arcname=str(Path(pkg_dir.name) / py.relative_to(pkg_dir)))
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(key)
