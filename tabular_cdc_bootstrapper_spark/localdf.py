"""Arrow-backed construction of small driver-local DataFrames.

A plain ``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the
pickled rows into ``defaultParallelism`` partitions, and EVERY downstream
evaluation of those partitions pays a Python-worker roundtrip — harmless
for one parallel count, pathological when a narrow dependency serializes
them: ``createDataFrame(rows).coalesce(1).write.parquet(...)`` runs 32
sequential Python-worker evaluations inside one task (measured ~5-7 s per
write at local[32], recurring — OPTIMIZATION_r15.md, guide §4: the JVM↔
Python boundary). Routing the same rows through pandas + Arrow yields a
JVM-side relation with no Python evaluation in any task: the same write
measures ~0.2 s, and every later action over the frame (unions into
report outputs, broadcast joins) stops launching Python workers.

``local_df`` is behavior-preserving: the caller's explicit schema governs
(same declared types and nullability as the pickle path), and any
conversion the Arrow path cannot express falls back to the classic
``createDataFrame``. Use it for bounded, model-sized driver data only —
the same house rule that already governs every ``collect()``.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: "str | T.StructType",
) -> DataFrame:
    """Build a small local DataFrame via pandas/Arrow (JVM relation, no
    Python workers in tasks); fall back to the classic pickled path on
    any conversion error. ``rows`` must be tuple-shaped (positional)."""
    rows = list(rows)
    if not rows:
        # empty input already builds a JVM-side empty LocalRelation
        return spark.createDataFrame([], schema)
    # NaN is NOT behavior-preserving through pandas/Arrow (ADVICE r15):
    # the Arrow path coerces float NaN to null while the classic path
    # keeps it a real NaN value — any NaN cell takes the classic path.
    # Bounded rows by contract, so the scan is O(model size).
    if any(
        isinstance(v, float) and v != v for row in rows for v in row
    ):
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        st = (
            T._parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        if not isinstance(st, T.StructType):
            raise TypeError(f"row schema required, got {st}")
        pdf = pd.DataFrame(rows, columns=st.names, dtype=object)
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, schema)
