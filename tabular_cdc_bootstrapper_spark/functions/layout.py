"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning, the warehouse `OPTIMIZE ... ZORDER BY` / Iceberg sort-order
primitive re-expressed Spark-first.

Why it matters at 100 TB: a table range-partitioned on ONE key prunes
scans only on that key; interleaving the bits of two (or more) keys into
a single sort key makes files cluster in ALL of them at once — each file
covers a small hyper-rectangle of the key space, so min/max file stats
(parquet footers, Iceberg manifests) prune selective predicates on any
participating dimension.

Design decisions:

1. **Exact integer pipeline.** Each dimension is min-max normalized to a
   ``bits``-wide integer via ``(v − min) · (2^bits − 1) // (max − min)``
   — subtraction, multiply, and TRUNC-division all in int64, so any
   engine reproduces the code bit-for-bit (the same
   oracle-exactness rule as clustering.py's quantization). The min/max
   come from one aggregate joined back as a 1-row literal broadcast —
   never a driver round-trip in the plan.
2. **JVM-side bit interleave.** The Morton code is a chain of
   shiftright/AND/shiftleft/OR column expressions — whole-stage-codegen
   fodder, no UDF, no Python. dims·bits ≤ 62 keeps the code in a signed
   int64.
3. **Layout via range partitioning.** ``write_zordered`` sorts by the
   z-key with ``repartitionByRange`` (distributed sampling picks the
   boundaries — no global sort on one node) then
   ``sortWithinPartitions`` so every output file is a contiguous z-range
   = a small hyper-rectangle. Reading back, per-file min/max of EVERY
   participating dimension is tight — which is the entire point.

The reference delegates physical layout to its SaaS warehouse
(`/root/reference/batch-bootstrapper/tabular.py:92` — table creation
only); this module is the corresponding data-plane capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """``(col − mn) · (2^bits − 1) // (mx − mn)`` in exact int64 (inputs
    must be non-negative-range integers). Degenerate ``mx == mn`` maps
    everything to 0. The // is emulated as ``(a − a % b) / b`` — a, b ≥ 0
    and a % b is exact, so the double division is of an exact multiple
    and therefore exact."""
    # exactness domain: (col − mn)·(2^bits − 1) must stay below 2^53 for
    # the emulated // (i.e. value span < ~2^37 at bits=16) — far beyond
    # any scaled layout dimension, but a contract, not an accident
    top = F.lit((1 << bits) - 1).cast("long")
    span = F.greatest(mx - mn, F.lit(1).cast("long"))
    a = (col - mn) * top
    return ((a - a % span) / span).cast("long")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already-scaled) column into a
    Morton code. Bit i of column j lands at position
    ``i·n + (n − 1 − j)`` for n = len(cols) — column 0 owns the
    most-significant slot of each group, so the code
    sorts first on col 0's high bit, then col 1's, alternating downward
    (the standard z-curve). Pure column expressions: whole-stage codegen,
    no shuffle, no UDF."""
    n = len(cols)
    assert n * bits <= 62, "Morton code must fit a signed int64"
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return z


def with_zorder_key(
    df: DataFrame, dim_cols: list[str], bits: int = 16, out_col: str = "zval"
) -> DataFrame:
    """Append the Morton key over min-max-scaled ``dim_cols``. The min/max
    aggregate rides back as a 1-row literal broadcast (crossJoin of a
    1-row frame — the repo-wide pattern for scalar models), so the plan
    is scan → agg (tiny) → broadcast join → projection; the corpus never
    shuffles."""
    aggs = []
    for c in dim_cols:
        aggs.append(F.min(c).cast("long").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"__mx_{c}"))
    mm = df.agg(*aggs)
    scaled = [
        minmax_scale(
            F.col(c).cast("long"), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in dim_cols
    ]
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn(out_col, zorder_key(scaled, bits))
        .drop(*[f"__mn_{c}" for c in dim_cols], *[f"__mx_{c}" for c in dim_cols])
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dim_cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Materialize ``df`` as ``n_files`` z-ordered parquet files: rows are
    range-partitioned on the Morton key (sampled boundaries — the sort
    never funnels through one task) and sorted within each partition, so
    every file is a contiguous z-range whose per-dimension min/max stats
    are tight. At warehouse scale this is the compaction/OPTIMIZE step;
    the z-key column is dropped before write (it is derivable layout
    metadata, not data)."""
    keyed = with_zorder_key(df, dim_cols, bits)
    (
        keyed.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
