"""Fused per-directory purge scan/rewrite (r15 optimization round).

Both purge implementations (``ParquetStateTable.purge_keys`` and the
bucketed ``_purge_keys_locked``) used to run, PER touched directory, up
to three sequential Spark actions: a broadcast semi-join ``isEmpty``
(does this dir hold any purge key?), a broadcast anti-join ``isEmpty``
(would the purge empty it?), and a ``coalesce(1)`` rewrite. At toy scale
that is ~3 × n_dirs tiny jobs of pure scheduling overhead (measured
~5-6 s of the snapshot_refs_report harness); at warehouse scale it
serializes n_dirs independent scans behind one driver loop (guide §2.6).

``purge_dirs_fused`` does the same work in TWO jobs per schema group:

1. one unioned broadcast semi-join aggregated by a per-dir id — every
   clean dir (no purge key present) is identified in a single pass, so
   the no-op re-run property is preserved exactly (clean dirs are never
   rewritten, never deleted, and never chained through purge outputs);
2. one unioned broadcast anti-join written ``partitionBy`` the per-dir
   id into a staging dir (``repartition`` by the id keeps one file per
   dir, matching the old per-dir ``coalesce(1)`` output shape), then a
   driver-side rename installs each partition under its target
   immutable name. A dir whose partition is absent was emptied by the
   purge — the caller drops it from the manifests, exactly as before.

Dirs are grouped by exact schema before the union (merge-on-read
keys-only delta slices and post-ALTER snapshots must keep their own
written schema — a blind union would null-pad them).

Any failure (e.g. the r12 TOCTOU: a concurrently-expired dir vanishing
mid-scan) raises to the caller, which falls back to the original
per-dir loop for that catch-up round — the fused path is a fast path,
not a semantics change.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def purge_dirs_fused(
    spark: SparkSession,
    items: Sequence[tuple[str, str]],
    probe: DataFrame,
    cond: "Callable[[DataFrame], object]",
    staging_root: str,
    keep_empty: bool = False,
) -> tuple[set, dict]:
    """``items``: (source_dir, target_dir) pairs, source dirs distinct.
    ``cond(df)`` builds the df↔probe join condition. Returns
    ``(clean_dirs, dir_map)`` where ``dir_map[src]`` is the rewritten
    dir, or ``None`` when the purge emptied it. With ``keep_empty`` an
    emptied dir is written as an empty typed parquet dir instead (the
    ``ParquetStateTable`` contract: a fully-purged snapshot stays a
    readable 0-row version). Raises on any error — caller falls back to
    the per-dir path."""
    frames: dict[str, DataFrame] = {}
    groups: dict[tuple, list[str]] = {}
    for d, _dst in items:
        df = spark.read.parquet(d)
        frames[d] = df
        key = tuple((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        groups.setdefault(key, []).append(d)
    dst_for = dict(items)
    clean: set = set()
    dir_map: dict = {}
    for dirs in groups.values():
        def _union(sel: "Sequence[str]") -> DataFrame:
            u = None
            for i, d in enumerate(dirs):
                if d not in sel:
                    continue
                fr = frames[d].withColumn("__pdir", F.lit(i))
                u = fr if u is None else u.unionByName(fr)
            return u

        u = _union(dirs)
        hits = {
            int(r["__pdir"])
            for r in u.join(F.broadcast(probe), cond(u), "left_semi")
            .select("__pdir")
            .distinct()
            .collect()
        }
        hit_dirs = [d for i, d in enumerate(dirs) if i in hits]
        clean.update(d for i, d in enumerate(dirs) if i not in hits)
        if not hit_dirs:
            continue
        u2 = _union(set(hit_dirs))
        stg = os.path.join(staging_root, f"purge-stg-{uuid.uuid4().hex[:8]}")
        try:
            (
                u2.join(F.broadcast(probe), cond(u2), "left_anti")
                .repartition(F.col("__pdir"))
                .write.partitionBy("__pdir")
                .mode("errorifexists")
                .parquet(stg)
            )
            for i, d in enumerate(dirs):
                if i not in hits:
                    continue
                part = os.path.join(stg, f"__pdir={i}")
                dst = dst_for[d]
                if os.path.isdir(part):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(part, dst)
                    dir_map[d] = dst
                elif keep_empty:  # emptied, but must stay readable
                    frames[d].limit(0).write.mode("errorifexists").parquet(dst)
                    dir_map[d] = dst
                else:  # no surviving rows: the purge emptied this dir
                    dir_map[d] = None
        finally:
            shutil.rmtree(stg, ignore_errors=True)
    return clean, dir_map
