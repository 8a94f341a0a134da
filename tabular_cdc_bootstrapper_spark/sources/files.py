"""File sources with the reference's *exclusion* glob semantics.

The reference's file loader takes a ``fileFilter`` that EXCLUDES matching
paths (reference tabular.py:137; used at batch_bootstrapper.py:69 to keep
DMS full-load files — ``**/LOAD*`` — out of the changelog, and at :85 to
keep incrementals — ``**/*-*`` — out of the mirror's one-shot load).
Spark's ``pathGlobFilter`` reader option is include-only, so exclusion is
expressed as an in-plan predicate on ``input_file_name()`` — it stays a
cheap, codegen'd string match evaluated during the scan, and Catalyst still
gets parquet pushdown/pruning for all data predicates.

Scale note (100 TB): predicate-on-filename filters rows *after listing*,
which is fine — listing cost dominates only with millions of tiny files,
where the production answer is an S3-inventory-driven explicit file list
(`spark.read.parquet(*files)`), the same inventory the reference's SaaS
polls (reference README.md:37-40). ``list_files`` implements that explicit
path for local/posix; the streaming source (streaming/pipeline.py) uses
checkpointed incremental listing instead.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def glob_to_regex(glob: str) -> str:
    """Translate a loader glob (``**/LOAD*``, ``LOAD*``) to a path regex.

    ``**`` crosses directory separators, ``*``/``?`` do not — standard glob
    semantics. The regex is applied to the FULL ``input_file_name()`` URI,
    so every glob is anchored as a path *suffix* starting at a path-segment
    boundary (``(^|/)…$``): a bare ``LOAD*`` matches any path whose last
    segment starts with LOAD (the loader-relative semantics the reference's
    fileFilter implies), and ``a/LOAD*`` matches that segment pair at any
    depth. A ``^…$``-anchored form would silently match *nothing* against a
    ``file:///…`` URI.
    """
    out, i = [], 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                i += 2
                if i < len(glob) and glob[i] == "/":
                    # '**/' = zero or more COMPLETE path segments; a bare
                    # '.*' here would erase the segment boundary, making
                    # 'x/**/LOAD*' wrongly match 'x/yLOAD1' and silently
                    # exclude files whose names merely contain the pattern
                    out.append("(.*/)?")
                    i += 1
                else:
                    out.append(".*")  # trailing/bare '**' crosses everything
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return "(^|/)" + "".join(out) + "$"


def exclude_glob_filter(glob: str) -> Column:
    """Predicate: keep rows whose source file does NOT match ``glob``."""
    return ~F.input_file_name().rlike(glob_to_regex(glob))


def list_files(
    root: str,
    include_glob: str | None = None,
    exclude_glob: str | None = None,
    suffix: str = ".parquet",
) -> list[str]:
    """Explicit recursive listing with include/exclude globs (local paths).

    Deterministic (sorted) so downstream file-sequence tie-breaks are
    stable. The S3 analog reads the bucket inventory table instead of
    walking the tree — same contract, different listing source.
    """
    found: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            if suffix and not f.endswith(suffix):
                continue
            if include_glob and not _glob_match(include_glob, rel):
                continue
            if exclude_glob and _glob_match(exclude_glob, rel):
                continue
            found.append(p)
    return sorted(found)


def _glob_match(glob: str, rel_path: str) -> bool:
    """Same path-suffix semantics as ``glob_to_regex`` (one source of truth
    for both the in-plan filter and the explicit listing)."""
    return re.search(glob_to_regex(glob), rel_path) is not None


def read_with_exclusion(
    spark: SparkSession,
    path: str,
    exclude_glob: str | None = None,
    schema=None,
    with_source_file: bool = False,
) -> DataFrame:
    """Batch parquet read honoring an exclusion glob.

    ``with_source_file`` adds ``_src_file`` (the originating file) — used
    as a deterministic CDC tie-break column (SURVEY.md §7 watch list).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("recursiveFileLookup", "true").parquet(path)
    if exclude_glob:
        df = df.filter(exclude_glob_filter(exclude_glob))
    if with_source_file:
        df = df.withColumn("_src_file", F.input_file_name())
    return df
