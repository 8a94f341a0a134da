"""Per-bucket min/max stats from parquet FOOTERS (r15 optimization round).

Every manifest commit used to re-read its freshly staged bytes with one
``spark.read.parquet(staging).groupBy("bucket").agg(min/max)`` action to
record the per-bucket column bounds — one extra Spark job (plus a
partition-discovery listing job once the staging dir holds >32 bucket
dirs) on EVERY initialize/merge/regrain/rebucket/compaction commit.

Parquet already wrote those bounds: each row group's column-chunk
statistics carry exact min/max for the physical types Spark writes for
ints, floats, dates and timestamps. ``footer_bucket_stats`` folds them
driver-side with pure footer reads (O(KB) per file, no Spark job) —
the same metadata-not-data move Iceberg's manifests make, and byte-
equal to the aggregate the Spark job produced.

Scope is deliberately conservative: the fast path only fires when every
requested column, in every staged file, is a non-string atomic type
whose parquet statistics are present and exact (strings can carry
TRUNCATED bounds, which are sound for pruning but not byte-equal to the
aggregate; decimals/binary pass through to the Spark path). Any surprise
— missing column, absent stats, unexpected type — returns ``None`` and
the caller falls back to the aggregate job, so behavior can only be
identical-but-cheaper.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
import re
from typing import Sequence

_BUCKET_DIR = re.compile(r"bucket=([^/]+)$")

#: pyarrow logical types whose parquet stats are exact and convert to the
#: same Python values Spark's collect() returns (session TZ pinned UTC)
_SAFE_KINDS = (
    # floats are deliberately absent: NaN poisons parquet float stats
    # (writers omit or mis-order them) while Spark's min/max have their
    # own NaN ordering — the fallback aggregate stays the float path.
    # timestamps are absent too (r16, ADVICE r15): the Spark collect()
    # fallback this path claims byte-equality with renders TimestampType
    # in the DRIVER's OS-local timezone, while footer stats are UTC —
    # on a non-UTC driver the two paths disagree (measured 5 h skew), so
    # timestamp columns always take the aggregate job
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "bool",
    "date32[day]", "date64[ms]",
)


def _convert(v):
    """Normalize a pyarrow statistics value to what Spark collect()
    yields under a UTC session: tz-aware timestamps → naive UTC."""
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def footer_bucket_stats(
    staging: str, cols: Sequence[str]
) -> "dict[str, dict] | None":
    """``{bucket: {col: [min, max]}}`` from the footers of
    ``staging/bucket=*/**.parquet``, or ``None`` when any file/column
    falls outside the exact-stats fast path."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    out: dict[str, dict] = {}
    try:
        bucket_dirs = sorted(glob.glob(os.path.join(staging, "bucket=*")))
        if not bucket_dirs:
            return None
        for bdir in bucket_dirs:
            m = _BUCKET_DIR.search(bdir)
            if not m:
                return None
            bucket = str(int(m.group(1)))  # same key render as the
            # aggregate path's str(int(r["bucket"])); non-int → fallback
            files = sorted(
                glob.glob(os.path.join(bdir, "**", "*.parquet"), recursive=True)
            )
            if not files:
                continue
            agg: dict[str, list] = {}
            for f in files:
                md = pq.ParquetFile(f).metadata
                schema = md.schema.to_arrow_schema()
                idx = {}
                for c in cols:
                    i = schema.get_field_index(c)
                    if i < 0:
                        return None
                    t = str(schema.field(i).type)
                    if t not in _SAFE_KINDS:
                        return None
                    idx[c] = i
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    if row_group.num_rows == 0:
                        continue
                    for c, i in idx.items():
                        st = row_group.column(i).statistics
                        if st is None or not st.has_min_max:
                            return None
                        mn, mx = _convert(st.min), _convert(st.max)
                        cur = agg.get(c)
                        if cur is None:
                            agg[c] = [mn, mx]
                        else:
                            if mn < cur[0]:
                                cur[0] = mn
                            if mx > cur[1]:
                                cur[1] = mx
            if agg:
                if set(agg) != set(cols):
                    return None
                out[bucket] = {c: (agg[c][0], agg[c][1]) for c in cols}
            elif files:
                # files existed but every row group was empty / statless
                return None
    except Exception:
        return None
    return out
