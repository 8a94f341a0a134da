"""Banded range (interval) join — time-window equi+range joins at scale.

Semantics: pair every left row with every right row sharing its key whose
timestamp falls in ``[left_ts + lower_s, left_ts + upper_s]`` (both bounds
inclusive).  The classic use is event attribution: "clicks by the same user
in the 10 minutes before each purchase".

The reference delegates all temporal correlation to its SaaS data plane
(`batch_bootstrapper.py:49` hands files to DMS-style merge); this operator
is the batch analog of the streaming interval join
(`streaming/joins.py:interval_join`), re-expressed for bounded data.

Why banding instead of the two obvious plans:

- Plain non-equi join (``l.key == r.key AND r.ts BETWEEN …``): Spark plans
  the equi part as SortMergeJoin and applies the range as a post-join
  filter, so every (left, right) pair *within a key* is materialized
  before filtering — O(n_k · m_k) per key.  A hot key with 10⁶ events on
  each side scans 10¹² pairs at 100 TB.
- Pure range join with no equi key: BroadcastNestedLoopJoin, O(n·m)
  overall.  Non-viable.

Banding bounds the work: bucket the right side by
``band = epoch_us(ts) div band_width_us`` and explode each left row to the
(at most ``ceil(span/band_width) + 1``) bands its window can touch, then
equi-join on ``(key…, band)`` and apply the exact range predicate.  With
the default ``band_width = upper_s - lower_s`` each left row lands in ≤ 2
bands, and candidate pairs are limited to same-or-adjacent time buckets —
per-pair work proportional to actual temporal locality, not key
cardinality.  The band also becomes part of the shuffle key, so a hot
user's year of events spreads across many partitions instead of
collapsing onto one reducer (time-salting for free).

All band/bound arithmetic is **integer microseconds** end-to-end
(``unix_micros`` longs, SQL ``div``): double-precision banding can round
the left and right band expressions to different buckets when a window
edge coincides with a band edge (a 1-ulp miss drops a legitimate match).
Integer ``div`` truncates toward zero — monotonic, and identical on both
sides, which is the only property banding needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BAND = "__rj_band"
_LUS = "__rj_lus"
_RUS = "__rj_rus"


def _epoch_us(df: DataFrame, col: str) -> Column:
    """Integer µs for banding, without changing the column's time
    semantics. TIMESTAMP_NTZ is a wall clock: converting it through
    cast("timestamp") would reinterpret it as an instant in the SESSION
    timezone, and across a DST transition that mapping is non-linear — a
    pair 80 wall-clock minutes apart reads as 20 instant-minutes
    (spring-forward), silently flipping window membership.
    ``timestampdiff`` on NTZ operands is pure wall-clock arithmetic,
    timezone-free; plain TIMESTAMP takes the direct unix_micros path."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            f"`{col}`)"
        )
    return F.unix_micros(F.col(col).cast("timestamp"))


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_r",
    band_width_s: float | None = None,
) -> DataFrame:
    """Inner range join; right payload columns arrive as ``<col><suffix>``.

    ``lower_s``/``upper_s`` are offsets in seconds relative to the left
    timestamp (negative = past).  Use a smaller ``band_width_s`` when a
    single band would still be hot (more bands per left row, finer
    shuffle spread); the default is the window span itself, or 1 s for a
    point window (``upper_s == lower_s``), where the span would be 0.
    """
    if upper_s < lower_s:
        raise ValueError(f"empty window: [{lower_s}, {upper_s}]")
    # Mixed NTZ/instant inputs have no common epoch frame without a
    # timezone decision the caller must make: NTZ extracts wall-clock µs,
    # TIMESTAMP extracts UTC-instant µs, and comparing the two silently
    # shifts every window by the session-zone offset. Refuse instead.
    l_ntz = isinstance(left.schema[left_ts].dataType, T.TimestampNTZType)
    r_ntz = isinstance(right.schema[right_ts].dataType, T.TimestampNTZType)
    if l_ntz != r_ntz:
        raise ValueError(
            f"mixed timestamp kinds: left {left_ts!r} is "
            f"{left.schema[left_ts].dataType}, right {right_ts!r} is "
            f"{right.schema[right_ts].dataType}; cast one side so both are "
            "TIMESTAMP or both TIMESTAMP_NTZ"
        )
    keys = [on] if isinstance(on, str) else list(on)

    lo_us = round(lower_s * 1e6)
    up_us = round(upper_s * 1e6)
    if band_width_s is None:
        # point window (upper == lower) has span 0 — band by 1 s instead of
        # erroring about a parameter the caller never passed
        w_us = max(up_us - lo_us, 1_000_000)
    else:
        w_us = round(band_width_s * 1e6)
        if w_us <= 0:
            raise ValueError(f"band_width_s must be > 0, got {band_width_s}")

    payload = (
        [c for c in right.columns if c not in keys]
        if right_payload is None
        else list(right_payload)
    )
    r_ts_out = right_ts + suffix
    suffixed = [r_ts_out] + [c + suffix for c in payload if c != right_ts]
    clashes = sorted(set(suffixed) & set(left.columns))
    if clashes:
        raise ValueError(
            f"suffixed right columns {clashes} collide with left columns; "
            f"pass a different suffix (got {suffix!r})"
        )

    r = right.select(
        *keys,
        F.col(right_ts).alias(r_ts_out),
        *[F.col(c).alias(c + suffix) for c in payload if c != right_ts],
    )
    r = r.withColumn(_RUS, _epoch_us(r, r_ts_out)).withColumn(
        _BAND, F.expr(f"{_RUS} div {w_us}L")
    )

    # Left rows fan out to every band their window overlaps — a bounded,
    # in-plan sequence(), not a Python loop.  All-integer arithmetic.
    # `div` truncates toward zero rather than flooring, but it is monotonic
    # non-decreasing for a positive divisor, which is all banding needs:
    # any right ts inside the window lands in a band between the window
    # endpoints' bands, and sequence() enumerates that contiguous range.
    l = left.withColumn(_LUS, _epoch_us(left, left_ts)).withColumn(
        _BAND,
        F.explode(
            F.sequence(
                F.expr(f"({_LUS} + {lo_us}L) div {w_us}L"),
                F.expr(f"({_LUS} + {up_us}L) div {w_us}L"),
            )
        ),
    )

    matched = l.join(r, on=[*keys, _BAND], how="inner").where(
        (F.col(_RUS) >= F.col(_LUS) + F.lit(lo_us))
        & (F.col(_RUS) <= F.col(_LUS) + F.lit(up_us))
    )
    return matched.drop(_BAND, _LUS, _RUS)
