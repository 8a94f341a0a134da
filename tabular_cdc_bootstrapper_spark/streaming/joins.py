"""Stream-stream joins (SURVEY.md §2.9 extension).

Spark buffers both sides in watermarked state and emits matches as they
become provable; the watermark + time-bound join condition lets it expire
state, which is what makes the join feasible on unbounded streams — the
batch twin of the same expression is the correctness oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: each left event with right events of the same key that
    occur in (left.ts, left.ts + max_lag].

    Works identically on batch AND streaming inputs; for streams, BOTH
    sides must be watermarked so the state store can expire buffered rows
    once no counterpart can still arrive (state retention ≈ watermark +
    max_lag per side — bounded, which is the whole point at scale).
    """
    if left.isStreaming:
        left = left.withWatermark(ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts, watermark)
    l = left.select(
        F.col(key).alias("k"),
        F.col(ts).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.select(
        F.col(key).alias("rk"),
        F.col(ts).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond).select(
        F.col("k").alias("user_id"), "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
