"""Streaming windowed aggregation (SURVEY.md §2.9 T5) + observability (A2).

The batch twins of these (events_tumbling_10min, user_sessions in
queries.py) are oracle-checked; here the same logical ops run as real
Structured Streaming queries — watermarked event-time windows, sliding
windows, session windows — so late/out-of-order data is handled by the
engine, not by luck of arrival order (T4: ordering is by the data's time
column, reference tabular.py:47-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_counts(events: DataFrame, width: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window; watermark bounds state for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("bucket_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """Session window: sessions close after ``gap`` inactivity per user —
    the streaming twin of the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def with_ingest_metrics(events: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach streaming-safe metrics (rows, ops histogram-ish counts) via
    the observe API — surfaced per micro-batch in StreamingQueryProgress
    (the engine-side replacement for the SaaS loader's progress reporting,
    reference README.md:7)."""
    # DISTINCT aggregates are disallowed in observed metrics — the HLL
    # sketch is the streaming-safe cardinality estimate
    return events.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct(F.col("user_id")).alias("users"),
        F.sum("value").alias("value_total"),
    )


def run_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Drive a (bounded) streaming DataFrame to a memory sink and drain it —
    the local test harness for streaming ops; results land in the temp view
    ``query_name``."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
