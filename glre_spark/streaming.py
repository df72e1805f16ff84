"""Structured Streaming wiring (SURVEY.md §2.10 — stretch surface).

The reference is a batch pipeline; these helpers re-run the identical
windowed aggregations from operators/windows_ops.py as streams (readStream
→ watermark → window agg → writeStream), proving the batch/stream parity
of the event ops. Used by tests/test_streaming.py with a file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-5-min event counts with late-data watermark — the streaming twin
    of win_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


def session_aggregate(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Per-user session windows (30-min gap) — streaming twin of
    win_session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def run_stream_to_memory(df: DataFrame, name: str, timeout_s: int = 60):
    """Drive a bounded file-source stream to completion into an in-memory
    table (test harness; production would writeStream to the lake)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
