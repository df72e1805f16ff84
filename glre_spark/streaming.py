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


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (SURVEY.md
    §2.10 / brief: "applyInPandasWithState for custom stateful
    operators"): running per-user totals carried in explicit group state
    across micro-batches — the arbitrary-stateful shape that windowed aggs
    can't express (e.g. a streaming resume manifest or per-url crawl
    state). Emits the updated running total once per (user, micro-batch)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        (user_id,) = key
        total, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            total += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((total, vsum))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [total], "sum_value": [vsum]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    df: DataFrame, name: str, timeout_s: int = 60, mode: str = "complete"
):
    """Drive a bounded file-source stream to completion into an in-memory
    table (test harness; production would writeStream to the lake).
    ``mode="update"`` for arbitrary-stateful queries (complete unsupported)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
