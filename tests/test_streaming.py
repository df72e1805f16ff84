"""Batch/stream parity for the event window ops (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glre_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    tumbling_counts,
)
from tests.conftest import SF_DIR


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    # file stream source needs a directory; stage the single parquet file
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-000.parquet")
    path = str(src_dir)
    stream = read_events_stream(spark, path)
    assert stream.isStreaming
    run_stream_to_memory(tumbling_counts(stream), "tumbling_mem")
    got = {
        (r.w_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM tumbling_mem").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    want = {(r.w_start, r.event_type): r.n for r in batch.collect()}
    assert got == want
