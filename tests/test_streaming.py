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


def test_stateful_operator_accumulates_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches (the
    source is split into many files, maxFilesPerTrigger=4 → several
    triggers), and the final running totals must equal the batch agg."""
    from glre_spark.streaming import stateful_user_totals

    src_dir = str(tmp_path / "events_many")
    batch_src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch_src.repartition(12).write.parquet(src_dir)  # ≥3 micro-batches

    stream = read_events_stream(spark, src_dir)
    run_stream_to_memory(stateful_user_totals(stream), "stateful_mem", mode="update")
    updates = spark.sql("SELECT * FROM stateful_mem")
    # several updates per user (state crossed batches), final = max
    final = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in updates.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    }
    assert updates.count() > len(final), "state never crossed a micro-batch"
    want = {
        r.user_id: (r.n, round(r.s, 6))
        for r in batch_src.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == want


def test_streaming_kg_build_equals_batch(spark, tmp_path):
    """Incremental KG construction: pages streamed in micro-batches
    through the SAME pipeline, appended, then re-deduped must equal the
    one-shot batch run EXACTLY (associative re-aggregation)."""
    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.streaming import (
        read_pages_stream,
        read_stream_triples,
        stream_build_triples,
    )

    src = str(tmp_path / "pages_src")
    target = str(tmp_path / "stream_triples")
    pages = pages_df(spark, 120, partitions=8)  # 8 files / 4 per trigger → 2+ batches
    pages.write.parquet(src)

    stream_build_triples(read_pages_stream(spark, src), target)

    got = {
        (r.subj, r.pred, r.obj, r.score, r.url, r.n_sources)
        for r in read_stream_triples(spark, target).collect()
    }
    want = {
        (r.subj, r.pred, r.obj, r.score, r.url, r.n_sources)
        for r in build_triples(spark, spark.read.parquet(src)).collect()
    }
    assert got == want and len(got) > 0
