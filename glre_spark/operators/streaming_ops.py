"""Streaming surface as a registered operator (SURVEY.md §2.10).

``stateful_user_totals`` drives the applyInPandasWithState operator from
glre_spark/streaming.py through a real bounded stream (file source split
into several micro-batches, trigger=availableNow) and returns the FINAL
per-user state — which is deterministic (running totals only ever grow by
whole micro-batches), so it gets a full DuckDB twin: the batch
count/sum-per-user aggregation. State is accumulated in integer cents
(exact, order-independent) per the repo's float-parity convention.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import functions as F

from glre_spark.operators import fround, load, op

_MEM_SEQ = itertools.count()


@op(
    "stateful_user_totals",
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 + 1e-9, 2) + 0
                AS sum_value
       FROM events GROUP BY user_id""",
)
def stateful_user_totals_op(spark, sf_dir):
    """Stage events into a 12-file dir (maxFilesPerTrigger=4 → ≥3
    micro-batches), run the arbitrary-stateful stream to a memory sink in
    update mode, then reduce the emitted updates to the final state per
    user (max_by on the strictly-increasing n_events). Equals the batch
    groupBy — the batch↔stream parity contract of §2.10."""
    from glre_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        stateful_user_totals,
    )

    src_dir = tempfile.mkdtemp(prefix="stateful_events_")
    name = f"stateful_totals_mem_{next(_MEM_SEQ)}"
    try:
        load(spark, sf_dir, "events").repartition(12).write.mode("overwrite").parquet(
            src_dir
        )
        updates = stateful_user_totals(
            read_events_stream(spark, src_dir), exact_cents=True
        )
        run_stream_to_memory(updates, name, mode="update")
        return (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max("n_events").cast("bigint").alias("n_events"),
                F.max_by("sum_cents", "n_events").alias("sum_cents"),
            )
            .select(
                "user_id",
                "n_events",
                fround(F.col("sum_cents") / 100.0, 2).alias("sum_value"),
            )
            .localCheckpoint(eager=True)  # detach from scratch files + memory sink
        )
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
