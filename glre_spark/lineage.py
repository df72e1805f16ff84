"""Checkpointed lineage / metrics / exact resume (SURVEY.md §2.9, §4.3).

The north rule requires: per-partition lineage + metrics tables enabling
exact resume. Mechanism (works on plain parquet; Iceberg-ready layout):

- work is keyed by deterministic url-hash *buckets* (pipeline.url_bucket),
  decoupled from task parallelism — bucket ids are stable across cluster
  sizes, so a run at N executors can be resumed at 4N;
- each completed bucket-group writes its triples under
  ``triples/bucket_group=<g>/`` (idempotent dynamic-partition overwrite)
  and THEN appends a manifest row — manifest-last commit order means a
  crash can only lose uncommitted work, never record phantom work;
- on restart, ``pending_groups`` left-anti joins the manifest and only
  missing groups are recomputed (resume_filter op).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "run_id string, bucket_group int, status string, input_rows long, "
    "triples long, wall_ms long, committed_at timestamp"
)


def manifest_path(base: str) -> str:
    return os.path.join(base, "_manifest")


def read_manifest(spark: SparkSession, base: str) -> DataFrame:
    path = manifest_path(base)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def append_manifest_row(
    spark: SparkSession,
    base: str,
    run_id: str,
    bucket_group: int,
    input_rows: int,
    triples: int,
    wall_ms: int,
) -> None:
    row = [(run_id, bucket_group, "done", input_rows, triples, wall_ms)]
    df = spark.createDataFrame(
        row,
        "run_id string, bucket_group int, status string, input_rows long, "
        "triples long, wall_ms long",
    ).withColumn("committed_at", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(manifest_path(base))


def pending_groups(spark: SparkSession, base: str, n_groups: int) -> list[int]:
    all_groups = spark.range(n_groups).select(F.col("id").cast("int").alias("bucket_group"))
    done = read_manifest(spark, base).filter("status = 'done'").select("bucket_group")
    rows = all_groups.join(done, "bucket_group", "left_anti").collect()
    return sorted(r.bucket_group for r in rows)


def run_with_checkpoints(
    spark: SparkSession,
    pages: DataFrame,
    base: str,
    n_groups: int = 8,
    run_id: str | None = None,
    fail_after: int | None = None,
) -> str:
    """Process the corpus group-by-group with manifest-last commits.
    ``fail_after`` aborts after K groups (crash-injection for tests).
    Returns the run_id. Re-invoking with the same ``base`` resumes."""
    from glre_spark.pipeline import build_triples, url_bucket

    run_id = run_id or uuid.uuid4().hex[:12]
    pages_g = pages.withColumn(
        "bucket_group", F.pmod(url_bucket(F.col("url")), F.lit(n_groups)).cast("int")
    )
    todo = pending_groups(spark, base, n_groups)
    for i, g in enumerate(todo):
        if fail_after is not None and i >= fail_after:
            raise RuntimeError(f"injected failure before group {g}")
        t0 = time.time()
        part = pages_g.filter(F.col("bucket_group") == g).drop("bucket_group")
        n_in = part.count()
        triples = build_triples(spark, part)
        # partition dir name carries bucket_group; keeping it as a data
        # column too would clash on read-back with basePath
        (
            triples.write.mode("overwrite")
            .parquet(os.path.join(base, "triples", f"bucket_group={g}"))
        )
        n_out = spark.read.parquet(
            os.path.join(base, "triples", f"bucket_group={g}")
        ).count()
        append_manifest_row(
            spark, base, run_id, g, n_in, n_out, int((time.time() - t0) * 1000)
        )
    return run_id


def read_triples(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(base, "triples")).parquet(
        os.path.join(base, "triples", "bucket_group=*")
    )
