"""Checkpointed lineage / metrics / exact resume (SURVEY.md §2.9, §4.3).

The north rule requires: per-partition lineage + metrics tables enabling
exact resume. Mechanism (works on plain parquet; Iceberg-ready layout):

- work is keyed by deterministic url-hash *buckets* (pipeline.url_bucket),
  decoupled from task parallelism — bucket ids are stable across cluster
  sizes, so a run at N executors can be resumed at 4N;
- ONE job per (re)start processes every pending bucket-group: the pages
  source is scanned exactly once, triples are written with dynamic
  partition overwrite on ``bucket_group=`` (idempotent per group), and
  per-group input counts come from ``df.observe()`` on the same pass — no
  per-group filter/count re-scans;
- the manifest is appended AFTER the data lands — manifest-last commit
  order means a crash can only lose uncommitted work (whose partitions the
  resume overwrites idempotently), never record phantom work;
- on restart, ``pending_groups`` left-anti joins the manifest and only
  missing groups are recomputed (resume_filter op).

Dedup scope: triples are exact-deduped WITHIN a bucket group (the unit of
idempotent commit); the same (subj, pred, obj) observed in two groups is
two rows on disk. ``read_triples`` re-aggregates across groups by default
so consumers see the globally-deduped invariant.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

# batch_wall_ms is the wall clock of the WHOLE (re)start batch that
# committed the row (all groups share one job/pass), not a per-group time.
MANIFEST_SCHEMA = (
    "run_id string, bucket_group int, status string, input_rows long, "
    "triples long, batch_wall_ms long, committed_at timestamp"
)


def manifest_path(base: str) -> str:
    return os.path.join(base, "_manifest")


def read_manifest(spark: SparkSession, base: str) -> DataFrame:
    """Empty manifest ONLY for a missing path (first run). Any other read
    error (corrupt files, permissions) re-raises: silently reporting zero
    completed groups would trigger a full-corpus recompute at scale and
    mask manifest corruption."""
    from pyspark.errors import AnalysisException

    path = manifest_path(base)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except AnalysisException as e:
        # match the error CLASS when the API provides it (stable across
        # message rewording); fall back to the 3.x/4.x message tokens
        err_class = ""
        get_cls = getattr(e, "getErrorClass", None)
        if callable(get_cls):
            err_class = get_cls() or ""
        if "PATH_NOT_FOUND" in err_class or "PATH_NOT_FOUND" in str(e) or (
            "Path does not exist" in str(e)
        ):
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        raise


def append_manifest_rows(
    spark: SparkSession,
    base: str,
    rows: list[tuple[str, int, str, int, int, int]],
) -> None:
    df = spark.createDataFrame(
        rows,
        "run_id string, bucket_group int, status string, input_rows long, "
        "triples long, batch_wall_ms long",
    ).withColumn("committed_at", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(manifest_path(base))


def pending_groups(spark: SparkSession, base: str, n_groups: int) -> list[int]:
    all_groups = spark.range(n_groups).select(F.col("id").cast("int").alias("bucket_group"))
    done = read_manifest(spark, base).filter("status = 'done'").select("bucket_group")
    rows = all_groups.join(done, "bucket_group", "left_anti").collect()
    return sorted(r.bucket_group for r in rows)


def _process_groups(
    spark: SparkSession,
    pages_g: DataFrame,
    base: str,
    run_id: str,
    groups: list[int],
) -> None:
    """One Spark job over all ``groups``: filter → build_triples (group-
    scoped dedup, bucket_group carried through the Arrow stage) → dynamic-
    partition-overwrite write → manifest append. Per-group input counts
    ride an Observation on the same pass (no extra scan)."""
    from glre_spark.pipeline import build_triples

    if not groups:
        return
    t0 = time.time()
    part = pages_g.filter(F.col("bucket_group").isin([int(g) for g in groups]))
    obs = Observation(f"lineage_{run_id}")
    part = part.observe(
        obs,
        *[
            F.count(F.when(F.col("bucket_group") == g, True)).alias(f"g{g}")
            for g in groups
        ],
    )
    triples = build_triples(spark, part, group_col="bucket_group")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            triples.write.mode("overwrite")
            .partitionBy("bucket_group")
            .parquet(os.path.join(base, "triples"))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # No try/except here: Spark 4.1 delivers the observation even when the
    # input is all-empty (probed: a collapsed/empty plan still yields
    # {'g..': 0} — see tests/test_resume.py::test_obs_failure_propagates).
    # Swallowing errors would silently commit input_rows=0 to the manifest
    # on a genuine Py4J/runtime failure — the same silent-miscount shape
    # read_manifest guards against.
    in_rows = obs.get  # populated by the write action above
    # per-group output counts from the (small) written triples, one scan;
    # an all-filtered/empty corpus writes no partition dirs at all, so the
    # read-back may find an unreadable (schema-less) target → 0-triple groups
    from pyspark.errors import AnalysisException

    try:
        out_counts = {
            r.bucket_group: r.n
            for r in spark.read.parquet(os.path.join(base, "triples"))
            .filter(F.col("bucket_group").isin([int(g) for g in groups]))
            .groupBy("bucket_group")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    except AnalysisException:
        out_counts = {}
    batch_wall_ms = int((time.time() - t0) * 1000)
    append_manifest_rows(
        spark,
        base,
        [
            (
                run_id,
                int(g),
                "done",
                int(in_rows.get(f"g{g}", 0)),
                int(out_counts.get(g, 0)),
                batch_wall_ms,
            )
            for g in groups
        ],
    )


def _heal_torn_writes(base: str) -> list[str]:
    """Startup sweep for the crash window between the data write and the
    manifest append (manifest-last order): a job that died mid-write can
    leave committer staging dirs — ``_temporary`` inside the target, or
    ``.spark-staging-*`` siblings from dynamic partition overwrite —
    under ``triples``/``_manifest``. Readers already ignore
    underscore/dot-prefixed paths, so these are never a CORRECTNESS
    hazard (the uncommitted groups simply re-run); they are leaked disk
    that accumulates across crash/resume cycles and, at scale, slows
    file listing. Swept here because resume is the documented
    single-writer moment — nothing else may be appending. Returns the
    removed paths (logged by tests). Local-filesystem paths only; with a
    real Iceberg/Delta catalog the commit is transactional and orphan
    cleanup is the table service's job (VERDICT r5 next-round #7)."""
    import shutil

    removed: list[str] = []
    for target in (os.path.join(base, "triples"), manifest_path(base)):
        if not os.path.isdir(target):
            continue
        for name in os.listdir(target):
            if name == "_temporary" or name.startswith(".spark-staging"):
                full = os.path.join(target, name)
                try:
                    shutil.rmtree(full)
                except FileNotFoundError:
                    continue  # racing heal already removed it
                removed.append(full)
    return removed


def run_with_checkpoints(
    spark: SparkSession,
    pages: DataFrame,
    base: str,
    n_groups: int = 8,
    run_id: str | None = None,
    fail_after: int | None = None,
) -> str:
    """Process every pending bucket group in ONE pass over the pages source
    (manifest-last commit). ``fail_after`` commits only the first K pending
    groups, then raises (crash-injection for tests). Returns the run_id.
    Re-invoking with the same ``base`` resumes the missing groups."""
    from glre_spark.pipeline import url_bucket

    run_id = run_id or uuid.uuid4().hex[:12]
    _heal_torn_writes(base)
    pages_g = pages.withColumn(
        "bucket_group", F.pmod(url_bucket(F.col("url")), F.lit(n_groups)).cast("int")
    )
    todo = pending_groups(spark, base, n_groups)
    if fail_after is not None and fail_after < len(todo):
        _process_groups(spark, pages_g, base, run_id, todo[:fail_after])
        raise RuntimeError(f"injected failure before group {todo[fail_after]}")
    _process_groups(spark, pages_g, base, run_id, todo)
    return run_id


def read_triples(spark: SparkSession, base: str, dedup: bool = True) -> DataFrame:
    """Read the combined triple table. ``dedup=True`` (default) re-applies
    the exact (subj, pred, obj) dedup across bucket groups — group-scoped
    commits mean a triple witnessed in two groups is stored twice; the
    re-aggregation (max score, min url, sum n_sources) restores the global
    invariant build_triples guarantees."""
    from glre_spark.linking import dedup_triples

    df = spark.read.parquet(os.path.join(base, "triples"))
    if dedup:
        df = dedup_triples(df.drop("bucket_group"))
    return df
