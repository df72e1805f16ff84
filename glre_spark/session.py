"""SparkSession factory.

One place for every config knob so tests, bench.py, the driver's
``__spark_entry__`` hooks, and ``spark-submit --py-files`` runs all get the
same Arrow/AQE/shuffle settings (SURVEY.md §4.2-4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Docs are fat rows (html binary + full text): keep Arrow batches small so
# the mapInPandas inference stage stays allocation-bounded (SURVEY.md §4.3).
ARROW_MAX_RECORDS_PER_BATCH = 256


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "glre_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cores=None`` → honor a spark-submit-provided ``--master`` if one
    exists (builder.master would silently OVERRIDE it — measured: two
    spark-submit runs at local[4] and local[16] both actually ran
    local[32] before this guard), else ``local[$SPARK_GRAFT_CPUS or
    nproc]``. An explicit ``cores=`` always wins (tests and the bench
    protocol pin their own level).
    """
    # Under spark-submit the driver JVM (PythonRunner) already holds the
    # --master conf and exposes its gateway via PYSPARK_GATEWAY_PORT; a
    # fresh SparkConf() here CANNOT see it (it lives in the launcher's
    # SparkConf, not in system properties), so the only correct move is
    # to not call .master() at all and size shuffle partitions AFTER the
    # session exists, from sc.defaultParallelism.
    submitted = cores is None and bool(os.environ.get("PYSPARK_GATEWAY_PORT"))
    cores = cores or default_parallelism()
    shuffle_after = submitted and shuffle_partitions is None
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # One BLAS thread per Python worker: N workers × multi-threaded
    # OpenBLAS/MKL oversubscribes the box quadratically and *anti*-scales
    # (measured 2.3× slower at local[32] than local[8] before this).
    # Python workers inherit the env the JVM was launched with → set both.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # Shuffle spill dir on tmpfs: local-mode shuffles write
        # tasks×partitions small files; on this VM's slow disk that
        # serializes high-parallelism runs (measured 32-core slower than
        # 8-core before this). Harmless on a real cluster (override via
        # SPARK_GRAFT_LOCAL_DIR or spark-submit conf).
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
    )
    if not submitted:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if shuffle_after:
        # size the shuffle to the ACTUAL submitted cluster width
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark
