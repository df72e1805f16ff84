"""Scaling-efficiency worker (north rule: throughput efficiency ≥0.8 from
N to 4N executors; sandbox protocol = local[4] vs local[16], SURVEY.md
§4.4 + hardware note in bench_scaling.py).

One invocation = one parallelism level in a fresh JVM. The measured job is
the flagship pipeline reading the materialized pages table (the north-rule
input is a TABLE — corpus synthesis is bench scaffolding and is excluded):
scan → filter → as-of dedup → fused extract+inference → linking → dedup →
count. A same-shape warmup job runs first so page-cache/JIT/Python-worker
startup is excluded from the measured window; the input file set and
shuffle partitioning (64) are identical at both levels so only parallelism
varies.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

INPUT_SPLITS = 64
SHUFFLE_PARTITIONS = 64
SENT_RANGE = (12, 28)  # webpage-length docs: compute-representative load
                       # (real GLRE runs a BERT encoder; short toy docs
                       # would measure Spark fixed overhead, not scaling)


def materialize(path: str, n_docs: int) -> None:
    """Write the bench corpus once (64 parquet files on tmpfs)."""
    from glre_spark.datagen import pages_df
    from glre_spark.session import get_spark

    spark = get_spark("glre_scaling_gen", cores=16, shuffle_partitions=SHUFFLE_PARTITIONS)
    pages_df(spark, n_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def sigscan_job(pages):
    """ALU-dense scan job (zero Python, negligible shuffle): the real LSH
    signature stage — char-3-shingle every doc, one md5 per shingle + 8
    integer permutations, per-doc array_min, global agg to ONE row. This
    is the engine's embarrassingly-parallel path: its N→4N efficiency
    tracks the HARDWARE's pure-CPU ceiling (burn test) because there is no
    shuffle or memory-bus-heavy exchange to degrade."""
    from pyspark.sql import functions as F

    from glre_spark.operators.kgops import _perm_hash, _shingle_hash_col

    # two-step select: the shingle-hash array is ALIASED once and the 8
    # permutations reference the alias — inlining _shingle_hash_col into
    # each min would run the md5 pass 8× (Catalyst refuses to collapse
    # projections when that duplicates expensive expressions; writing the
    # duplication by hand defeats that guard)
    hs = pages.select(_shingle_hash_col(F.col("text")).alias("hs"))
    sig = hs.select(
        *[
            F.array_min(F.transform(F.col("hs"), _perm_hash(i))).alias(f"mh{i}")
            for i in range(8)
        ]
    )
    return sig.agg(
        *[F.sum(F.col(f"mh{i}")).alias(f"s{i}") for i in range(8)],
        F.count("*").alias("n"),
    )


def relational_job(pages):
    """Scan/shuffle-bound relational job (zero Python stages): per-doc term
    frequencies (high-cardinality shuffle on (url, tok)), corpus document
    frequencies (second shuffle), top-3 docs per token via a partitioned
    window, joined back. Separates the ENGINE's scaling from the
    memory-bandwidth-bound numpy inference kernel (VERDICT r01)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = pages.select("url", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("url", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("url"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter("rn <= 3")
    return top.join(df, "tok")


def _completed_stages(spark) -> list[dict]:
    """Per-stage metrics from the UI REST API (spark.ui.enabled required).
    runTime is summed task time (ms); cpuTime is on-CPU ns→ms — their gap
    is scheduler wait + I/O + GIL/Arrow stalls, the scaling suspects."""
    import json as _json
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{url}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    ) as r:
        stages = _json.load(r)
    out = []
    for s in stages:
        out.append(
            {
                "stage_id": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "tasks": s["numCompleteTasks"],
                "run_ms": s["executorRunTime"],
                "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
                "gc_ms": s.get("jvmGcTime", 0),
                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "shuf_read_recs": s.get("shuffleReadRecords", 0),
                "shuf_write_recs": s.get("shuffleWriteRecords", 0),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            }
        )
    return out


def run_level(
    cores: int, n_docs: int, pages_path: str, warmup_docs: int = 2000,
    job: str = "flagship", stage_dump: bool = False,
) -> dict:
    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.session import get_spark

    spark = get_spark(
        f"glre_scaling_{cores}", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.ui.enabled": "true"} if stage_dump else None,
    )
    if job == "relational":
        run = lambda p: relational_job(p).count()  # noqa: E731
    elif job == "sigscan":
        # collect(), NOT count(): count() of an ungrouped aggregate lets
        # Catalyst prune every aggregate expression (the row count of an
        # Aggregate is known to be 1) and times an empty scan
        run = lambda p: int(sigscan_job(p).collect()[0]["n"])  # noqa: E731
    else:
        run = lambda p: build_triples(spark, p).count()  # noqa: E731
    # warmup: same plan shape (generated corpus), small
    run(pages_df(spark, warmup_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE))
    pages = spark.read.parquet(pages_path)
    run(pages.limit(1000))  # warm the scan path too

    # 4 runs, discard the first (still warming: whole-stage codegen JIT
    # compiles on the first full-size pass), take min of the rest: the
    # sandbox VM shares its host (hypervisor steal bursts of 3-10× on
    # identical warm runs, measured); min is the least-contended estimate.
    # The TOP-LEVEL driver additionally interleaves N/4N sessions so
    # minute-scale contention hits both levels alike.
    walls = []
    n_out = 0
    for _ in range(4):
        t0 = time.time()
        n_out = run(pages)
        walls.append(time.time() - t0)
    wall = min(walls[1:])
    stages = None
    if stage_dump:
        # one extra instrumented run; keep only ITS stages (id > watermark)
        before = max((s["stage_id"] for s in _completed_stages(spark)), default=-1)
        t0 = time.time()
        run(pages)
        dump_wall = time.time() - t0
        stages = [s for s in _completed_stages(spark) if s["stage_id"] > before]
        stages.sort(key=lambda s: s["stage_id"])
        stages.append({"name": "TOTAL_dump_run", "wall_s": round(dump_wall, 2)})
    return {
        **({"stages": stages} if stages else {}),
        "cores": cores,
        "n_docs": n_docs,
        "job": job,
        "triples": n_out,  # flagship: triples; relational: result rows
        "wall_s": round(wall, 2),
        "walls_all": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_out / wall, 1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--n-docs", type=int, default=25_000)
    ap.add_argument("--pages", help="path of the materialized pages parquet")
    ap.add_argument("--materialize", help="write the pages corpus here and exit")
    ap.add_argument(
        "--job", default="flagship", choices=["flagship", "relational", "sigscan"]
    )
    ap.add_argument("--stages", action="store_true", help="per-stage metric dump")
    args = ap.parse_args(argv)
    if args.materialize:
        materialize(args.materialize, args.n_docs)
        print(json.dumps({"materialized": args.materialize, "n_docs": args.n_docs}))
        return 0
    print(
        json.dumps(
            run_level(
                args.cores, args.n_docs, args.pages, job=args.job,
                stage_dump=args.stages,
            )
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
