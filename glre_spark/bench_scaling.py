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
    frequencies, corpus document frequencies, top-3 docs per token via a
    partitioned window, joined back. Separates the ENGINE's scaling from
    the memory-bandwidth-bound numpy inference kernel (VERDICT r01).

    r5 (VERDICT r4 top_next): the TF stage's (url, tok) key is ~97%
    distinct, so the partial agg is a no-op and the old job exchanged
    149 MB of variable-length (url, token) STRING pairs. This version
    exchanges fixed-width (xxhash64(url), xxhash64(tok)) longs instead:
    every aggregation, the window and the TF⋈DF join run on longs. Token
    ids stay hashed in the output (the verdict's "keep hashed tokens if
    the consumer allows" — a consumer keeps the token dictionary; a
    first r5 variant re-attached strings via a min(tok) vocab agg and
    its token re-explode pass alone cost 2× the TF stage's CPU, see
    BENCH/BASELINE.md history). The url strings ARE re-attached — the
    top-3 result is what a consumer reads — via a dictionary filtered by
    broadcast semi-join to exactly the urls the result references (≤
    vocab×3 rows): a scan-side filter, never a corpus-wide string agg.
    The window tie-break is asc(urlh) rather than asc(url) — a different
    but equally deterministic total order. relational_str keeps the old
    string-exchange shape verbatim as the A/B control."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hashed = pages.select(
        F.xxhash64("url").alias("urlh"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).select("urlh", F.xxhash64("tok").alias("tokh"))
    tf = hashed.groupBy("urlh", "tokh").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tokh").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("tokh").orderBy(F.desc("tf"), F.asc("urlh"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter("rn <= 3")
    res = top.join(df, "tokh")
    need = res.select("urlh").distinct()
    urls = (
        pages.select(F.xxhash64("url").alias("urlh"), "url")
        .join(F.broadcast(need), "urlh")
        .distinct()
    )
    return res.join(F.broadcast(urls), "urlh").drop("urlh")


def relational_str_job(pages):
    """The pre-r5 relational job (string-keyed TF exchange), kept verbatim
    as the A/B control for the xxhash64-slimming measurement."""
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


def domain_skew(cores: int, n_rows: int) -> dict:
    """Skew probe for the domain_stats aggregation shape (SURVEY §2.13):
    the identical per-row payload aggregated by a uniform key (5000
    domains) vs a 90%-hot key. The claim under test: partial (map-side)
    aggregation collapses the hot domain to ONE combiner row per map
    partition BEFORE the exchange, so the skewed case shuffles FEWER
    records than the uniform case and shows no straggler-reducer wall.
    Runs interleaved U,S,U,S in one JVM after a warmup of both shapes;
    min per mode."""
    from pyspark.sql import functions as F

    from glre_spark.session import get_spark

    spark = get_spark(
        "glre_domain_skew", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.ui.enabled": "true"},
    )

    def build(mode: str):
        df = spark.range(0, n_rows, numPartitions=INPUT_SPLITS)
        dom = F.col("id") % 5000
        if mode == "skew":
            dom = F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(dom)
        d = df.select(
            dom.cast("long").alias("domain"),
            (F.col("id") % 700 + 10).alias("nt"),
            (F.col("id") % 4000 + 50).alias("nc"),
        )
        agg = d.groupBy("domain").agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("nc").alias("n_chars"),
        )
        # force EVERY aggregate: a bare count() of a grouped agg lets
        # Catalyst prune the sum columns (group count is sum-free)
        return agg.agg(
            F.count("*").alias("groups"), F.sum("n_chars").alias("chk")
        )

    for m in ("uniform", "skew"):
        build(m).collect()
    out: dict = {}
    for m in ("uniform", "skew", "uniform", "skew"):
        before = max((s["stage_id"] for s in _completed_stages(spark)), default=-1)
        t0 = time.time()
        row = build(m).collect()[0]
        w = time.time() - t0
        st = [s for s in _completed_stages(spark) if s["stage_id"] > before]
        wrote = max((s["shuf_write_recs"] for s in st), default=0)
        rec = out.setdefault(m, {"walls": [], "_recs": [], "groups": int(row["groups"])})
        rec["walls"].append(round(w, 2))
        rec["_recs"].append(wrote)
    for r in out.values():
        # report the combiner-row count FROM THE MIN-WALL RUN so the row
        # is self-consistent (ADVICE r6: it used to quote the last run's
        # recs against the min run's wall)
        i = r["walls"].index(min(r["walls"]))
        r["wall_s"] = r["walls"][i]
        r["shuf_write_recs"] = r.pop("_recs")[i]
    return {"n_rows": n_rows, "cores": cores, **out}


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
                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
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

    conf = {"spark.ui.enabled": "true"} if stage_dump else {}
    if job == "flagship":
        # The flagship's dominant stage is the Arrow inference — cost is
        # CPU per DOC, not bytes. AQE's byte-based coalescing shrinks its
        # input exchange to ≈cores giant tasks (measured r6: 19 tasks on
        # 16 cores → two waves, the second 3 tasks wide → 21 s where
        # perfect packing gives ~14 s; at 4 cores it coalesced to exactly
        # 4 tasks, so only the WIDE level paid — a structural scaling
        # penalty, not noise). Keep the static 64 fine-grained partitions
        # (4-16× cores at both levels): waves stay balanced and the
        # byte-tiny downstream aggs cost only ms-scale task overhead. On
        # a real cluster the same rule applies to any Python-heavy stage:
        # target tasks-per-core ≥ 2, never bytes.
        conf["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    spark = get_spark(
        f"glre_scaling_{cores}", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf=conf or None,
    )
    if job == "relational":
        run = lambda p: relational_job(p).count()  # noqa: E731
    elif job == "relational_str":
        run = lambda p: relational_str_job(p).count()  # noqa: E731
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


def dup_bench(cores: int, n_docs: int) -> dict:
    """A/B the flagship on a DUPLICATE-HEAVY corpus (every second doc also
    appears as a byte-identical mirror under a different url): baseline
    vs drop_near_dups=True, where the keeper decision (MinHash/LSH →
    Jaccard → CC → min-id keeper) drops the mirrors BEFORE the inference
    stage. The claim measured: dedup spend below the Python stage buys
    back more inference wall than it costs (VERDICT r4 #3)."""
    from pyspark.sql import functions as F

    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.session import get_spark

    spark = get_spark("glre_dup_bench", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS)
    base = pages_df(spark, n_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE)
    mirrors = base.filter(F.xxhash64("url") % 2 == 0).withColumn(
        "url", F.concat(F.col("url"), F.lit("?mirror"))
    )
    corpus_path = "/dev/shm/glre_dup_bench_pages"
    base.unionByName(mirrors).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_corpus = corpus.count()

    out = {"cores": cores, "n_docs": n_docs, "n_corpus_docs": n_corpus}
    for label, flag in (("baseline", False), ("drop_near_dups", True)):
        build_triples(spark, corpus.limit(2000), drop_near_dups=flag).count()  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            n_triples = build_triples(spark, corpus, drop_near_dups=flag).count()
            walls.append(round(time.time() - t0, 2))
        out[label] = {
            "wall_s": min(walls), "walls_all": walls, "triples": n_triples
        }
    spark.stop()
    return out


def memory_headroom(cores: int, n_docs: int) -> dict:
    """The in-sandbox proxy for the 100×-scale memory question (VERDICT
    r4 #7): run the flagship at ``n_docs`` on local[cores], record peak
    executor memory (REST executor metrics), total shuffle spill (stage
    metrics), and the multiset of physical-plan operators — the caller
    compares the op multiset across doc scales to show the AQE plan shape
    is stable while memory stays bounded."""
    import collections
    import json as _json
    import re
    import urllib.request

    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.session import get_spark

    spark = get_spark(
        f"glre_memhead_{cores}_{n_docs}", cores=cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    pages_df(spark, n_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE).write.mode(
        "overwrite"
    ).parquet("/dev/shm/glre_memhead_pages")
    pages = spark.read.parquet("/dev/shm/glre_memhead_pages")
    df = build_triples(spark, pages)
    t0 = time.time()
    n_triples = df.count()
    wall = time.time() - t0
    # final ADAPTIVE plan operators (AQE has re-planned by now)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    ops = collections.Counter(
        m.group(1)
        for m in re.finditer(r"^[\s+\-:*]*([A-Za-z]+)", plan, re.M)
        if m.group(1) not in ("AdaptiveSparkPlan",)
    )
    stages = _completed_stages(spark)
    url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{url}/api/v1/applications/{app_id}/executors") as r:
        execs = _json.load(r)
    peak = {}
    for e in execs:
        for k, v in (e.get("peakMemoryMetrics") or {}).items():
            peak[k] = max(peak.get(k, 0), v)
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "triples": n_triples,
        "wall_s": round(wall, 2),
        "spill_mem_mb": round(sum(s["spill_mem_mb"] for s in stages), 1),
        "spill_disk_mb": round(sum(s["spill_disk_mb"] for s in stages), 1),
        "peak_heap_mb": round(peak.get("JVMHeapMemory", 0) / 1e6),
        "peak_offheap_mb": round(
            (peak.get("JVMOffHeapMemory", 0) + peak.get("OffHeapExecutionMemory", 0))
            / 1e6
        ),
        "peak_exec_mem_mb": round(
            (peak.get("OnHeapExecutionMemory", 0)
             + peak.get("OffHeapExecutionMemory", 0)) / 1e6
        ),
        "peak_python_mb": round(peak.get("ProcessTreePythonRSSMemory", 0) / 1e6),
        "plan_ops": dict(sorted(ops.items())),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--n-docs", type=int, default=25_000)
    ap.add_argument("--pages", help="path of the materialized pages parquet")
    ap.add_argument("--materialize", help="write the pages corpus here and exit")
    ap.add_argument(
        "--job", default="flagship",
        choices=["flagship", "relational", "relational_str", "sigscan"],
    )
    ap.add_argument("--stages", action="store_true", help="per-stage metric dump")
    ap.add_argument("--dup-bench", action="store_true",
                    help="duplicate-heavy corpus A/B of drop_near_dups")
    ap.add_argument("--domain-skew", action="store_true",
                    help="uniform-vs-hot-key probe of the domain_stats agg")
    ap.add_argument("--memory-headroom", action="store_true",
                    help="peak-memory/spill/plan-shape probe of the flagship")
    args = ap.parse_args(argv)
    if args.domain_skew:
        print(json.dumps(domain_skew(args.cores or 16, args.n_docs)))
        return 0
    if args.dup_bench:
        print(json.dumps(dup_bench(args.cores or 16, args.n_docs)))
        return 0
    if args.memory_headroom:
        print(json.dumps(memory_headroom(args.cores or 16, args.n_docs)))
        return 0
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
