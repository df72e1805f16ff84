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


def run_level(cores: int, n_docs: int, pages_path: str, warmup_docs: int = 2000) -> dict:
    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.session import get_spark

    spark = get_spark(
        f"glre_scaling_{cores}", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS
    )
    # warmup: same plan shape (generated corpus), small
    build_triples(
        spark,
        pages_df(spark, warmup_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE),
    ).count()
    pages = spark.read.parquet(pages_path)
    build_triples(spark, pages.limit(1000)).count()  # warm the scan path too

    # 4 runs, discard the first (still warming), take min of the rest:
    # the sandbox VM shares its host (±20% noise on identical warm runs);
    # min is the least-contended estimate.
    walls = []
    n_triples = 0
    for _ in range(4):
        t0 = time.time()
        n_triples = build_triples(spark, pages).count()
        walls.append(time.time() - t0)
    wall = min(walls[1:])
    return {
        "cores": cores,
        "n_docs": n_docs,
        "triples": n_triples,
        "wall_s": round(wall, 2),
        "walls_all": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--n-docs", type=int, default=25_000)
    ap.add_argument("--pages", help="path of the materialized pages parquet")
    ap.add_argument("--materialize", help="write the pages corpus here and exit")
    args = ap.parse_args(argv)
    if args.materialize:
        materialize(args.materialize, args.n_docs)
        print(json.dumps({"materialized": args.materialize, "n_docs": args.n_docs}))
        return 0
    print(json.dumps(run_level(args.cores, args.n_docs, args.pages)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
