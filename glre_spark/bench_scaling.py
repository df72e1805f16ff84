"""Scaling-efficiency worker (north rule: throughput efficiency ≥0.8 from
N to 4N executors; sandbox protocol = local[8] vs local[32], SURVEY.md
§4.4).

One invocation = one parallelism level in a fresh JVM. The measured job is
the flagship pipeline (synthesize pages → extract → infer → link → dedup →
count). A same-shape warmup job runs first so page-cache/JIT/Python-worker
startup is excluded from the measured window; input splits (64) and
shuffle partitions (64) are identical at both levels so only parallelism
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


def run_level(cores: int, n_docs: int, warmup_docs: int = 2000) -> dict:
    from glre_spark.datagen import pages_df
    from glre_spark.pipeline import build_triples
    from glre_spark.session import get_spark

    spark = get_spark(
        f"glre_scaling_{cores}", cores=cores, shuffle_partitions=SHUFFLE_PARTITIONS
    )
    # warmup: same plan shape, small corpus
    build_triples(
        spark,
        pages_df(spark, warmup_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE),
    ).count()

    pages = pages_df(spark, n_docs, partitions=INPUT_SPLITS, sent_range=SENT_RANGE)
    # min of 3: the sandbox VM shares its host (measured ±20% run-to-run
    # noise on identical warm runs); min is the least-contended estimate.
    walls = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        n_triples = build_triples(spark, pages).count()
        walls.append(time.time() - t0)
    wall = min(walls)
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
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-docs", type=int, default=25_000)
    args = ap.parse_args(argv)
    print(json.dumps(run_level(args.cores, args.n_docs)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
