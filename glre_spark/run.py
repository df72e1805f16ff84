"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage:
    zip -r glre_spark.zip glre_spark
    spark-submit --py-files glre_spark.zip -m glre_spark.run ...  # or:
    spark-submit --py-files glre_spark.zip glre_spark/run.py \
        --n-docs 5000 --out /tmp/glre_out [--groups 8]

Runs the flagship pipeline with checkpointed lineage; resume is implicit —
re-running with the same --out picks up the manifest and processes only
the missing bucket groups (exact resume; no flag needed).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from glre_spark.datagen import pages_df
    from glre_spark.lineage import read_manifest, read_triples, run_with_checkpoints
    from glre_spark.session import get_spark

    import os

    from glre_spark.io import entity_table, sink_entities

    spark = get_spark("glre_spark_run", cores=args.cores)
    t0 = time.time()
    pages = pages_df(spark, args.n_docs, seed=args.seed)
    run_id = run_with_checkpoints(spark, pages, args.out, n_groups=args.groups)
    triples = read_triples(spark, args.out)
    sink_entities(spark, entity_table(triples), os.path.join(args.out, "entities"))
    n = triples.count()
    wall = time.time() - t0
    manifest = read_manifest(spark, args.out)
    print(
        json.dumps(
            {
                "run_id": run_id,
                "n_docs": args.n_docs,
                "triples": n,
                "wall_s": round(wall, 2),
                "triples_per_sec": round(n / wall, 2),
                "groups_done": manifest.filter("status='done'").count(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
