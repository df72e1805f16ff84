"""Benchmark harness (driver contract + SURVEY.md M6).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Headline set: the flagship GLRE KG pipeline (pages synthesized 1:1 from the
documents doc_ids — inference, linking, dedup) plus the heaviest relational
operators over the driver testdata. Every timing is action-to-completion
(count()), first a warmup query to amortize JVM/Arrow startup.
"""

from __future__ import annotations

import json
import os
import re
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from glre_spark.operators import REGISTRY, _ensure_loaded
    from glre_spark.session import get_spark

    _ensure_loaded()
    # AQE byte-based coalescing OFF, as in the scaling bench (rev 3): at
    # bench scale the inference exchange is ~1.4 MB of compressed html —
    # under the 1 MB min partition size — so AQE collapsed the flagship's
    # entire Python stage to ONE task on a 32-core box (measured sf0.1:
    # 5.6 s serialized of an 8.5 s warm wall; ~3.3 s with 32 tasks).
    # Bytes mis-model CPU-per-doc stages; keep the static partition count.
    spark = get_spark(
        "glre_bench", cores=cores, shuffle_partitions=max(cores, 16),
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )

    # warmup: JVM + Arrow + Python workers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    headline = [
        "glre_infer_triples",   # the flagship KG pipeline end-to-end
        "glre_extract_text",    # extraction invariant at scale
        "agg_groupby",
        "join_broadcast",
        "join_salted_skew",
        "win_rownum_topk",
        "win_session",
        "minhash_sig",
        "lsh_candidates",
        "dedup_ngram_jaccard",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "text_fingerprint",
        "simhash_dedup",
        "cc_label_prop",
        "mm_image_ahash",
        "kg_pagerank",          # graph analytics over the built KG (§2.14)
        "domain_stats",         # per-domain corpus accounting (r6)
        "q3_shipping_priority", # composed relational path (broadcast + top-k)
        "filter_gopher_rules",  # per-row quality gate (zero-shuffle map)
    ]
    # min of N runs per op: this sandbox VM bursts 3-10× slower under
    # hypervisor steal on identical warm runs; min is the least-contended
    # estimate (same protocol as bench_scaling).
    # min-of-3: this host's steal storms inflate single runs 3-30×
    # (measured: the same suite 24.2 s clean vs 63.4 s mid-storm)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    from glre_spark.operators.kgops import _BANDS_CACHE

    for name in headline:
        fn, _ = REGISTRY[name]
        best = None
        for _ in range(runs):
            if name == "lsh_candidates":
                # charge the shared band-table build to THIS op on every
                # run (dedup_ngram_jaccard then reuses it, as the real
                # pipeline would: signatures are written once per corpus)
                _BANDS_CACHE.clear()
            t0 = time.time()
            # noop sink, NOT count(): count() lets Catalyst prune every
            # computed column of a pure projection (e.g. the whole MinHash
            # signature) and the timing measures an empty scan. The noop
            # sink consumes every column of every row.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": cores,
            }
        )
    )


if __name__ == "__main__":
    main()
