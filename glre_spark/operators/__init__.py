"""Operator registry backing ``__spark_entry__.queries()`` /
``oracle_sql()`` (driver contract; SURVEY.md §2).

Each operator registers a (spark, sf_dir) → DataFrame callable plus an
equivalent DuckDB SQL string (or None for non-SQL-expressible ops, which
the driver checks rows-only). Conventions (SURVEY.md §3.3):

- alias every computed column identically on both sides;
- cast away engine-specific widths (DuckDB SUM(BIGINT) → HUGEINT, Spark
  row_number → int, …);
- round floating aggregates (2-4 dp) so both engines land on the same
  double bit pattern for the driver's value-hash;
- deterministic tie-breaks everywhere a LIMIT/top-k can tie.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def op(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def fround(col, d: int = 4):
    """Engine-stable rounding: +1e-9 nudges half-way values off the
    boundary (Spark rounds HALF_UP on the decimal string, DuckDB on the
    binary double — they disagree exactly at .5), +0.0 normalizes -0.0.
    Oracle twin: ``ROUND(x + 1e-9, d) + 0``."""
    from pyspark.sql import functions as F

    return F.round(col + F.lit(1e-9), d) + F.lit(0.0)


def cents(col, scale: int = 100):
    """Fixed-point lift: money/metric doubles → exact BIGINT (order-
    independent sums — float SUM order differs across engines/partitions).
    Oracle twin: ``CAST(ROUND(x * scale) AS BIGINT)``."""
    from pyspark.sql import functions as F

    return F.round(col * scale, 0).cast("bigint")


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: v[0] for k, v in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


_LOADED = False

# Driver-window priority. The driver's CORRECTNESS snapshot takes the first
# 50 ``queries()`` entries in registry order. Round-4 rotation (VERDICT r3
# next-round #5): ops whose code changed in r4 register FIRST so the driver
# re-proves them (UDF-surface rewrites + new simhash twin; the flagship /
# lineage / dedup-family paths touched by the streaming-exactness and
# cache-fingerprint changes); then the ops whose only driver evidence is r1
# (oldest); then the r2-proven relational families. The r3-proven windows /
# scalar-fn / text_* / ann / mm families (unchanged since their green rows)
# slide to the tail. Names absent from this list keep their module-import
# order after it.
_PRIORITY: list[str] = [
    # -- new in r4 --
    "split_holdout",           # deterministic hash-based corpus splits
    "dedup_keeper_table",      # end-to-end dedup decision (pairs→CC→keeper)
    # -- changed in r4: re-prove (16) --
    "udf_scalar_pandas",       # rewritten with DuckDB twin (r4)
    "udf_iter_pandas",         # rewritten with DuckDB twin (r4)
    "simhash_dedup",           # DuckDB twin added (r4)
    "glre_infer_triples",      # pipeline group plumbing + eligible_pages refactor
    "glre_extract_text",
    "glre_cluster_entities",
    "glre_entity_table",
    "lsh_candidates",          # capped_bands cache key change
    "dedup_ngram_jaccard",
    "udf_grouped_map",
    "sink_triples",            # lineage obs.get hardening
    "sink_entities",
    "sink_metrics",
    "ckpt_manifest",
    "stateful_user_totals",    # streaming module touched
    "dedup_exact",
    # -- oldest driver evidence (r1 only) (7) --
    "limit_topn",
    "str_normalize",
    "str_split_tokens",
    "str_shingle",
    "str_concat_fmt",
    "hash_fns",
    "sample_frac",
    # -- r2-proven relational families (fill the window) --
    "scan_parquet",
    "scan_pages",
    "project_select",
    "filter_lang",
    "filter_pred",
    "filter_len",
    "join_inner_eq",
    "join_broadcast",
    "join_salted_skew",
    "join_left_semi",
    "join_left_anti",
    "join_outer",
    "join_theta_range",
    "join_asof",
    "join_self_block",
    "join_cross_small",
    "agg_groupby",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_collect_list",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_distinct_rows",
    "sort_global",
    "set_union",
    "set_intersect",
    "set_except",
    # -- tail: r3-proven, unchanged since their green rows --
    "resume_filter",
    "repartition_urlhash",
    "minhash_sig",
    "lsh_band",
    "cc_label_prop",
    "canonicalize",
    "dedup_triples",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "win_rownum_topk",
    "win_rank_dense",
    "win_lag_lead",
    "win_frame_agg",
    "win_ntile_pct",
    "win_tumbling",
    "win_sliding",
    "win_session",
    "date_fns",
    "math_fns",
    "arr_explode",
    "arr_fns",
    "map_fns",
    "json_fns",
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "udf_grouped_agg",
    "udtf_sent_split",
    "sort_within_part",
    "scan_docred_json",
    "mm_image_meta",
    "mm_image_ahash",
    "mm_frame_sample",
    "mm_audio_features",
]


def _ensure_loaded() -> None:
    global _LOADED
    if not _LOADED:
        # import for registration side effects
        from glre_spark.operators import (  # noqa: F401
            aggs,
            joins,
            kgops,
            mm_ops,
            scans,
            sets_sorts,
            sinks_ops,
            streaming_ops,
            textops,
            udfops,
            windows_ops,
        )

        ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
        ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _LOADED = True
