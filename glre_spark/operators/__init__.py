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


# Side-effect hooks run when the oracle SQL set is handed out: an oracle
# that reads a file the OP normally materializes (scan_docred_json's
# nested-JSON corpus) registers a prep here so the file exists even if the
# driver runs DuckDB before the Spark query.
_ORACLE_PREP: list[Callable[[], None]] = []


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    for prep in _ORACLE_PREP:
        prep()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


_LOADED = False

# Driver-window priority. The driver's CORRECTNESS snapshot takes the first
# 50 ``queries()`` entries in registry order. Round-5 rotation (VERDICT r4
# next-round #5): ops whose code changed in r5 register FIRST so the driver
# re-proves them (the net.py kernel rewrite behind every glre_* op, the
# kgops _sig_of/_bands_of refactor behind the whole minhash/LSH/dedup
# family, the pipeline drop_near_dups plumbing behind the sinks, the
# streaming module's write-ordering/heal changes) plus the two new
# streaming entries and the two newly-twinned ops; then the ops whose
# latest driver evidence is oldest (mm_*/set/link/resume, r2); then the
# r3-proven windows / scalar-fn / text_* / ann families. Everything
# r4-proven and untouched slides to the tail. Names absent from this list
# keep their module-import order after it.
_PRIORITY: list[str] = [
    # -- new in r5 --
    "text_pii_redact",         # PII scrub: inject→count→redact→md5 twin
    "decontaminate_ngrams",    # benchmark word-8-gram overlap flags
    "dedup_events_stream",     # streaming exact dedup, full twin
    "compact_stream_triples",  # stream log lifecycle (build→compact→read)
    "scan_docred_json",        # twin added (deterministic nested-JSON file)
    "mm_image_ahash",          # twin added (integer-exact block-mean hash)
    # -- changed in r5: re-prove (16) --
    "glre_infer_triples",      # net.py pair-stage rewrite (2.7× kernel)
    "glre_extract_text",
    "glre_cluster_entities",
    "glre_entity_table",
    "minhash_sig",             # kgops _sig_of/_bands_of refactor
    "lsh_band",
    "lsh_candidates",
    "dedup_ngram_jaccard",
    "dedup_keeper_table",
    "udf_grouped_map",         # shares the candidate CTE path
    "sink_triples",            # pipeline drop_near_dups plumbing
    "sink_entities",
    "sink_metrics",
    "ckpt_manifest",
    "stateful_user_totals",    # streaming module touched
    "simhash_dedup",           # neighbor of the refactored shingle helpers
    # -- oldest driver evidence (r2) (7) --
    "mm_image_meta",
    "mm_frame_sample",
    "mm_audio_features",
    "set_intersect",
    "set_except",
    "link_alias_broadcast",
    "resume_filter",
    # -- r3-proven families (fill the window to 50) --
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
    "sample_frac",
    "repartition_urlhash",
    # -- tail: r4-proven, unchanged since their green rows --
    "split_holdout",
    "udf_scalar_pandas",
    "udf_iter_pandas",
    "dedup_exact",
    "limit_topn",
    "str_normalize",
    "str_split_tokens",
    "str_shingle",
    "str_concat_fmt",
    "hash_fns",
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
