"""The flagship KG-construction pipeline (SURVEY.md §3.2).

scan_pages → filter_lang → as-of dedup (latest crawl per url) →
repartition on url-hash → extract_text (byte-identical invariant) →
mapInPandas GLRE inference → entity linking (broadcast/salted alias join)
→ triple assembly → exact dedup.

Everything before/after the single Arrow UDF stage is declarative
DataFrame code: Catalyst prunes the html column whenever extraction is
skipped, pushes the lang filter to the scan, and AQE handles skew in the
post-link shuffles (SURVEY.md §4.2-4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glre_spark.inference import broadcast_weights
from glre_spark.linking import alias_dict_df, dedup_triples, link_aliases

MAX_DOC_CHARS = 100_000
URL_BUCKETS = 1024  # deterministic lineage buckets, decoupled from task count


def url_bucket(col=None):
    """Stable url-hash bucket (repartition_urlhash, SURVEY.md §2.9)."""
    return F.pmod(F.xxhash64(col if col is not None else F.col("url")), F.lit(URL_BUCKETS)).cast("int")


def latest_per_url(pages: DataFrame) -> DataFrame:
    """join_asof flavor: keep the newest warc_ts crawl per url.

    Hash-aggregate (max_by over the row struct), NOT a sort-window: the
    rows are fat (html binary), and an agg gets map-side partial combine —
    recrawl duplicates collapse BEFORE the exchange and nothing is sorted —
    where row_number() must exchange every row, sort each partition, then
    discard the losers (r02 flagship-scaling suspect #1). Ties on warc_ts
    cannot occur: datagen guarantees a recrawl's warc_ts is strictly
    later (datagen.py), and CC-style WARC timestamps are per-fetch.
    NULL warc_ts is coalesced to the epoch so a url whose crawls ALL lack
    a timestamp still keeps one real row (max_by skips NULL ordering
    keys, which would otherwise emit an all-NULL payload)."""
    payload = [c for c in pages.columns if c != "url"]
    ts = F.coalesce(F.col("warc_ts"), F.to_timestamp(F.lit("1970-01-01")))
    return (
        pages.groupBy("url")
        .agg(F.max_by(F.struct(*payload), ts).alias("_row"))
        .select("url", *[F.col(f"_row.{c}").alias(c) for c in payload])
    )


def eligible_pages(pages: DataFrame, lang: str = "en") -> DataFrame:
    """The pipeline's admission filter (filter_lang + filter_len), factored
    out so the streaming crawl registry applies EXACTLY the same rule: a
    crawl excluded here must not count as a url's latest version."""
    return pages.filter(F.col("lang") == lang).filter(
        F.length("text").between(1, MAX_DOC_CHARS)
    )


def prepare_pages(pages: DataFrame, lang: str = "en", use_extractor: bool = True,
                  partitions: int | None = None,
                  carry_cols: list[str] | None = None) -> DataFrame:
    """Filter, dedup recrawls, repartition on url-hash. Text extraction is
    NOT done here — it is fused into the inference Arrow stage
    (inference.infer_stage(extract_html=True)) so the pipeline has exactly
    one Python stage. With ``use_extractor`` the html column is carried
    through; otherwise the trusted text column is (and html is pruned from
    the scan by Catalyst)."""
    df = latest_per_url(eligible_pages(pages, lang))
    # latest_per_url's aggregation already exchanged rows by hash(url) —
    # that IS the explicit url-hash partitioning the north rule asks for. A second
    # repartition("bucket") here would re-shuffle the fat html rows for
    # nothing; `bucket` stays as the deterministic lineage-key COLUMN
    # (resume filtering), decoupled from physical task count. Pass
    # ``partitions`` only to force a different fan-out (e.g. tiny corpus on
    # a big cluster).
    df = df.withColumn("bucket", url_bucket())
    if partitions:
        df = df.repartition(partitions, "bucket")
    payload = "html" if use_extractor else "text"
    return df.select("url", "warc_ts", payload, "lang", "bucket", *(carry_cols or []))


def predictions_to_triples(
    preds: DataFrame, alias_df: DataFrame, group_col: str | None = None
) -> DataFrame:
    """Link head/tail names through the alias dictionary and assemble
    (subj, pred, obj) rows.

    Aggregate-early design: predictions are first collapsed to distinct
    (h_name, r, t_name) with map-side partial aggregation — at web scale
    the prediction stream is orders of magnitude larger than the distinct
    surface-triple space, so the two broadcast joins (and their per-row
    normalization regexes) run on the collapsed table, not the stream."""
    keys = ["h_name", "r", "t_name"] + ([group_col] if group_col else [])
    if "n_pred_rows" in preds.columns:  # already partition-aggregated in-stage
        agg = preds.groupBy(*keys).agg(
            F.max("score").alias("score"),
            F.min("url").alias("url"),
            F.sum("n_pred_rows").alias("n_pred_rows"),
        )
    else:
        agg = preds.groupBy(*keys).agg(
            F.max("score").alias("score"),
            F.min("url").alias("url"),
            F.count("*").alias("n_pred_rows"),
        )
    carry = [F.col(group_col)] if group_col else []
    linked_h = link_aliases(
        agg.withColumnRenamed("h_name", "name"), alias_df
    ).select(
        F.col("url"), F.col("t_name"), F.col("r"), F.col("score"),
        F.col("n_pred_rows"), F.col("canonical_name").alias("subj"), *carry,
    )
    linked = link_aliases(
        linked_h.withColumnRenamed("t_name", "name"), alias_df
    ).select(
        F.col("url"), F.col("subj"), F.col("r").alias("pred"),
        F.col("canonical_name").alias("obj"), F.col("score"),
        F.col("n_pred_rows"), *carry,
    )
    return linked


def build_triples(spark: SparkSession, pages: DataFrame,
                  use_extractor: bool = True, partitions: int | None = None,
                  cluster_entities: bool = False,
                  group_col: str | None = None,
                  group_type: str = "int",
                  drop_near_dups: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → deduped triples.

    ``cluster_entities=True`` adds the cross-document entity-cluster merge
    (MinHash-LSH blocking + connected components over near-duplicate
    names, linking.cluster_names) after the alias join — off by default in
    benches because the dictionary already canonicalizes this corpus.

    ``group_col`` names a column on ``pages`` (lineage bucket_group int,
    or the streaming crawl_key string — ``group_type`` gives its Spark
    type): dedup becomes group-scoped and the column rides to the output
    so the checkpointed run can partition its sink by it in ONE pass and
    the streaming log can keep crawl granularity.

    ``drop_near_dups=True`` composes the dedup DECISION
    (kgops.near_dup_keepers: MinHash/LSH → Jaccard-verified → connected
    components → min-id keeper) BELOW the inference stage: non-keeper
    pages are dropped by a left-semi join before any Python runs, the way
    a training-data pipeline spends its dedup pass to save its model
    pass. The decision shingles the page's stored content (html when
    ``use_extractor``, else text) so it adds zero extraction stages.
    Stream-parity note: a near-dup decision inside foreachBatch is
    batch-LOCAL (it can't see near-dups that arrived in earlier
    micro-batches), so stream ≡ batch exactness (test_streaming) holds
    only for the recrawl/as-of dedup, not for cross-batch near-dup
    dropping. streaming.stream_build_triples therefore REFUSES
    drop_near_dups=True and offers the explicit 'batch_local' opt-in
    (within-batch-only semantics, pinned by test); at scale the exact
    keeper table is a periodic batch job joined against the log
    instead."""
    from glre_spark.linking import apply_name_clusters, cluster_names

    from glre_spark.inference import infer_stage_agg

    docs = prepare_pages(
        pages, use_extractor=use_extractor, partitions=partitions,
        carry_cols=[group_col] if group_col else [],
    )
    if drop_near_dups:
        from glre_spark.operators.kgops import near_dup_keepers

        content = (
            F.col("html").cast("string") if use_extractor else F.col("text")
        )
        # localCheckpoint: the keeper DAG and the main path both consume
        # the prepared corpus; materializing it once is the local analog
        # of the staging write a real pipeline would do before dedup.
        # The keeper id is the URL ITSELF, not xxhash64(url): at 10^12
        # docs a 64-bit id expects ~n²/2^65 ≈ tens of thousands of
        # colliding url pairs, each silently coupling two distinct docs'
        # keep/drop fate (ADVICE r5). The url is unique by construction
        # here (latest_per_url collapsed recrawls), and the extra key
        # bytes ride shuffles whose payload (bottom-256 sketches, band
        # hashes) dominates; a real deployment could dictionary-encode.
        ided = docs.localCheckpoint(eager=True)
        keepers = near_dup_keepers(
            ided.select(F.col("url").alias("doc_id"), content.alias("text")),
            sketch_k=256,
        )
        keep_ids = keepers.filter(~F.col("is_dup")).select(
            F.col("doc_id").alias("url")
        )
        docs = ided.join(keep_ids, "url", "left_semi")
    preds = infer_stage_agg(
        docs, weights_bc=broadcast_weights(spark), extract_html=use_extractor,
        group_col=group_col, group_type=group_type,
    )
    triples = predictions_to_triples(preds, alias_dict_df(spark), group_col=group_col)
    deduped = dedup_triples(triples, extra_keys=[group_col] if group_col else [])
    if cluster_entities:
        names = deduped.select(F.col("subj").alias("name"), F.col("n_sources")).unionByName(
            deduped.select(F.col("obj").alias("name"), F.col("n_sources"))
        )
        mapping = cluster_names(names, weight_col="n_sources")
        deduped = apply_name_clusters(deduped, mapping)
    return deduped
