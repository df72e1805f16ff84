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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glre_spark.inference import broadcast_weights, infer_stage
from glre_spark.linking import alias_dict_df, dedup_triples, link_aliases

MAX_DOC_CHARS = 100_000
URL_BUCKETS = 1024  # deterministic lineage buckets, decoupled from task count


def url_bucket(col=None):
    """Stable url-hash bucket (repartition_urlhash, SURVEY.md §2.9)."""
    return F.pmod(F.xxhash64(col if col is not None else F.col("url")), F.lit(URL_BUCKETS)).cast("int")


def latest_per_url(pages: DataFrame) -> DataFrame:
    """join_asof flavor: keep the newest warc_ts crawl per url."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def prepare_pages(pages: DataFrame, lang: str = "en", use_extractor: bool = True,
                  partitions: int | None = None) -> DataFrame:
    """Filter, dedup recrawls, repartition on url-hash, extract text."""
    df = (
        pages.filter(F.col("lang") == lang)
        .filter(F.length("text").between(1, MAX_DOC_CHARS))
    )
    df = latest_per_url(df)
    df = df.withColumn("bucket", url_bucket())
    if partitions:
        df = df.repartition(partitions, "bucket")
    else:
        df = df.repartition("bucket")
    if use_extractor:
        from glre_spark.extract import extract_text_udf

        df = df.withColumn("text", extract_text_udf(F.col("html")))
    return df.select("url", "warc_ts", "text", "lang", "bucket")


def predictions_to_triples(preds: DataFrame, alias_df: DataFrame) -> DataFrame:
    """Link head/tail names through the alias dictionary and assemble
    (subj, pred, obj) rows. Two broadcast joins — no shuffle."""
    linked_h = link_aliases(
        preds.withColumnRenamed("h_name", "name"), alias_df
    ).select(
        F.col("url"), F.col("t_name"), F.col("r"), F.col("score"),
        F.col("canonical_name").alias("subj"),
    )
    linked = link_aliases(
        linked_h.withColumnRenamed("t_name", "name"), alias_df
    ).select(
        F.col("url"), F.col("subj"), F.col("r").alias("pred"),
        F.col("canonical_name").alias("obj"), F.col("score"),
    )
    return linked


def build_triples(spark: SparkSession, pages: DataFrame,
                  use_extractor: bool = True, partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → deduped triples."""
    docs = prepare_pages(pages, use_extractor=use_extractor, partitions=partitions)
    preds = infer_stage(docs, weights_bc=broadcast_weights(spark))
    triples = predictions_to_triples(preds, alias_dict_df(spark))
    return dedup_triples(triples)
