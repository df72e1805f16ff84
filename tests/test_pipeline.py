"""End-to-end flagship pipeline smoke + determinism (SURVEY.md M1)."""

from __future__ import annotations

from glre_spark.datagen import pages_df
from glre_spark.pipeline import build_triples, latest_per_url, prepare_pages


def test_pipeline_end_to_end(spark):
    pages = pages_df(spark, 80, partitions=4)
    triples = build_triples(spark, pages)
    rows = triples.collect()
    assert len(rows) > 0
    cols = set(triples.columns)
    assert {"subj", "pred", "obj", "score", "url", "n_sources"} <= cols
    # deduped: (subj, pred, obj) unique
    keys = [(r.subj, r.pred, r.obj) for r in rows]
    assert len(keys) == len(set(keys))
    # deterministic across runs
    rows2 = build_triples(spark, pages_df(spark, 80, partitions=4)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_triples_invariant_to_input_partitioning(spark):
    """Cluster-size independence (north rule: resume an N-executor run at
    4N): the triple set must not depend on how the input is split."""
    a = build_triples(spark, pages_df(spark, 80, partitions=3)).collect()
    b = build_triples(spark, pages_df(spark, 80, partitions=13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_extractor_matches_text_column_in_spark(spark):
    """Byte-identical invariant enforced distributed, not just in-process."""
    from pyspark.sql import functions as F

    from glre_spark.extract import extract_text_udf

    pages = pages_df(spark, 120, partitions=4)
    bad = pages.withColumn("extracted", extract_text_udf(F.col("html"))).filter(
        F.col("extracted") != F.col("text")
    )
    assert bad.isEmpty()


def test_latest_per_url_dedups_recrawls(spark):
    pages = pages_df(spark, 100, partitions=4)
    deduped = latest_per_url(pages)
    assert deduped.groupBy("url").count().filter("count > 1").isEmpty()
    assert deduped.count() < pages.count()  # corpus has seeded recrawls


def test_prepare_pages_filters_lang(spark):
    docs = prepare_pages(pages_df(spark, 100, partitions=4), use_extractor=False)
    assert docs.filter("lang != 'en'").isEmpty()
