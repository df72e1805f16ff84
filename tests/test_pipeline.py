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


def test_drop_near_dups_removes_duplicate_page(spark):
    """drop_near_dups=True must produce exactly the triples of the corpus
    with non-keeper near-dups removed (keeper = min URL — r6 keys the
    decision on the raw url, after the as-of recrawl dedup, so recrawls
    of one url share a single keeper row) — VERDICT r4 #3 / ADVICE r5."""
    from pyspark.sql import functions as F

    from glre_spark.operators.kgops import near_dup_keepers
    from glre_spark.pipeline import eligible_pages, latest_per_url

    pages = pages_df(spark, 40, partitions=2)
    # a byte-identical copy of one page under a different url: a certain
    # near-dup (same shingles → same signature → same LSH bucket, J=1.0)
    dup = pages.filter(F.col("url") == pages.select("url").head()[0]).withColumn(
        "url", F.concat(F.col("url"), F.lit("?mirror"))
    )
    corpus = pages.unionByName(dup)

    got = build_triples(
        spark, corpus, use_extractor=False, drop_near_dups=True
    ).collect()

    # manual emulation of the pipeline's decision: keeper over each
    # eligible url's LATEST crawl text, keyed by url
    prepared = latest_per_url(eligible_pages(corpus))
    keep = near_dup_keepers(
        prepared.select(F.col("url").alias("doc_id"), "text")
    ).filter(~F.col("is_dup")).select(F.col("doc_id").alias("url"))
    manual = corpus.join(keep, "url", "left_semi")
    n_dropped = corpus.count() - manual.count()
    assert n_dropped >= 1, "the mirror page should be dropped"
    assert prepared.count() - keep.count() == 1, (
        "exactly one url (the mirror) should lose its keeper slot"
    )
    want = build_triples(spark, manual, use_extractor=False).collect()

    key = lambda r: (r.subj, r.pred, r.obj, r.score, r.url, r.n_sources)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want)) and got


def test_spark_submit_master_is_honored(tmp_path):
    """get_spark must NOT override spark-submit's --master (r6: an
    unconditional builder.master() pinned every CLI run to local[nproc],
    silently defeating the two-cluster-size protocol). Launch a real
    spark-submit at local[3] and assert the session sees it."""
    import subprocess
    import sys
    import textwrap

    probe = tmp_path / "probe.py"
    probe.write_text(
        textwrap.dedent(
            """
            from glre_spark.session import get_spark
            s = get_spark("master_probe")
            print("MASTER=", s.sparkContext.master,
                  "SHUFFLE=", s.conf.get("spark.sql.shuffle.partitions"))
            """
        )
    )
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        ["spark-submit", "--master", "local[3]", str(probe)],
        capture_output=True, text=True, timeout=180, cwd=repo,
        env={**os.environ, "PYTHONPATH": repo},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("MASTER=")]
    assert line, out.stdout + out.stderr[-2000:]
    assert "local[3]" in line[0]
    assert "SHUFFLE= 8" in line[0]  # max(3 cores, 8) sized post-startup
