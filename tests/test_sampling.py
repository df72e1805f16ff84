"""Semantic invariants for the stratified sampler and domain accounting
(SURVEY.md §2.13 r6) — independent of the DuckDB twins, which would share
a systematic spec bug."""

from __future__ import annotations

from pyspark.sql import functions as F

from glre_spark.operators import REGISTRY, _ensure_loaded, load
from tests.conftest import SF_DIR

_ensure_loaded()


def test_sample_stratified_rates_and_weights(spark):
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    sampled = REGISTRY["sample_stratified"][0](spark, SF_DIR)
    rows = sampled.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # weights are exactly the inverse rates
    expect_w = {"head": 100, "mid": 200, "tail": 1000}
    for b, rs in by_bucket.items():
        assert {r["w_x100"] for r in rs} == {expect_w[b]}
    # head keeps 100%: every head-bucket doc must appear. Count heads
    # independently from the quality formula.
    toks = F.split(F.col("text"), " ")
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"))
    )
    q = (
        F.least(F.length("text") / 500.0, F.lit(1.0)) * 0.5
        + stop.cast("double") / F.size(toks) * 0.5
    )
    n_head = docs.filter(q >= 0.55).count()
    assert len(by_bucket.get("head", [])) == n_head
    # sampling is a strict subset and deterministic across reruns
    assert len(rows) <= n_docs
    again = {r["doc_id"] for r in REGISTRY["sample_stratified"][0](spark, SF_DIR).collect()}
    assert again == {r["doc_id"] for r in rows}
    # the weighted count estimates the corpus: sum(w)/100 within 35%
    # (md5 buckets ≈ uniform; 500-doc corpus → wide but bounded noise)
    est = sum(r["w_x100"] for r in rows) / 100.0
    assert 0.65 * n_docs <= est <= 1.35 * n_docs


def test_domain_stats_conserves_corpus(spark):
    docs = load(spark, SF_DIR, "documents")
    stats = REGISTRY["domain_stats"][0](spark, SF_DIR)
    tot = stats.agg(
        F.sum("n_docs").alias("d"), F.sum("n_chars").alias("c")
    ).collect()[0]
    assert tot["d"] == docs.count()
    assert tot["c"] == docs.agg(F.sum(F.length("text"))).collect()[0][0]
    # every domain is a normalized host: lowercase, no scheme, no www.
    for r in stats.select("domain").collect():
        d = r["domain"]
        assert d == d.lower() and "://" not in d and not d.startswith("www.")
