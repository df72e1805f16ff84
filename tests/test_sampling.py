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


def test_gopher_rules_recomputed_in_python(spark):
    """Recompute every rule from the raw text in plain Python and demand
    exact agreement — the DuckDB twin shares the SQL decomposition, this
    check shares nothing."""
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    docs = {r["doc_id"]: r["text"] for r in load(spark, SF_DIR, "documents").collect()}
    out = {r["doc_id"]: r for r in REGISTRY["filter_gopher_rules"][0](spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    saw_keep, saw_drop = False, False
    for doc_id, text in docs.items():
        w = text.split(" ")
        n = len(w)
        sum_len = sum(len(t) for t in w)
        n_alpha = sum(1 for t in w if any(c.isalpha() for c in t))
        n_stop = sum(1 for t in w if t in stop)
        r = out[doc_id]
        assert r["n_tokens"] == n
        assert r["mean_wl_x100"] == 100 * sum_len // n
        assert r["r_ntok"] == (50 <= n <= 100000)
        assert r["r_wordlen"] == (3 * n <= sum_len <= 10 * n)
        assert r["r_alpha"] == (5 * n_alpha >= 4 * n)
        assert r["r_stop"] == (n_stop >= 2)
        assert r["keep"] == (r["r_ntok"] and r["r_wordlen"] and r["r_alpha"] and r["r_stop"])
        saw_keep |= r["keep"]
        saw_drop |= not r["keep"]
    # the corpus must exercise BOTH branches or the gate proves nothing
    assert saw_keep and saw_drop


def test_domain_stats_stream_equals_batch(spark):
    """The incremental (3-micro-batch) per-domain accounting must land on
    exactly the batch answer — integer sums make the final state
    independent of how the file source batched the corpus."""
    batch = {
        r["domain"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["avg_chars"])
        for r in REGISTRY["domain_stats"][0](spark, SF_DIR).collect()
    }
    stream = {
        r["domain"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["avg_chars"])
        for r in REGISTRY["domain_stats_stream"][0](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_vocab_zipf_invariants(spark):
    """Rank must be 1..K contiguous in non-increasing frequency order,
    cum_freq must be the exact prefix sum, and the head coverage can
    never exceed the true corpus token count."""
    rows = sorted(
        REGISTRY["vocab_topk_zipf"][0](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in rows]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    run = 0
    for r in rows:
        run += r["freq"]
        assert r["cum_freq"] == run
    total = (
        load(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    assert run <= total


def test_gopher_rules_edge_corpus(spark, tmp_path):
    """Adversarial inputs the synthetic corpus never produces: empty
    text, single char, all-stopwords, unicode letters (must NOT count
    as [A-Za-z]-alphabetic), a 3-chars-per-token boundary doc (mean
    word length exactly 3.0 → rule inclusive-true), and a giant token.
    Spark result must equal a character-exact Python mirror."""
    import re as _re

    texts = [
        "",                       # split(' ') → [''] : n=1, sum_len=0
        "a",
        "the the the the",        # all stopwords, n_stop=4
        "ü ü ü",   # ü: alphabetic in unicode, NOT in [A-Za-z]
        " ".join(["abc"] * 50),   # n=50 (boundary), mean exactly 3.0
        "x" * 5000,               # one giant token
        " lead",                  # leading space → empty first token
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["filter_gopher_rules"][0](spark, str(tmp_path)).collect()
    }
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    for i, t in enumerate(texts):
        w = t.split(" ")
        n = len(w)
        sum_len = sum(len(x) for x in w)
        n_alpha = sum(1 for x in w if _re.search("[A-Za-z]", x))
        n_stop = sum(1 for x in w if x in stop)
        r = out[i]
        assert r["n_tokens"] == n
        assert r["mean_wl_x100"] == 100 * sum_len // n
        assert r["r_ntok"] == (50 <= n <= 100000)
        assert r["r_wordlen"] == (3 * n <= sum_len <= 10 * n)
        assert r["r_alpha"] == (5 * n_alpha >= 4 * n)
        assert r["r_stop"] == (n_stop >= 2)
    # the boundary doc: exactly 50 tokens of length 3 → both rules true
    b = out[4]
    assert b["r_ntok"] and b["r_wordlen"] and b["mean_wl_x100"] == 300
    # unicode letters are NOT [A-Za-z]: r_alpha must be False
    assert out[3]["r_alpha"] is False
