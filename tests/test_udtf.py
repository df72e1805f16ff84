"""Spark 4 Python UDTF parity: the LATERAL table function must reproduce
the in-process sentence splitter exactly."""

from __future__ import annotations

import duckdb

from glre_spark.nlp import sent_split, tokenize
from glre_spark.operators import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_udtf_matches_inprocess_splitter(spark):
    got = {
        (r.doc_id, r.sent_id): (r.sent, r.n_tokens)
        for r in REGISTRY["udtf_sent_split"][0](spark, SF_DIR).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        for i, toks in enumerate(sent_split(tokenize(text or ""))):
            want[(doc_id, i)] = (" ".join(toks), len(toks))
    assert got == want
