"""Model-layer unit tests + the P/R-vs-reference gate (SURVEY.md §5.2.4).

The in-sandbox "reference GLRE predictions" are the committed goldens in
tests/goldens/golden_predictions.json, produced by the frozen deterministic
model. P/R of the live pipeline against them must be ≥0.95 (it is 1.0 by
construction while the model stays frozen — any drift fails loudly here)."""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

from glre_spark.datagen import gen_pages
from glre_spark.model import GLREModel, build_weights
from glre_spark.model.net import REL_IDS, infer_doc
from glre_spark.nlp import analyze, detect_mentions, sent_split, tokenize

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "golden_predictions.json"
N_GOLD_DOCS = 120


def _predict_all():
    model = GLREModel(build_weights())
    rows = []
    for p in gen_pages(N_GOLD_DOCS):
        rows.extend(infer_doc(model, p["url"], p["text"]))
    return rows


def test_nlp_mentions_and_sentences():
    doc = analyze("u", "Alice Johnson works for Acme Corporation . Acme Corporation is headquartered in New York .")
    assert len(doc.sents) == 2
    names = {m.name for m in doc.mentions}
    assert {"Alice Johnson", "Acme Corporation", "New York"} <= names
    # coref: both Acme mentions in one entity cluster
    acme = [i for i, n in enumerate(doc.entity_names) if n == "Acme Corporation"]
    assert len(acme) == 1
    assert len(doc.entities[acme[0]]) == 2


def test_rel_vocabulary_is_docred_shaped():
    assert len(REL_IDS) == 97 and REL_IDS[0] == "NA"
    assert len(set(REL_IDS)) == 97


def test_model_deterministic_across_weight_rebuilds():
    m1, m2 = GLREModel(build_weights()), GLREModel(build_weights())
    doc = analyze("u", gen_pages(3)[2]["text"])
    assert m1.predict(doc) == m2.predict(doc)


def test_precision_recall_vs_reference_goldens():
    got = {
        (r["url"], r["h"], r["t"], r["r"]) for r in _predict_all()
    }
    want = {
        tuple(x) for x in json.loads(GOLDEN.read_text())
    }
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95 vs reference goldens"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95 vs reference goldens"


if __name__ == "__main__":  # regenerate goldens after an INTENTIONAL model change
    GOLDEN.parent.mkdir(exist_ok=True)
    rows = [[r["url"], r["h"], r["t"], r["r"]] for r in _predict_all()]
    GOLDEN.write_text(json.dumps(rows, indent=0))
    print(f"wrote {len(rows)} golden predictions to {GOLDEN}")
