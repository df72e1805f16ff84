"""The vectorized per-document inference stage (SURVEY.md §2.11).

One ``mapInPandas`` over the (url, text) projection: Arrow batches in,
prediction rows out. Weights ride a Spark broadcast and are materialized
once per Python worker (init-once pattern, SURVEY.md §4.3) — never
per-batch, never per-row.

Scale notes: documents are independent → embarrassingly parallel; the
stage preserves the upstream url-hash partitioning (no shuffle); Arrow
batch size is capped in session.py so fat rows stay allocation-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from glre_spark.model import GLREModel, build_weights
from glre_spark.model.weights import MODEL_SEED

PRED_COLS = ["url", "h", "t", "h_name", "t_name", "h_type", "t_type", "r", "score"]
PRED_SCHEMA = (
    "url string, h int, t int, h_name string, t_name string, "
    "h_type string, t_type string, r string, score double"
)

_MODEL_CACHE: dict[int, GLREModel] = {}


def _get_model(weights=None, seed: int = MODEL_SEED) -> GLREModel:
    model = _MODEL_CACHE.get(seed)
    if model is None:
        model = GLREModel(weights if weights is not None else build_weights(seed))
        _MODEL_CACHE[seed] = model
    return model


def _rows_to_pdf(rows: list[dict]) -> pd.DataFrame:
    pdf = pd.DataFrame(rows, columns=PRED_COLS)
    return pdf.astype(
        {"h": np.int32, "t": np.int32, "score": np.float64}, errors="ignore"
    )


def infer_stage(df: DataFrame, weights_bc=None, text_col: str = "text") -> DataFrame:
    """(…, url, text) → predictions (url, h, t, names, types, r, score)."""
    from glre_spark.model.net import infer_doc  # local import: ships via --py-files

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(weights_bc.value if weights_bc is not None else None)
        for pdf in batches:
            rows: list[dict] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                rows.extend(infer_doc(model, url, text or ""))
            yield _rows_to_pdf(rows)

    return df.select("url", df[text_col].alias("text")).mapInPandas(fn, PRED_SCHEMA)


def broadcast_weights(spark, seed: int = MODEL_SEED):
    """Ship the frozen weight dict to executors once (broadcast_sidecar,
    SURVEY.md §2.1)."""
    return spark.sparkContext.broadcast(build_weights(seed))
