"""glre_spark — a from-scratch PySpark-native document-level KG-construction
engine with the capabilities of nju-websoft/GLRE (EMNLP 2020), re-expressed
Spark-first (DataFrame + Arrow-vectorized pandas UDFs; no per-row Python).

NOT a port: the reference is a single-node PyTorch research pipeline
(see SURVEY.md §0 — the reference mount was empty at survey time; the
authoritative spec is BASELINE.json's north_rule/input_hint). This package
implements the same computation — text extraction, mention detection/NER,
GLRE's global heterogeneous graph + R-GCN + local attention + context
pooling + pair scoring, entity linking/canonicalization, graph
materialization — as a distributed Spark pipeline.
"""

__version__ = "0.1.0"
