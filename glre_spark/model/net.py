"""GLRE forward pass in numpy (paper §3; SURVEY.md §2.11 i5-i12).

Per-document computation — documents are independent, so this runs inside
the Arrow-batched ``mapInPandas`` inference stage; nothing here touches
Spark. All ops are vectorized numpy over the document's nodes/pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np

from glre_spark.datagen import rel_schema_rows
from glre_spark.model.weights import D, HEADS, L_RGCN, N_DIST, R_EDGE, VHASH
from glre_spark.nlp import Doc, analyze

# Relation vocabulary: index 0 = NA, 1..96 = schema rows (frozen order).
REL_IDS = ["NA"] + [r["rel_id"] for r in rel_schema_rows()]

# Type-pair gate: which relation indices an ordered (head_type, tail_type)
# pair may express. Mirrors DocRED's type-sensitive label space; keeps the
# emitted triples semantically shaped (PER-P108->ORG etc.).
_GATE_SPEC = {
    ("PER", "ORG"): ["P108", "P112", "P463"],
    ("PER", "LOC"): ["P19"],
    ("PER", "TIME"): ["P569"],
    ("ORG", "LOC"): ["P159", "P740", "P17"],
    ("ORG", "ORG"): ["P127"],
    ("ORG", "PER"): ["P169"],
    ("ORG", "TIME"): ["P571"],
    ("LOC", "LOC"): ["P131", "P17"],
}
TYPE_GATE = {
    k: np.array([REL_IDS.index(r) for r in v], dtype=np.int64)
    for k, v in _GATE_SPEC.items()
}

SCORE_THRESHOLD = 0.9  # θ — frozen with the weights; calibrated in tests


def _tok_id(token: str) -> int:
    h = hashlib.md5(token.lower().encode()).digest()
    return int.from_bytes(h[:8], "big") % VHASH


def encode_words(w: dict, sents: list[list[str]]) -> list[np.ndarray]:
    """i5: deterministic encoder stand-in — hash embedding + a local
    context mixer (0.5 self + 0.25 prev + 0.25 next). Returns per-sentence
    (n_tok, D) float32 arrays."""
    out = []
    emb = w["emb"]
    for toks in sents:
        ids = np.fromiter((_tok_id(t) for t in toks), dtype=np.int64, count=len(toks))
        e = emb[ids]
        mixed = 0.5 * e
        mixed[1:] += 0.25 * e[:-1]
        mixed[0] += 0.25 * e[0]
        mixed[:-1] += 0.25 * e[1:]
        mixed[-1] += 0.25 * e[-1]
        out.append(mixed.astype(np.float32))
    return out


def build_nodes(w: dict, doc: Doc, word_reps: list[np.ndarray]) -> tuple[np.ndarray, int, int, int]:
    """i6: mention nodes (avg span reps), entity nodes (avg mention nodes),
    sentence nodes (avg sentence reps), each + node-type embedding.
    Node layout: [mentions | entities | sentences]."""
    nm, ne, ns = len(doc.mentions), len(doc.entities), len(doc.sents)
    nodes = np.zeros((nm + ne + ns, D), dtype=np.float32)
    for mi, m in enumerate(doc.mentions):
        nodes[mi] = word_reps[m.sent_id][m.start : m.end].mean(axis=0) + w["node_type"][0]
    for ei, cluster in enumerate(doc.entities):
        nodes[nm + ei] = (
            np.stack([nodes[mi] for mi in cluster]).mean(axis=0) + w["node_type"][1]
        )
    for si in range(ns):
        nodes[nm + ne + si] = word_reps[si].mean(axis=0) + w["node_type"][2]
    return nodes, nm, ne, ns


def build_adj(doc: Doc, nm: int, ne: int, ns: int) -> np.ndarray:
    """i7: 5-edge-type adjacency (MM, MS, ME, SS, ES), row-normalized per
    type (degree normalization, upstream adj_utils analog)."""
    n = nm + ne + ns
    A = np.zeros((R_EDGE, n, n), dtype=np.float32)
    ment_ent = np.zeros(nm, dtype=np.int64)
    for ei, cluster in enumerate(doc.entities):
        for mi in cluster:
            ment_ent[mi] = ei
    # MM: mentions co-occurring in a sentence
    for i in range(nm):
        for j in range(i + 1, nm):
            if doc.mentions[i].sent_id == doc.mentions[j].sent_id:
                A[0, i, j] = A[0, j, i] = 1.0
    for mi, m in enumerate(doc.mentions):
        A[1, mi, nm + ne + m.sent_id] = A[1, nm + ne + m.sent_id, mi] = 1.0  # MS
        A[2, mi, nm + ment_ent[mi]] = A[2, nm + ment_ent[mi], mi] = 1.0      # ME
    # SS: all sentence pairs (EoG-style sentence graph)
    for i in range(ns):
        for j in range(ns):
            if i != j:
                A[3, nm + ne + i, nm + ne + j] = 1.0
    # ES: entity ↔ sentences containing its mentions
    for mi, m in enumerate(doc.mentions):
        ei = ment_ent[mi]
        A[4, nm + ei, nm + ne + m.sent_id] = A[4, nm + ne + m.sent_id, nm + ei] = 1.0
    deg = A.sum(axis=2, keepdims=True)
    np.divide(A, deg, out=A, where=deg > 0)
    return A


def rgcn_forward(w: dict, nodes: np.ndarray, A: np.ndarray) -> np.ndarray:
    """i8: L layers of h' = ReLU(h·W0 + Σ_r norm(A_r)·h·W_r)."""
    h = nodes
    for layer in range(L_RGCN):
        out = h @ w[f"rgcn_w0_{layer}"]
        for r in range(R_EDGE):
            out += A[r] @ (h @ w[f"rgcn_wr_{layer}_{r}"])
        h = np.maximum(out, 0.0)
    return h


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def local_repr(w: dict, pair_q: np.ndarray, mention_reps: np.ndarray) -> np.ndarray:
    """i9: local entity representation — multi-head attention over one
    entity's mention (global) reps, query conditioned on the entity pair.
    Encapsulated so the exact query construction (the one under-specified
    GLRE detail, SURVEY.md §2.11 i9) can be swapped without touching the
    pipeline."""
    dh = D // HEADS
    q = (pair_q @ w["mha_q"]).reshape(HEADS, dh)                    # (H, dh)
    k = (mention_reps @ w["mha_k"]).reshape(-1, HEADS, dh)          # (M, H, dh)
    v = (mention_reps @ w["mha_v"]).reshape(-1, HEADS, dh)
    scores = np.einsum("hd,mhd->hm", q, k) / np.sqrt(dh)            # (H, M)
    att = _softmax(scores, axis=1)
    ctx = np.einsum("hm,mhd->hd", att, v).reshape(D)
    return ctx @ w["mha_o"]


def context_pool(w: dict, sent_reps: np.ndarray) -> np.ndarray:
    """i10: self-attended pooling over the document's sentence reps."""
    query = sent_reps.mean(axis=0) @ w["ctx_q"]
    att = _softmax(sent_reps @ query / np.sqrt(D))
    return att @ sent_reps


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class GLREModel:
    """Frozen deterministic GLRE. ``predict(doc)`` → list of
    (h, t, rel_id, score) with score > θ, one (argmax) relation per ordered
    entity pair, gated by entity-type compatibility."""

    def __init__(self, weights: dict[str, np.ndarray], threshold: float = SCORE_THRESHOLD):
        self.w = weights
        self.threshold = threshold

    def predict(self, doc: Doc) -> list[tuple[int, int, str, float]]:
        if not doc.entities or len(doc.entities) < 2:
            return []
        w = self.w
        word_reps = encode_words(w, doc.sents)
        nodes, nm, ne, ns = build_nodes(w, doc, word_reps)
        A = build_adj(doc, nm, ne, ns)
        g = rgcn_forward(w, nodes, A)                      # global reps
        ment_g = g[:nm]
        ent_g = g[nm : nm + ne]
        sent_g = g[nm + ne :]
        ctx = context_pool(w, sent_g)
        first_sent = np.array(
            [doc.mentions[c[0]].sent_id for c in doc.entities], dtype=np.int64
        )
        out: list[tuple[int, int, str, float]] = []
        for h in range(ne):
            for t in range(ne):
                if h == t:
                    continue
                gate = TYPE_GATE.get((doc.entity_types[h], doc.entity_types[t]))
                if gate is None:
                    continue
                pair_q = np.concatenate([ent_g[h], ent_g[t]])
                l_h = local_repr(w, pair_q, ment_g[doc.entities[h]])
                l_t = local_repr(w, pair_q, ment_g[doc.entities[t]])
                dist = min(abs(int(first_sent[h]) - int(first_sent[t])), N_DIST - 1)
                feat = np.concatenate(
                    [ent_g[h], l_h, ent_g[t], l_t, ctx, w["dist"][dist]]
                )
                hid = np.maximum(feat @ w["ff1_w"] + w["ff1_b"], 0.0)
                logits = hid @ w["ff2_w"] + w["ff2_b"]
                probs = _sigmoid(logits[gate])
                best = int(np.argmax(probs))
                score = float(probs[best])
                if score > self.threshold:
                    out.append((h, t, REL_IDS[int(gate[best])], score))
        return out


def infer_doc(model: GLREModel, url: str, text: str) -> list[dict]:
    """Full i2-i12 path for one document: analyze text → predict → rows
    (url, h, t, h_name, t_name, h_type, t_type, r, score)."""
    doc = analyze(url, text)
    rows = []
    for h, t, rel, score in model.predict(doc):
        rows.append(
            {
                "url": url,
                "h": h,
                "t": t,
                "h_name": doc.entity_names[h],
                "t_name": doc.entity_names[t],
                "h_type": doc.entity_types[h],
                "t_type": doc.entity_types[t],
                "r": rel,
                "score": round(score, 6),
            }
        )
    return rows
