"""Deterministic rule-based NLP: sentence split, tokenization, mention
detection + NER, document-local coref grouping (SURVEY.md §2.11 i2-i4).

The reference consumes pre-tokenized DocRED / GENIA-split CDR text
(upstream:data_processing/*); our pipeline must produce mentions itself
(BASELINE.json north_star "mention detection + NER"). In-sandbox this is a
gazetteer + rules implementation — deterministic, vectorizable, and
pluggable (the inference stage only sees the ``Doc`` structure).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from glre_spark.datagen import ENTITIES

_SENT_END = {".", "!", "?"}
_RE_NUM = re.compile(r"^\d+(\.\d+)?$")
_RE_YEAR = re.compile(r"^(1[89]\d\d|20\d\d)$")


def tokenize(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def sent_split(tokens: list[str]) -> list[list[str]]:
    """Sentences = token runs ending at ./!/? — matches the corpus contract
    (generator emits ' .'-terminated sentences joined by single spaces)."""
    sents: list[list[str]] = []
    cur: list[str] = []
    for tok in tokens:
        cur.append(tok)
        if tok in _SENT_END:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


def build_gazetteer() -> dict[tuple[str, ...], str]:
    """normalized token-tuple → entity type, from the closed vocabulary."""
    gaz: dict[tuple[str, ...], str] = {}
    for name, typ, aliases in ENTITIES:
        for surface in [name, *aliases]:
            gaz[tuple(_norm(surface).split(" "))] = typ
    return gaz


_GAZ = build_gazetteer()
_GAZ_MAXLEN = max(len(k) for k in _GAZ)


@dataclass
class Mention:
    name: str          # surface form
    type: str          # PER/ORG/LOC/TIME/NUM/MISC
    sent_id: int
    start: int         # token offset within sentence, [start, end)
    end: int


@dataclass
class Doc:
    url: str
    sents: list[list[str]]
    mentions: list[Mention] = field(default_factory=list)
    # entity clusters: entity_id → list of mention indices
    entities: list[list[int]] = field(default_factory=list)
    entity_names: list[str] = field(default_factory=list)  # representative name
    entity_types: list[str] = field(default_factory=list)


def detect_mentions(sents: list[list[str]]) -> list[Mention]:
    """Greedy longest-match gazetteer spans + numeric/year rules."""
    mentions: list[Mention] = []
    for sid, toks in enumerate(sents):
        low = [t.lower() for t in toks]
        i = 0
        n = len(toks)
        while i < n:
            hit = None
            for L in range(min(_GAZ_MAXLEN, n - i), 0, -1):
                typ = _GAZ.get(tuple(low[i : i + L]))
                if typ is not None:
                    hit = (L, typ)
                    break
            if hit:
                L, typ = hit
                mentions.append(Mention(" ".join(toks[i : i + L]), typ, sid, i, i + L))
                i += L
            else:
                tok = toks[i]
                if _RE_YEAR.match(tok):
                    mentions.append(Mention(tok, "TIME", sid, i, i + 1))
                elif _RE_NUM.match(tok):
                    mentions.append(Mention(tok, "NUM", sid, i, i + 1))
                i += 1
    return mentions


def coref_group(mentions: list[Mention]) -> tuple[list[list[int]], list[str], list[str]]:
    """Document-local entities = exact-normalized-name mention clusters
    (DocRED vertexSet analog). Returns (clusters, names, types) with
    deterministic ordering (first-mention order)."""
    order: dict[str, int] = {}
    clusters: list[list[int]] = []
    names: list[str] = []
    types: list[str] = []
    for mi, m in enumerate(mentions):
        key = _norm(m.name)
        if key not in order:
            order[key] = len(clusters)
            clusters.append([])
            names.append(m.name)
            types.append(m.type)
        clusters[order[key]].append(mi)
    return clusters, names, types


def analyze(url: str, text: str) -> Doc:
    """text → Doc with sentences, mentions, entity clusters."""
    sents = sent_split(tokenize(text))
    mentions = detect_mentions(sents)
    clusters, names, types = coref_group(mentions)
    return Doc(url, sents, mentions, clusters, names, types)
