"""KG graph-analytics semantics (SURVEY.md §2.14): hand-computed
fixed-point PageRank, known-graph triangles, and conservation invariants
the DuckDB twins can't see (they'd share a systematic bug; these checks
derive expectations independently in Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glre_spark.operators.graphops import (
    _PR_ITERS,
    _PR_SCALE,
    cooccur_edges,
    kg_degree_stats,
    kg_pagerank,
    kg_triangle_count,
)
from tests.conftest import SF_DIR


def _docs(spark, texts, tmp_path):
    """Write a minimal documents.parquet so the (spark, sf_dir) ops run
    against a hand-built corpus."""
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _ref_pagerank(edges: dict[tuple[str, str], int]) -> dict[str, int]:
    """Independent reimplementation of the op's exact integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    w_out: dict[str, int] = {}
    for (s, _), w in edges.items():
        w_out[s] = w_out.get(s, 0) + w
    n = len(nodes)
    r_init, base = _PR_SCALE // n, (_PR_SCALE // n) * 15 // 100
    rank = {v: r_init for v in nodes}
    for _ in range(_PR_ITERS):
        nxt = {v: base for v in nodes}
        for (s, d), w in edges.items():
            nxt[d] += ((rank[s] * 85) // 100) * w // w_out[s]
        rank = nxt
    return rank


def test_pagerank_matches_hand_computation(spark, tmp_path):
    # corpus "a b a c" ×2 docs + "b c": edges a→b, b→a, a→c (×2 each), b→c
    sf = _docs(spark, ["a b a c", "a b a c", "b c"], tmp_path)
    edges = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 2, ("b", "c"): 1}
    got_edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccur_edges(
            spark.read.parquet(f"{sf}/documents.parquet")
        ).collect()
    }
    assert got_edges == edges
    got = {r["entity"]: r["rank"] for r in kg_pagerank(spark, sf).collect()}
    assert got == _ref_pagerank(edges)
    # sink node c accumulated mass; source-heavy a kept less than init
    assert got["c"] > got["b"]


def test_triangle_count_known_graph(spark, tmp_path):
    # "a b c a" → directed a→b, b→c, c→a → undirected triangle {a,b,c};
    # "c d" adds a pendant edge: d participates in 0 triangles.
    sf = _docs(spark, ["a b c a", "c d"], tmp_path)
    got = {
        r["entity"]: r["n_triangles"]
        for r in kg_triangle_count(spark, sf).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_degree_and_pagerank_conservation(spark):
    """Corpus-level invariants on the real testdata: every edge weight is
    counted once in w_out and once in w_in; PageRank mass stays within
    [n·base, SCALE] (damped mass only leaks at dangling nodes)."""
    deg = kg_degree_stats(spark, SF_DIR)
    tot = deg.agg(
        F.sum("w_out").alias("o"), F.sum("w_in").alias("i")
    ).collect()[0]
    assert tot["o"] == tot["i"] > 0
    pr = kg_pagerank(spark, SF_DIR).collect()
    n = len(pr)
    mass = sum(r["rank"] for r in pr)
    base = (_PR_SCALE // n) * 15 // 100
    assert n * base <= mass <= _PR_SCALE


def test_pagerank_is_partitioning_invariant(spark, tmp_path):
    """The fixed-point claim, tested directly: the SAME corpus written at
    1 vs 7 input partitions (different split boundaries, different
    summation orders) must produce BIT-IDENTICAL ranks — float PageRank
    cannot promise this, integer floor arithmetic must."""
    texts = [f"w{i % 9} w{(i * 3) % 9} w{(i * 5 + 1) % 9}" for i in range(60)]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    ranks = []
    for parts, sub in ((1, "p1"), (7, "p7")):
        df.repartition(parts).write.mode("overwrite").parquet(
            str(tmp_path / sub / "documents.parquet")
        )
        ranks.append(
            sorted(
                (r["entity"], r["rank"])
                for r in kg_pagerank(spark, str(tmp_path / sub)).collect()
            )
        )
    assert ranks[0] == ranks[1]


def test_cooccur_edges_plan_is_aggregate_only(spark):
    """The corpus-sized stage must be ONE map-side-combining aggregation:
    two HashAggregate operators around a single (src, dst) HASH exchange,
    no Window, no Python. The r7 guarded fan_out may add ONE round-robin
    exchange below the aggregation (it redistributes an unsplittable
    single-row-group scan and is a no-op at real scale); what this test
    pins is that the token stream still collapses map-side before the
    only keyed exchange."""
    import re

    from tests.test_plans import plan_of

    df = cooccur_edges(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    plan = plan_of(df)
    # formatted plans list each operator once as "(n) Name" detail header
    aggs = re.findall(r"^\(\d+\) HashAggregate", plan, re.M)
    hash_ex = re.findall(r"hashpartitioning\(src", plan)
    rr_ex = re.findall(r"RoundRobinPartitioning", plan)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(aggs) == 2  # partial + final around ONE keyed exchange
    assert len(hash_ex) == 1
    assert len(exchanges) <= 1 + len(rr_ex)
    assert "Window" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_neighbor_jaccard_known_graph(spark, tmp_path):
    """4-cycle a-b-c-d-a: opposite corners share BOTH neighbors
    (jaccard 1.0); adjacent corners share none, so the wedge join must
    not emit them at all — exactly two rows."""
    from glre_spark.operators.graphops import kg_neighbor_jaccard

    _docs(spark, ["a b c d a"], tmp_path)
    rows = {
        (r["entity_a"], r["entity_b"]): r
        for r in kg_neighbor_jaccard(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {("a", "c"), ("b", "d")}
    for r in rows.values():
        assert r["n_shared"] == 2 and r["deg_a"] == 2 and r["deg_b"] == 2
        assert r["jaccard"] == 1.0


def test_neighbor_jaccard_partial_overlap(spark, tmp_path):
    """Path a-b-c plus b-d: N(a)={b}, N(c)={b}, N(d)={b} → the three
    leaves pairwise share exactly b with jaccard 1/(1+1-1)=1.0, and
    pairs THROUGH b never appear (b shares no neighbor with anyone:
    its neighbors' neighbor sets contain only b itself... except via
    other leaves). Hand-checked: leaves {a,c,d} pairwise 1.0, no rows
    involving b."""
    from glre_spark.operators.graphops import kg_neighbor_jaccard

    _docs(spark, ["a b c", "d b d"], tmp_path)  # edges a-b, b-c, b-d (d-b dup)
    rows = {
        (r["entity_a"], r["entity_b"]): r["jaccard"]
        for r in kg_neighbor_jaccard(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {("a", "c"), ("a", "d"), ("c", "d")}
    assert all(j == 1.0 for j in rows.values())


def test_degree_entropy_hand_computed(spark, tmp_path):
    """'a b a b a c': a's out-edges are b:2, c:1 → H = ln3 − (2·ln2)/3;
    b's single out-neighbor (a:2) must give exactly 0; c has no
    out-edges and must be absent."""
    import math

    from glre_spark.operators.graphops import kg_degree_entropy

    _docs(spark, ["a b a b a c"], tmp_path)
    rows = {r["entity"]: r for r in kg_degree_entropy(spark, str(tmp_path)).collect()}
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    assert (a["w_total"], a["n_out"]) == (3, 2)
    expect = round(
        math.log(3) - round(1e6 * 2 * math.log(2)) / 1e6 / 3 + 1e-9, 4
    )
    assert a["entropy"] == expect
    b = rows["b"]
    assert (b["w_total"], b["n_out"]) == (2, 1)
    assert b["entropy"] == 0.0
