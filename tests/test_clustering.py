"""Cross-document entity clustering (north_star: MinHash-LSH blocking +
connected components merging near-duplicate entity names)."""

from __future__ import annotations

from glre_spark.linking import apply_name_clusters, cluster_names


def test_near_duplicate_names_cluster_to_heaviest(spark):
    rows = [
        ("Vandelay Industries Incorporated", 10),
        ("Vandelay Industries Incorporate", 2),    # near-dup (one char off)
        ("Vandelay Industries Incorporatedd", 1),  # near-dup
        ("Globex Industries", 5),
        ("Initech Systems", 3),
    ]
    names = spark.createDataFrame(rows, "name string, n long")
    mapping = {
        r.name: r.cluster_name
        for r in cluster_names(names, weight_col="n").collect()
    }
    assert mapping["Vandelay Industries Incorporate"] == "Vandelay Industries Incorporated"
    assert mapping["Vandelay Industries Incorporatedd"] == "Vandelay Industries Incorporated"
    # unrelated names stay themselves
    assert mapping["Globex Industries"] == "Globex Industries"
    assert mapping["Initech Systems"] == "Initech Systems"


def test_apply_name_clusters_rewrites_and_redupes(spark):
    triples = spark.createDataFrame(
        [
            ("Acme Corp X", "P108", "Bob", 0.9, "u1", 2),
            ("Acme Corp XX", "P108", "Bob", 0.8, "u2", 3),
        ],
        "subj string, pred string, obj string, score double, url string, n_sources long",
    )
    names = triples.selectExpr("subj AS name", "n_sources").unionByName(
        triples.selectExpr("obj AS name", "n_sources")
    )
    mapping = cluster_names(names, weight_col="n_sources", jaccard_threshold=0.6)
    out = apply_name_clusters(triples, mapping).collect()
    assert len(out) == 1
    (row,) = out
    assert row.subj == "Acme Corp XX"  # heavier variant wins
    assert row.score == 0.9 and row.n_sources == 5


def test_clustering_deterministic(spark):
    rows = [(f"Entity Number {i}", 1) for i in range(30)] + [
        ("Entity Number 7x", 1),
        ("Entity Number 17x", 1),
    ]
    names = spark.createDataFrame(rows, "name string, n long")
    a = sorted(map(tuple, cluster_names(names, weight_col="n").collect()))
    b = sorted(map(tuple, cluster_names(names, weight_col="n").collect()))
    assert a == b
