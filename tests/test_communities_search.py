"""Community detection + read-side search operators."""

import pandas as pd
from pyspark.sql import functions as F

from kgspark import communities, search

EDGES_ROWS = [
    # two clusters within one group: {a,b,c} and {x,y,z}, each with
    # internal weight 2 (duplicated edges), one weight-1 bridge a-x —
    # internal weights must dominate so synchronous LP keeps two clusters
    ("e1", "a", "b"), ("e2", "b", "c"), ("e3", "a", "c"),
    ("e1b", "a", "b"), ("e2b", "b", "c"), ("e3b", "a", "c"),
    ("e5", "x", "y"), ("e6", "y", "z"), ("e7", "x", "z"),
    ("e5b", "x", "y"), ("e6b", "y", "z"), ("e7b", "x", "z"),
    ("e8", "a", "x"),
]


def _edges(spark):
    pdf = pd.DataFrame(EDGES_ROWS, columns=["uuid", "source_node_uuid",
                                            "target_node_uuid"])
    pdf["group_id"] = "g"
    return spark.createDataFrame(pdf)


def _nodes(spark):
    pdf = pd.DataFrame({"uuid": list("abcxyz")})
    pdf["name"] = ["N" + u for u in pdf["uuid"]]
    pdf["group_id"] = "g"
    return spark.createDataFrame(pdf)


def test_label_propagation_clusters(spark):
    labels = communities.label_propagation(communities.adjacency(_edges(spark)))
    got = {r["uuid"]: r["community_id"] for r in labels.collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_build_communities(spark):
    out = communities.build_communities(_nodes(spark), _edges(spark))
    comms = out["communities"].collect()
    assert len(comms) == 2
    assert all(c["n_members"] == 3 for c in comms)
    assert out["community_members"].count() == 6


def test_bfs_distances(spark):
    d = {r["uuid"]: r["dist"]
         for r in search.bfs_nodes(_edges(spark), ["a"], depth=2).collect()}
    assert d["a"] == 0 and d["b"] == 1 and d["x"] == 1 and d["y"] == 2


def test_rrf_and_rerankers(spark):
    cand = spark.createDataFrame(
        pd.DataFrame({"uuid": ["u1", "u2", "u3"], "score": [3.0, 2.0, 1.0]}))
    cand2 = spark.createDataFrame(
        pd.DataFrame({"uuid": ["u3", "u2", "u1"], "score": [9.0, 5.0, 1.0]}))
    fused = search.rrf([cand, cand2], limit=3).collect()
    # u2 is rank2 in both (score 2/3+... ) -> deterministic fusion
    assert [r["uuid"] for r in fused][0] in {"u1", "u2", "u3"}
    scores = {r["uuid"]: r["rrf_score"] for r in fused}
    assert abs(scores["u2"] - (1 / 3 + 1 / 3)) < 1e-9


def test_hybrid_search_over_graph_tables(spark):
    # end-to-end: build a tiny graph, search nodes by name
    from kgspark.datagen import pages_spark
    from kgspark.pipeline import build_graph
    out = build_graph(pages_spark(spark, 60, partitions=2), check_text=False)
    nodes = out["nodes"]
    res = search.hybrid_search(
        nodes, text_col="name", emb_col="name_embedding",
        query="Priya Sharma", config=search.NODE_HYBRID_SEARCH_RRF)
    rows = res.collect()
    assert rows, "hybrid search should return candidates"
    top = nodes.filter(F.col("uuid") == rows[0]["uuid"]).collect()[0]
    assert "priya" in top["name"].lower() or "sharma" in top["name"].lower()
