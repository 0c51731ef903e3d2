"""Priority boost, episode-mention sort, episode→graph lookup
(fork features: search.py:268-314,356-358; graphiti.py:542-567)."""

import pytest
from pyspark.sql import functions as F

from kgspark import search as ks
from kgspark.datagen import pages_spark
from kgspark.pipeline import build_graph


@pytest.fixture(scope="module")
def graph(spark):
    out = build_graph(pages_spark(spark, 100, partitions=2), check_text=False,
                      compute_embeddings=False)
    return {k: v.localCheckpoint() for k, v in out.items()
            if k in ("episodes", "edges", "mentions", "nodes")}


def test_priority_boost(spark, graph):
    base = (graph["edges"].select("uuid")
            .withColumn("rrf_score", F.lit(0.5)))
    boosted = ks.priority_boost(base, graph["edges"], graph["episodes"],
                                F.col("lang") == "en")
    scores = {r["uuid"]: r["rrf_score"] for r in boosted.collect()}
    assert set(scores.values()) <= {0.5, 0.7}
    assert 0.7 in scores.values()  # most pages are en → some boosts applied


def test_episode_mention_sort(spark, graph):
    rows = ks.episode_mention_sort(graph["edges"]).collect()
    sizes = [len(r["episodes"]) for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_nodes_and_edges_by_episode(spark, graph):
    ep = (graph["episodes"].filter(F.size("entity_edges") > 0)
          .limit(1).collect()[0])
    out = ks.nodes_and_edges_by_episode([ep["uuid"]], graph["episodes"],
                                        graph["edges"], graph["mentions"],
                                        graph["nodes"])
    got_edges = {r["uuid"] for r in out["edges"].collect()}
    assert got_edges == set(ep["entity_edges"])
    assert out["nodes"].count() > 0


def test_episodes_by_mentions(spark, graph):
    # reverse of nodes_and_edges_by_episode (get_episodes_by_mentions,
    # search_utils.py:76-88): the provenance episodes of a set of edges
    some_edges = graph["edges"].orderBy("uuid").limit(5).localCheckpoint()
    want = {u for r in some_edges.select("episodes").collect()
            for u in r["episodes"]}
    got = {r["uuid"] for r in
           ks.episodes_by_mentions(some_edges, graph["episodes"],
                                   limit=10_000).collect()}
    assert got == want and got
    # limit takes a deterministic prefix in episode-uuid order
    lim = {r["uuid"] for r in
           ks.episodes_by_mentions(some_edges, graph["episodes"],
                                   limit=2).collect()}
    assert lim == set(sorted(want)[:2])
    # round trip: every returned episode mentions at least one of the edges
    back = ks.nodes_and_edges_by_episode(
        sorted(got), graph["episodes"], graph["edges"], graph["mentions"],
        graph["nodes"])
    edge_ids = {r["uuid"] for r in back["edges"].select("uuid").collect()}
    assert {r["uuid"] for r in some_edges.select("uuid").collect()} <= edge_ids


def test_communities_by_nodes(spark, graph):
    # nodes→communities lookup (get_communities_by_nodes,
    # search_utils.py:118-140): DISTINCT communities with a HAS_MEMBER
    # edge to any queried node
    from kgspark import communities as km
    built = km.build_communities(graph["nodes"], graph["edges"])
    comms = built["communities"].localCheckpoint()
    members = built["community_members"].localCheckpoint()
    some = [r["node_uuid"] for r in
            members.orderBy("node_uuid").limit(3).collect()]
    want = {r["community_uuid"] for r in
            members.filter(F.col("node_uuid").isin(some)).collect()}
    got = ks.communities_by_nodes(some, comms, members)
    got_ids = [r["uuid"] for r in got.collect()]
    assert set(got_ids) == want and want
    assert len(got_ids) == len(set(got_ids))  # DISTINCT like the Cypher
    # a node in no community contributes nothing
    none = ks.communities_by_nodes(["no-such-node"], comms, members)
    assert none.count() == 0
