"""Episode windows, removal with orphan GC, group delete, point-in-time
filters (reference analogs: graph_data_operations.py, graphiti.py:641-704,
search_filters.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kgspark import maintenance as mt
from kgspark.datagen import pages_spark
from kgspark.pipeline import build_graph


@pytest.fixture(scope="module")
def graph(spark):
    out = build_graph(pages_spark(spark, 120, partitions=2), check_text=False,
                      compute_embeddings=False)
    return {k: v.localCheckpoint() for k, v in out.items()
            if k in ("episodes", "edges", "mentions", "nodes")}


def test_retrieve_episodes_window(spark, graph):
    ref = datetime(2024, 1, 5)
    got = mt.retrieve_episodes(graph["episodes"], ref, last_n=3)
    per_group = got.groupBy("group_id").count().collect()
    assert all(r["count"] <= 3 for r in per_group)
    assert got.filter(F.col("valid_at") > ref).count() == 0


def test_episode_context_window(spark):
    pages = pages_spark(spark, 40, partitions=2)
    ctx = mt.episode_context_window(pages)
    rows = ctx.orderBy("warc_ts", "url").collect()
    assert all(len(r["prev_context"]) <= 3 for r in rows)


def test_remove_episode_gc(spark, graph):
    # pick an episode that evidences at least one single-provenance fact
    target = (graph["edges"].filter(F.size("episodes") == 1)
              .select(F.explode("episodes").alias("u")).limit(1)
              .collect()[0]["u"])
    before_edges = graph["edges"].count()
    out = mt.remove_episode(graph, target)
    assert out["episodes"].filter(F.col("uuid") == target).count() == 0
    assert out["edges"].count() < before_edges
    # no dangling provenance
    assert out["edges"].filter(F.array_contains("episodes", target)).count() == 0
    # every remaining node is referenced by a mention or an edge
    refs = (out["mentions"].select(F.col("node_uuid").alias("u"))
            .union(out["edges"].select(F.col("source_node_uuid").alias("u")))
            .union(out["edges"].select(F.col("target_node_uuid").alias("u"))))
    orphans = out["nodes"].join(refs, out["nodes"]["uuid"] == refs["u"], "left_anti")
    assert orphans.count() == 0


def test_delete_group(spark, graph):
    g = graph["nodes"].select("group_id").first()["group_id"]
    out = mt.delete_group(graph, g)
    for t in ("nodes", "edges", "mentions"):
        assert out[t].filter(F.col("group_id") == g).count() == 0


def test_point_in_time_filter(spark, graph):
    edges = graph["edges"]
    closed = edges.filter(F.col("invalid_at").isNotNull()).limit(1).collect()
    if not closed:
        pytest.skip("corpus produced no closed facts")
    e = closed[0]
    # just before invalidation the fact is visible...
    vis = mt.facts_as_of(edges, e["invalid_at"])
    # strictly before invalid_at and at/after valid_at => visible
    mid = e["valid_at"]
    vis_mid = mt.facts_as_of(edges, mid)
    assert vis_mid.filter(F.col("uuid") == e["uuid"]).count() == 1
    # at invalid_at the fact is gone (invalid_at > t fails)
    assert vis.filter(F.col("uuid") == e["uuid"]).count() == 0


def test_build_filter_dnf(spark, graph):
    edges = graph["edges"]
    cond = mt.build_filter({
        "invalid_at": [[("is_null", None)]],
        "edge_types": ["LIKES"],
    })
    got = edges.filter(cond)
    assert got.filter(F.col("name") != "LIKES").count() == 0
    assert got.filter(F.col("invalid_at").isNotNull()).count() == 0
