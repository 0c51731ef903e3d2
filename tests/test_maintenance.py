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


def test_build_indices_and_constraints(spark, graph, tmp_path):
    # one-call fulltext-index bootstrap (graph_data_operations.py:31-96):
    # the reference's three fulltext indexes land as persisted BM25
    # postings indexes; IF-NOT-EXISTS semantics; scores float-exact vs a
    # bm25_search over the same concatenated columns
    from kgspark import fulltext, segments
    from kgspark.communities import build_communities

    tables = dict(graph)
    tables["communities"] = build_communities(
        graph["nodes"], graph["edges"])["communities"].localCheckpoint()
    out_dir = str(tmp_path / "gidx")
    got = mt.build_indices_and_constraints(tables, out_dir)
    assert set(got) == {"node_name_and_summary", "community_name",
                        "edge_name_and_fact"}
    for path in got.values():
        assert segments.committed_gen(path) == 0
    # query parity on the edge index: name+fact concatenated like the
    # reference's field list
    edges = tables["edges"].withColumn(
        "__search_text",
        F.concat_ws(" ", F.coalesce(F.col("name"), F.lit("")),
                    F.coalesce(F.col("fact"), F.lit(""))))
    q = "works for"
    scan = {r["uuid"]: r["score"] for r in fulltext.bm25_search(
        edges, "__search_text", q, limit=50).collect()}
    idx = {r["uuid"]: r["score"] for r in fulltext.bm25_query_indexed(
        spark, got["edge_name_and_fact"], q, limit=50).collect()}
    assert scan and set(idx) == set(scan)
    for k in scan:
        assert idx[k] == pytest.approx(scan[k], abs=1e-12)
    # IF NOT EXISTS: grow an index, re-bootstrap, the generation survives
    delta = (tables["nodes"].limit(3)
             .withColumn("uuid", F.concat(F.lit("new-"), "uuid"))
             .withColumn("__search_text", F.coalesce("name", F.lit(""))))
    fulltext.update_fulltext_index(delta, "__search_text",
                                   got["node_name_and_summary"])
    assert segments.committed_gen(got["node_name_and_summary"]) == 1
    mt.build_indices_and_constraints(tables, out_dir)
    assert segments.committed_gen(got["node_name_and_summary"]) == 1
    # delete_existing=True drops and rebuilds from scratch
    mt.build_indices_and_constraints(tables, out_dir, delete_existing=True)
    assert segments.committed_gen(got["node_name_and_summary"]) == 0
