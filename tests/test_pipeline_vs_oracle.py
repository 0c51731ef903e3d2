"""End-to-end gate: Spark DAG vs single-process oracle on the same synthetic
corpus (FIXTURES.md §2/§5 'unit' profile; BASELINE.json metric:
triple P/R >= 0.95 vs reference-semantics oracle, exact temporal fields).
"""

from datetime import datetime

import pytest

from kgspark.datagen import pages_pandas, pages_spark
from kgspark.oracle import run_oracle
from kgspark.pipeline import build_graph

N_PAGES = 240
BATCH_TS = datetime(2025, 1, 1)


@pytest.fixture(scope="module")
def outputs(spark):
    pages = pages_spark(spark, N_PAGES, partitions=4)
    out = build_graph(pages, BATCH_TS)
    oracle = run_oracle(pages_pandas(N_PAGES))
    return out, oracle


def _ts(v):
    """pandas NaT/Timestamp -> None/naive datetime for set comparison."""
    import pandas as pd
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def _triple_set(rows):
    return {(r["group_id"], r["source_node_uuid"], r["name"],
             r["target_node_uuid"], _ts(r["valid_at"]), _ts(r["invalid_at"]),
             _ts(r["expired_at"]) is not None) for r in rows}


def test_text_byte_identity(outputs):
    out, _ = outputs
    assert out["text_mismatches"].count() == 0


def test_triple_precision_recall(outputs):
    out, oracle = outputs
    spark_rows = [r.asDict() for r in out["edges"].collect()]
    oracle_rows = oracle["edges"].to_dict("records")
    s, o = _triple_set(spark_rows), _triple_set(oracle_rows)
    assert s and o
    precision = len(s & o) / len(s)
    recall = len(s & o) / len(o)
    assert precision >= 0.95, f"precision {precision:.3f}; only-spark: {sorted(s - o)[:5]}"
    assert recall >= 0.95, f"recall {recall:.3f}; only-oracle: {sorted(o - s)[:5]}"


def test_node_components_match(outputs):
    out, oracle = outputs
    s_nodes = {(r["group_id"], r["uuid"]) for r in out["nodes"].collect()}
    o_nodes = {(r["group_id"], r["uuid"]) for r in oracle["nodes"].to_dict("records")}
    inter = len(s_nodes & o_nodes)
    assert inter / len(s_nodes) >= 0.95
    assert inter / len(o_nodes) >= 0.95


def test_mentions_match(outputs):
    out, oracle = outputs
    s = {(r["episode_uuid"], r["node_uuid"]) for r in out["mentions"].collect()}
    o = {(r["episode_uuid"], r["node_uuid"])
         for r in oracle["mentions"].to_dict("records")}
    inter = len(s & o)
    assert inter / len(s) >= 0.95 and inter / len(o) >= 0.95


def test_invalidation_records_match(outputs):
    out, oracle = outputs
    s = {(r["edge_uuid"], r["invalid_at"], r["caused_by_edge_uuid"])
         for r in out["edge_invalidations"].collect()}
    o = {(r["edge_uuid"], r["invalid_at"], r["caused_by_edge_uuid"])
         for r in oracle["edge_invalidations"].to_dict("records")}
    assert o, "corpus must exercise contradictions"
    inter = len(s & o)
    assert inter / max(len(s), 1) >= 0.9 and inter / len(o) >= 0.9


def test_provenance_merge(outputs):
    # duplicate facts across pages must merge episodes (edge_operations.py:186-187)
    out, _ = outputs
    multi = out["edges"].where("size(episodes) > 1").count()
    assert multi > 0


def test_previous_instance_chains(outputs):
    out, _ = outputs
    assert out["previous_instance_edges"].count() > 0


def test_mixed_episode_sources_flow(outputs):
    # round-3: EpisodeType variants in the default corpus. The episodes
    # table carries the source + per-source description (nodes.py:133-149),
    # message speakers become Person nodes, and a JSON restatement of a text
    # fact provenance-merges across sources (same norm_fact dedup class).
    out, _ = outputs
    eps = {r["source"]: r["source_description"]
           for r in out["episodes"].select("source", "source_description")
                                   .distinct().collect()}
    assert eps == {"text": "web crawl", "message": "chat log",
                   "json": "structured payload"}
    # at least one edge's provenance spans a json AND a text episode
    from pyspark.sql import functions as F
    src_of = out["episodes"].select(F.col("uuid").alias("ep"), "source")
    spans = (out["edges"].select("uuid", F.explode("episodes").alias("ep"))
             .join(src_of, "ep")
             .groupBy("uuid").agg(F.collect_set("source").alias("srcs"))
             .where(F.array_contains("srcs", "json")
                    & F.array_contains("srcs", "text")))
    assert spans.count() > 0
