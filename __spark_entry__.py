"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction DAG on a deterministic
synthetic pages table (BASELINE.json input_hint shape) and returns the
resulting bi-temporal edges.

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; each has a DuckDB ``oracle_sql()`` twin unless the operator is
not SQL-expressible (the KG pipeline itself, which is instead verified
against the single-process oracle in tests/test_pipeline_vs_oracle.py).

Numeric parity notes: monetary aggregates go through DECIMAL(18,4) so Spark
and DuckDB agree bit-for-bit after round(); float outputs are rounded to
stable precision.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KG_PAGES = 240  # deterministic synthetic corpus size for the KG queries


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col):
    return F.col(col).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (extract → link → canonicalize →
    dedup → bi-temporal) over the synthetic Common-Crawl-style pages table;
    returns the edges table (without embeddings, for smoke speed)."""
    from kgspark.datagen import pages_spark
    from kgspark.pipeline import build_graph

    pages = pages_spark(spark, 500)
    out = build_graph(pages, check_text=False, compute_embeddings=False)
    return out["edges"].select(
        "uuid", "source_node_uuid", "target_node_uuid", "name", "fact",
        "group_id", "created_at", "valid_at", "invalid_at", "expired_at")


# ---------------------------------------------------------------------------
# KG pipeline queries (non-SQL-expressible: verified vs the oracle in tests;
# driver records rows-only checks)
# ---------------------------------------------------------------------------

_KG_CACHE: dict[str, dict] = {}


def _kg(spark: SparkSession):
    # one shared build per session: the kg_* queries are views over the
    # same DAG (driver runs them one by one). The build also materializes
    # the extraction intermediates to parquet so the kg_* DuckDB oracles
    # (kgspark/kg_oracle.py) can recompute linking / closure / dedup /
    # temporal independently in SQL.
    # Keyed by applicationId, not id(spark): a fresh session allocated at
    # a recycled CPython address must not be served checkpointed
    # DataFrames bound to a dead SparkContext.
    key = spark.sparkContext.applicationId
    if key not in _KG_CACHE:
        from kgspark import kg_oracle
        from kgspark.datagen import pages_spark
        from kgspark.pipeline import build_graph
        pages = pages_spark(spark, KG_PAGES)
        out = build_graph(pages, check_text=False, compute_embeddings=True,
                          expose_intermediates=True)
        # underscore keys are already (lazily) checkpointed by build_graph;
        # eager-checkpointing them again would re-run the extraction scan
        cached = {k: (v if k.startswith("_") else v.localCheckpoint())
                  for k, v in out.items()}
        kg_oracle.materialize(spark, pages, cached["edges"],
                              intermediates=cached)
        _KG_CACHE[key] = cached
    return _KG_CACHE[key]


def q_kg_edges(spark, sf_dir):
    return _kg(spark)["edges"].select(
        "uuid", "source_node_uuid", "target_node_uuid", "name", "fact",
        "group_id", "created_at", "valid_at", "invalid_at", "expired_at")


def q_kg_nodes(spark, sf_dir):
    # labels is array<string> in the stored table; the driver canonicalizer
    # needs scalar columns, so project a sorted joined form here
    return _kg(spark)["nodes"].select(
        "uuid", "name", "group_id",
        F.array_join(F.array_sort("labels"), "|").alias("labels"),
        "created_at", "summary")


def q_kg_mentions(spark, sf_dir):
    return _kg(spark)["mentions"]


def q_kg_invalidations(spark, sf_dir):
    return _kg(spark)["edge_invalidations"]


def q_kg_previous_instances(spark, sf_dir):
    return _kg(spark)["previous_instance_edges"]


def q_kg_communities(spark, sf_dir):
    from kgspark.communities import build_communities
    out = _kg(spark)
    return build_communities(out["nodes"], out["edges"])["communities"]


def q_kg_bfs(spark, sf_dir):
    # 2-hop BFS from the most-mentioned node (search_utils.py:274-326)
    from kgspark import search as ks
    out = _kg(spark)
    top = (out["mentions"].groupBy("node_uuid").count()
           .orderBy(F.desc("count"), "node_uuid").limit(1).collect()[0]["node_uuid"])
    return ks.bfs_nodes(out["edges"], [top], depth=2).orderBy("uuid")


def q_kg_node_distance(spark, sf_dir):
    # shortest-path (BFS-distance) rerank from the most-mentioned node
    # (node_distance_reranker, search_utils.py:735-772)
    from kgspark import search as ks
    out = _kg(spark)
    top = (out["mentions"].groupBy("node_uuid").count()
           .orderBy(F.desc("count"), "node_uuid").limit(1)
           .collect()[0]["node_uuid"])
    return ks.node_distance_rerank(out["nodes"].select("uuid"),
                                   out["edges"], top, limit=20)


def q_add_triplets(spark, sf_dir):
    # direct triple assertion (add_triplet analog, graphiti.py:569-607):
    # asserted facts route through the SAME dedup + temporal operators;
    # the DuckDB oracle recomputes both over the same literal rows
    from datetime import datetime

    import pandas as pd

    from kgspark import triplets
    rows = [
        ("g0", "Ana Ruiz", "LIVES_IN", "Quito City", datetime(2024, 1, 1)),
        ("g0", "Ana Ruiz", "LIVES_IN", "Lima City", datetime(2024, 6, 1)),
        ("g0", "Ana Ruiz", "LIVES_IN", "Quito City", datetime(2024, 1, 1)),
        ("g0", "Bo Chen", "WORKS_FOR", "Glowco", datetime(2024, 2, 1)),
        ("g0", "Bo Chen", "LEFT_JOB", "Glowco", datetime(2024, 9, 1)),
    ]
    t = spark.createDataFrame(pd.DataFrame(
        rows, columns=["group_id", "subject", "predicate", "object",
                       "valid_at_explicit"]))
    out = triplets.add_triplets(t, datetime(2025, 1, 1))
    return out["edges"].select(
        "uuid", "source_node_uuid", "target_node_uuid", "name", "fact",
        "group_id", "valid_at", "invalid_at").orderBy("uuid")


_KG_FT_INDEX: dict[str, str] = {}


def _kg_ft_index(spark, nodes):
    # Persisted BM25 postings index over the nodes table, one per session:
    # the hybrid orchestrator's fulltext legs run against it — the
    # reference's search always reads Lucene indexes built once
    # (search_utils.py:143-194 over graph_data_operations.py:73-80), never
    # re-aggregating the corpus per query. Scores are float-exact vs the
    # scan path (test_bm25_indexed_matches_scan), so the DuckDB oracles
    # are unchanged.
    import atexit
    import shutil
    import tempfile

    from kgspark import fulltext as flt
    key = spark.sparkContext.applicationId
    path = _KG_FT_INDEX.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="kgspark_kg_ft_idx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        flt.build_fulltext_index(nodes, "name", path, num_buckets=32)
        _KG_FT_INDEX[key] = path
    return path


def q_kg_hybrid_search(spark, sf_dir):
    # hybrid fulltext ∪ cosine → RRF over the nodes table (search.py:73-157);
    # reuses the session-cached build (embeddings included) instead of
    # constructing a second graph. The fulltext leg reads the persisted
    # postings index (r4 verdict next #1) — no corpus tokenize-aggregate in
    # the read-side plan (asserted by tools/explain_check.py).
    from kgspark import search as ks
    nodes = _kg(spark)["nodes"]
    out = ks.hybrid_search(nodes, "name", "name_embedding",
                           "Priya Sharma", ks.NODE_HYBRID_SEARCH_RRF,
                           fulltext_index_path=_kg_ft_index(spark, nodes))
    # stable precision for the driver's value hash (sum order differs
    # between Spark partial aggregation and the DuckDB oracle)
    return out.select("uuid", F.round("rrf_score", 8).alias("rrf_score"))


def q_kg_hybrid_node_search(spark, sf_dir):
    # batch multi-query node lookup (hybrid_node_search,
    # search_utils.py:564-631): 2 bm25 legs + 2 cosine legs, each capped at
    # 2*limit, RRF-fused, deduped by uuid, NO global limit; the DuckDB
    # oracle recomputes all four legs + fusion from the materialized
    # node/embedding tables
    from kgspark import search as ks
    from kgspark.kg_oracle import HNS_LIMIT, HNS_QUERIES
    from kgspark.textcore import hash_embedding
    nodes = _kg(spark)["nodes"]
    out = ks.hybrid_node_search(
        nodes, HNS_QUERIES,
        [hash_embedding(q) for q in HNS_QUERIES], limit=HNS_LIMIT,
        fulltext_index_path=_kg_ft_index(spark, nodes))
    return out.select("uuid", F.round("rrf_score", 8).alias("rrf_score"))


def q_kg_provenance_sort(spark, sf_dir):
    # final edge ordering by provenance count (episode_mention_sort,
    # search.py:356-358); the oracle recomputes the merged provenance SET
    # per duplicate class, so this is the hard driver check on dedup's
    # episodes set-union (edge_operations.py:186-187)
    from kgspark import search as ks
    out = ks.episode_mention_sort(_kg(spark)["edges"])
    return out.select(
        "uuid", F.size("episodes").cast("long").alias("n_episodes"),
        F.array_join("episodes", ",").alias("episodes"))


def q_kg_priority_boost(spark, sf_dir):
    # fork-added priority boost (search.py:268-314): +0.2 on any result
    # whose provenance includes a priority episode (here: lang == 'en');
    # base score = provenance count so the oracle is exact
    from kgspark import search as ks
    out = _kg(spark)
    res = out["edges"].select(
        "uuid", F.size("episodes").cast("double").alias("score"))
    boosted = ks.priority_boost(res, out["edges"], out["episodes"],
                                F.col("lang") == "en", score_col="score")
    return boosted.select("uuid", F.round("score", 4).alias("score"))


def q_kg_incremental_attach(spark, sf_dir):
    # incremental community attach under the hard gate (update_community
    # analog, community_operations.py:343-448): nodes whose canonical
    # uuid's last hex digit is in INCREMENT_HEX are the "new arrivals";
    # old labels = LP over the old-only subgraph (deterministic local
    # fixpoint — the SAME computation materialize() writes for the
    # oracle); the DuckDB twin re-derives the modal-neighbor rule, the
    # 3-round cascade AND the unassigned remainder in SQL over
    # lp_labels_old.parquet + edges_final
    from kgspark import communities
    from kgspark.kg_oracle import INCREMENT_HEX, INCREMENT_ROUNDS

    out = _kg(spark)
    edges, nodes = out["edges"], out["nodes"]
    old_edges = edges.filter(
        ~F.substring("source_node_uuid", 32, 1).isin(*INCREMENT_HEX)
        & ~F.substring("target_node_uuid", 32, 1).isin(*INCREMENT_HEX))
    labels_old = communities.label_propagation(
        communities.adjacency(old_edges))
    inc = communities.update_community(
        nodes, labels_old, communities.adjacency(edges),
        max_rounds=INCREMENT_ROUNDS)
    attached = inc["labels"].join(labels_old, ["group_id", "uuid"],
                                  "left_anti")
    return (attached.withColumn("status", F.lit("attached"))
            .unionByName(
                inc["unassigned"]
                .withColumn("community_id", F.lit(None).cast("string"))
                .withColumn("status", F.lit("unassigned"))))


def q_kg_typed_attributes(spark, sf_dir):
    # attribute VALUES extracted from episode content via registry patterns
    # (dynamic-Pydantic fill analog, node_operations.py:303-358), with
    # latest-(warc_ts)-wins override of the schema default; the DuckDB
    # oracle re-derives the typed entity set AND the per-attribute regexp
    # extraction + recency rule independently from the same literal pages
    from datetime import datetime

    import pandas as pd

    from kgspark.entity_types import EntityType, EntityTypeRegistry
    from kgspark.kg_oracle import KG_ATTR_PAGES
    from kgspark.pipeline import build_graph, raw_episodes_to_pages

    registry = EntityTypeRegistry(types=(
        EntityType(name="Metro", suffixes=("City",),
                   attributes=(("country", "unknown"), ("tier", "metro")),
                   extract=(("country",
                             r"{name} is located in ([A-Z][a-z]+)"),)),
    ))
    eps = spark.createDataFrame(pd.DataFrame(
        [(u, t, datetime.fromisoformat(ts), "text", "g0")
         for u, ts, t in KG_ATTR_PAGES],
        columns=["name", "content", "reference_time", "source", "group_id"]))
    out = build_graph(raw_episodes_to_pages(eps), datetime(2025, 1, 1),
                      check_text=False, compute_embeddings=False,
                      entity_types=registry)
    return (out["nodes"].filter(F.array_contains("labels", "Metro"))
            .select("name", F.explode("attributes").alias("k", "v"))
            .filter(~F.col("k").isin("entity_type", "mention_count")))


def q_kg_message_speakers(spark, sf_dir):
    # EpisodeType dispatch gate (message variant): speaker mentions from the
    # Spark extraction (rule 1 of prompts/extract_nodes.py:91, dispatched at
    # node_operations.py:177-187) vs a DuckDB re-derivation from RAW page
    # content (line split + colon-prefix regex) — verifies the dispatch and
    # the speaker rule end-to-end, not just downstream algebra
    out = _kg(spark)
    return (out["_mentions_raw"].filter(F.col("is_speaker"))
            .select("url", "name").distinct())


def _kg_json_urls(out):
    return (out["episodes"].filter(F.col("source") == "json")
            .select(F.col("uuid").alias("url")))


def q_kg_json_mentions(spark, sf_dir):
    # EpisodeType dispatch gate (json variant): entity fields extracted by
    # the json rules (prompts/extract_nodes.py:111-134) vs DuckDB
    # json_keys/json_extract over raw content
    out = _kg(spark)
    return (out["_mentions_raw"].join(_kg_json_urls(out), "url")
            .select("url", "name").distinct())


def q_kg_json_triples(spark, sf_dir):
    # json relation-key triples + explicit 'since' dates vs a pure-SQL
    # re-derivation (textcore.extract_json_triples rules)
    out = _kg(spark)
    return (out["_triples_raw"].join(_kg_json_urls(out), "url")
            .select("url", "subject", "predicate", "object", "fact",
                    "valid_at_explicit").distinct())


# ---------------------------------------------------------------------------
# Aggregations / joins / top-k (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    # TPC-H Q1 shape: the groupBy/agg workhorse under every count/sum in the
    # DAG (mention counts, provenance sizes)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))), 2)
            .cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_orders(spark, sf_dir):
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))), 2)
             .cast("double").alias("revenue"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderkey").alias("orderkey"), "o_orderdate", "revenue")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


def q_regional_revenue(spark, sf_dir):
    # FACT-FIRST join shape (r5): the dimension chain (region ⋈ nation ⋈
    # customer, pruned to 2 columns) joins INTO the lineitem⋈orders stream
    # instead of accumulating left-to-right from the 5-row region table.
    # The old dim-first declaration made Catalyst broadcast every right
    # side — including the pruned LINEITEM fact table (600k-row hash
    # relation built on the driver) — while streaming 5 rows. Fact-first
    # lets AQE pick per-join strategy from runtime sizes: at sf0.1 it
    # broadcasts orders + dims (measured 2.7 s -> 2.1 s best-of-3); at
    # 100 TB the same declaration shuffles li⋈o and li⋈customer-chain on
    # their keys — no hint pins a customer-sized broadcast.
    r, n = _t(spark, sf_dir, "region"), _t(spark, sf_dir, "nation")
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (r.join(n, r["r_regionkey"] == n["n_regionkey"])
            .join(c, n["n_nationkey"] == c["c_nationkey"])
            .select("r_name", "c_custkey"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(dims, o["o_custkey"] == dims["c_custkey"])
        .groupBy("r_name")
        .agg(F.round(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))), 2)
             .cast("double").alias("revenue"),
             F.countDistinct("o_orderkey").alias("n_orders"))
        .orderBy("r_name")
    )


def q_point_lookup(spark, sf_dir):
    # uuid-list point lookup analog (nodes.py:178-284): IN-list filter
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey").isin(1, 2, 3, 4, 5, 6, 7))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q_orphan_customers(spark, sf_dir):
    # orphan GC anti-join (remove_episode, graphiti.py:641-704)
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= "1997-01-01")
    return (
        c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    )


def q_pagination(spark, sf_dir):
    # cursor pagination analog (nodes.py:250-274): row_number slice
    p = _t(spark, sf_dir, "part")
    w = Window.orderBy("p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 40))
        .select("rn", "p_partkey", "p_name")
    )


# ---------------------------------------------------------------------------
# Window-function operators (temporal pass / dedup / context window analogs,
# SURVEY.md §2.4/§2.8)
# ---------------------------------------------------------------------------

def q_temporal_close(spark, sf_dir):
    # the bi-temporal lead-window: each (user, event_type) assertion is
    # closed by the next one (invalid_at = lead(ts)) — kgspark/temporal.py
    # semantics over a driver-provided table
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("invalid_at", F.lead("ts").over(w))
        .withColumn("is_current", F.col("invalid_at").isNull())
        .select("event_id", "user_id", "event_type",
                F.col("ts").alias("valid_at"), "invalid_at", "is_current")
        .orderBy("event_id")
    )


def q_dedup_keep_first(spark, sf_dir):
    # duplicate-class keep-first (dedupe_extracted_edge analog)
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"),
                F.col("ts").alias("first_ts"))
        .orderBy("user_id", "event_type")
    )


def q_context_window(spark, sf_dir):
    # previous-episodes context (EPISODE_WINDOW_LEN=3,
    # graph_data_operations.py:104-159): lag window of prior event types
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, -1)
    return (
        e.withColumn("prev_context",
                     F.array_join(F.collect_list("event_type").over(w), "|"))
        .select("event_id", "user_id", "prev_context")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Search / rerank operators (SURVEY.md §2.6)
# ---------------------------------------------------------------------------

def q_mention_count_rerank(spark, sf_dir):
    # episode_mentions_reranker (search_utils.py:775-799)
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_mentions"))
        .orderBy(F.desc("n_mentions"), "user_id").limit(20)
    )


# per-(sf_dir) persisted fulltext index paths — built once per process, the
# way a real deployment builds the index once and queries it many times
_BM25_INDEX_PATHS: dict[str, str] = {}


def q_bm25_indexed(spark, sf_dir):
    # Lucene-formula BM25 (IDF + length norm, k1=1.2 b=0.75) over documents
    # through the PERSISTED fulltext index (build_indices_and_constraints
    # analog, graph_data_operations.py:73-80; queried per-search like
    # search_utils.py:143-194): postings partitioned by term-hash bucket,
    # the query scans only its terms' partitions. Same DuckDB oracle as the
    # scan-side bm25_search, which pytest pins to this path to float
    # precision (test_bm25_indexed_matches_scan).
    import atexit
    import shutil
    import tempfile

    from kgspark import fulltext as flt
    path = _BM25_INDEX_PATHS.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="kgspark_bm25_idx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        docs = _t(spark, sf_dir, "documents")
        # exercise the INCREMENTAL maintenance path (r4: update_fulltext_
        # index, the batch analog of the reference upserting episodes into
        # Lucene indexes built once): gen 0 = ~2/3 of the corpus, gen 1 =
        # the rest, gen 2 = a slice RE-INGESTED verbatim (tombstones its
        # gen-0/1 rows). The live index == the full table, so the oracle
        # below scores the plain corpus — hash-green proves the
        # generation/tombstone algebra, not just the formula.
        third = F.pmod(F.abs(F.hash("doc_id")), F.lit(3))
        flt.build_fulltext_index(docs.filter(third != 0), "text",
                                 path, id_col="doc_id")
        flt.update_fulltext_index(docs.filter(third == 0), "text",
                                  path, id_col="doc_id")
        flt.update_fulltext_index(docs.filter(third == 1), "text",
                                  path, id_col="doc_id")
        _BM25_INDEX_PATHS[sf_dir] = path
    return (flt.bm25_query_indexed(spark, path, "scan join filter",
                                   limit=25, id_col="doc_id")
            .select("doc_id", F.round("score", 6).alias("score")))


def q_json_extract(spark, sf_dir):
    # JSON episode content passthrough (prompts/extract_nodes.py:111-134)
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k_val", F.get_json_object("props", "$.k"))
        .groupBy("k_val").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_val")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline ops over `documents` (dedup / text analysis)
# ---------------------------------------------------------------------------

def q_exact_dup_docs(spark, sf_dir):
    # exact dedup via content hash
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("text_hash")
    )


def q_minhash_fingerprint(spark, sf_dir):
    # document fingerprinting: 4-seed minhash signature over tokens (the
    # same md5-based minhash family as entity-linking LSH)
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(F.expr(r"regexp_extract_all(text, '[a-z0-9]+', 0)"))
    cols = [F.array_min(F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"s{i}|"), t))))
            .alias(f"mh{i}") for i in range(4)]
    return d.select("doc_id", *cols).orderBy("doc_id")


def q_neardup_pairs(spark, sf_dir):
    # MinHash-LSH near-duplicate candidate pairs: docs sharing any of the 4
    # fingerprint bands (band groups capped at 20 to bound the pair
    # explosion; bands melted to rows → one shuffle for all bands)
    from kgspark import datapipe as dp
    d = _t(spark, sf_dir, "documents")
    return (dp.neardup_pairs(d)
            .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
            .orderBy("doc_a", "doc_b"))


def q_ngram_jaccard(spark, sf_dir):
    # n-gram (token-set) Jaccard over the LSH candidate pairs; the pair set
    # is materialized once instead of recomputing the LSH subtree inside
    # each join branch
    from kgspark import datapipe as dp
    d = _t(spark, sf_dir, "documents")
    pairs = dp.neardup_pairs(d).localCheckpoint()
    return (dp.ngram_jaccard(d, pairs)
            .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"),
                    F.round("jaccard", 4).alias("jaccard"))
            .orderBy("doc_a", "doc_b"))


def q_point_in_time(spark, sf_dir):
    # bi-temporal as-of snapshot (search_filters.py predicates + the
    # kgspark/maintenance.facts_as_of shape): each (user, event_type)
    # assertion is valid from its ts until the next assertion; report the
    # assertion in force at the reference instant
    as_of = "2024-01-04 00:00:00"
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("invalid_at", F.lead("ts").over(w))
        .filter((F.col("ts") <= as_of)
                & (F.col("invalid_at").isNull() | (F.col("invalid_at") > as_of)))
        .select("user_id", "event_type", F.col("event_id").alias("current_event_id"),
                F.col("ts").alias("valid_at"), "invalid_at")
        .orderBy("user_id", "event_type")
    )


def q_quality_score(spark, sf_dir):
    from kgspark import datapipe as dp
    d = _t(spark, sf_dir, "documents")
    q = dp.quality_score(d)
    return q.select(
        F.col("doc_id"), "n_chars", "n_tokens", "n_unique_tokens",
        F.round("type_token_ratio", 4).alias("ttr"),
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("digit_ratio", 4).alias("digit_ratio"),
    ).orderBy("doc_id")


def q_token_counts(spark, sf_dir):
    from kgspark import datapipe as dp
    return dp.token_counts(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_lang_id_multi(spark, sf_dir):
    from kgspark import datapipe as dp
    return dp.language_id(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_rolling_fingerprint(spark, sf_dir):
    from kgspark import datapipe as dp
    return dp.rolling_fingerprint(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_simhash_docs(spark, sf_dir):
    # 64-bit SimHash (vectorized Arrow UDF) — not SQL-expressible in DuckDB
    from kgspark import datapipe as dp
    return dp.simhash(_t(spark, sf_dir, "documents")).orderBy("id")


def q_embedding_neardups(spark, sf_dir):
    # banded hyperplane-LSH cosine near-dups with PLANTED duplicates: copies
    # of vec_id<25 re-inserted as vec_id+10000, so the check has a known
    # non-empty answer (the r1 version returned 0 rows — vacuous). Exact
    # copies always collide in every band, so LSH recall is provably 1 here
    # and the brute-force DuckDB oracle is an exact twin.
    from kgspark import datapipe as dp
    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter("vec_id < 25").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    allv = emb.select("vec_id", "embedding").unionByName(planted)
    return (dp.embedding_neardups(allv, threshold=0.8)
            .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
            .orderBy("id_a", "id_b"))


def q_ann_lsh_topk(spark, sf_dir):
    # LSH-bucketed ANN run at full probe width (probe_hamming = n_planes —
    # the nprobe=nlist exact regime, exercising the bucket path end-to-end
    # while staying oracle-checkable); tests/test_datapipe.py pins recall
    # for the approximate probe setting
    from kgspark import datapipe as dp
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return (dp.ann_lsh(emb.filter("vec_id <> 0"), list(qv), k=10,
                       probe_hamming=12)
            .select("id", F.round("cos", 4).alias("cos"))
            .orderBy(F.desc("cos"), "id"))


_IVF_INDEX_PATHS: dict[str, str] = {}


def q_ann_ivf_topk(spark, sf_dir):
    # IVF ANN over the PERSISTED cluster-partitioned index (data-dependent
    # coarse quantizer: deterministic distributed k-means; queries prune to
    # nprobe cluster partitions at the scan), run at nprobe == n_clusters —
    # the exact regime, so the brute-force oracle applies regardless of
    # where the quantizer was trained. Like bm25_indexed, the index is
    # built over ~2/3 of the vectors, the rest fold in through
    # update_ivf_index (frozen-centroid assign, the FAISS add path), and a
    # slice is re-ingested verbatim (tombstoning its old generation): the
    # live index == the full table, so hash-green covers the
    # generation/tombstone algebra too. tests/test_datapipe.py pins recall
    # and partition-pruning for the approximate (nprobe < n_clusters)
    # setting.
    import atexit
    import shutil
    import tempfile

    from kgspark import datapipe as dp
    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    path = _IVF_INDEX_PATHS.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="kgspark_ivf_idx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        cand = emb.filter("vec_id <> 0")
        third = F.pmod(F.abs(F.hash("vec_id")), F.lit(3))
        dp.build_ivf_index(cand.filter(third != 0), path, n_clusters=8)
        dp.update_ivf_index(cand.filter(third == 0), path)
        dp.update_ivf_index(cand.filter(third == 1), path)
        _IVF_INDEX_PATHS[sf_dir] = path
    return (dp.ann_ivf_indexed(spark, path, qv, k=10, nprobe=8)
            .select("id", F.round("cos", 4).alias("cos"))
            .orderBy(F.desc("cos"), "id"))


def q_multimodal_features(spark, sf_dir):
    # multimodal plumbing: binary column -> feature rows (decode stubbed,
    # Spark contract real); binary payload derived from documents text
    from kgspark import datapipe as dp
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.encode(F.col("text"), "utf-8").alias("blob"))
    return dp.extract_image_features(d, "id", "blob").orderBy("id")


def q_audio_features(spark, sf_dir):
    # REAL WAV-PCM decode (stdlib wave + numpy, datapipe.extract_audio_
    # features): the query synthesizes one square-wave WAV blob per doc
    # with doc_id-derived parameters, so every decoded feature has an exact
    # closed form the DuckDB oracle recomputes (rms of a +-v square wave is
    # exactly v/32768 — IEEE-exact, no rounding needed)
    import io
    import wave as _wave

    import numpy as np
    import pandas as pd

    from kgspark import datapipe as dp

    def gen(batches):
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                sr, n = 8000, 4000 + (did % 10) * 400
                half = 4 + (did % 5)
                a = (did % 9 + 1) / 10.0
                v = int(np.floor(a * 32767.0 + 0.5))
                sign = ((np.arange(n) // half) % 2 == 0)
                x = np.where(sign, v, -v).astype("<i2")
                buf = io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(x.tobytes())
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id") \
        .mapInPandas(gen, "id long, blob binary")
    return (dp.extract_audio_features(d, "id", "blob")
            .select("id", "sample_rate", "n_channels", "n_samples",
                    "duration_sec", "rms", "n_zero_crossings"))


def q_image_decode(spark, sf_dir):
    # REAL binary-PPM decode (datapipe.decode_images): constant-color P6
    # blobs with doc_id-derived dims/colors -> exact closed-form oracle
    import pandas as pd

    from kgspark import datapipe as dp

    def gen(batches):
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 8, 3 + did % 5
                r, g, b = did % 256, (did * 7) % 256, (did * 13) % 256
                blobs.append(f"P6\n# synth\n{w} {h}\n255\n".encode()
                             + bytes([r, g, b]) * (w * h))
            yield pd.DataFrame({"id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id") \
        .mapInPandas(gen, "id long, blob binary")
    return (dp.decode_images(d, "id", "blob")
            .select("id", "width", "height", "mean_r", "mean_g", "mean_b",
                    "decode_status"))


def q_corpus_dedup(spark, sf_dir):
    # end-to-end corpus cleaning decision: exact + LSH near-dup edges ->
    # connected components -> canonical (min) doc id per duplicate cluster;
    # the oracle recomputes the closure with a recursive CTE
    from kgspark import datapipe as dp
    return dp.corpus_dedup(_t(spark, sf_dir, "documents")) \
        .orderBy("doc_id")


def q_sessionization(spark, sf_dir):
    # gap-based sessionization via native session_window (the streaming
    # twin unchanged); oracle = lag/cumsum session assignment in SQL
    from kgspark.streaming import sessionize
    return sessionize(_t(spark, sf_dir, "events"))


def q_ann_cosine_topk(spark, sf_dir):
    # brute-force cosine top-k over the embeddings table (similarity search
    # baseline; edge_similarity_search analog, search_utils.py:197-271)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    dot = F.aggregate(F.zip_with(F.col("ev"), F.col("qv"), lambda x, y: x * y),
                      F.lit(0.0), lambda a, v: a + v)
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                                       F.lit(0.0), lambda a, v: a + v))  # noqa: E731
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
        .crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(dot / (nrm(F.col("ev")) * nrm(F.col("qv"))), 4))
        .select("vec_id", "cos")
        .orderBy(F.desc("cos"), "vec_id")
        .limit(10)
    )


def q_mmr_topk(spark, sf_dir):
    # MMR diversity rerank over a cosine-retrieved candidate set
    # (maximal_marginal_relevance, search_utils.py:802-815): closed-form
    # lam*sim(q,c) - (1-lam)*max_sim(c, other candidates), so the DuckDB
    # oracle can recompute it exactly. Candidate boundary is stabilized by
    # selecting on ROUNDED cosine with a vec_id tie-break; all candidates
    # are returned (no second top-k boundary).
    from kgspark import search as ks
    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    dot = F.aggregate(F.zip_with(F.col("ev"), F.col("qv"), lambda x, y: x * y),
                      F.lit(0.0), lambda a, v: a + v)
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                                       F.lit(0.0), lambda a, v: a + v))  # noqa: E731
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
        .crossJoin(F.broadcast(q))
        .withColumn("rcos", F.round(dot / (nrm(F.col("ev")) * nrm(F.col("qv"))), 4))
        .orderBy(F.desc("rcos"), "vec_id")
        .limit(64)
        .select(F.col("vec_id").cast("string").alias("uuid"),
                F.col("ev").alias("emb"))
    )
    out = ks.mmr_rerank(cand, "emb", qv, limit=64)
    return out.select("uuid", F.round("mmr", 4).alias("mmr"))


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_edges": q_kg_edges,
        "kg_nodes": q_kg_nodes,
        "kg_mentions": q_kg_mentions,
        "kg_invalidations": q_kg_invalidations,
        "kg_previous_instances": q_kg_previous_instances,
        "kg_communities": q_kg_communities,
        "kg_bfs": q_kg_bfs,
        "kg_node_distance": q_kg_node_distance,
        "kg_hybrid_search": q_kg_hybrid_search,
        "kg_hybrid_node_search": q_kg_hybrid_node_search,
        "kg_provenance_sort": q_kg_provenance_sort,
        "kg_priority_boost": q_kg_priority_boost,
        "kg_message_speakers": q_kg_message_speakers,
        "kg_json_mentions": q_kg_json_mentions,
        "kg_json_triples": q_kg_json_triples,
        "kg_typed_attributes": q_kg_typed_attributes,
        "kg_incremental_attach": q_kg_incremental_attach,
        "add_triplets": q_add_triplets,
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "regional_revenue": q_regional_revenue,
        "point_lookup": q_point_lookup,
        "orphan_customers": q_orphan_customers,
        "pagination": q_pagination,
        "temporal_close": q_temporal_close,
        "dedup_keep_first": q_dedup_keep_first,
        "context_window": q_context_window,
        "mention_count_rerank": q_mention_count_rerank,
        "bm25_indexed": q_bm25_indexed,
        "json_extract": q_json_extract,
        "exact_dup_docs": q_exact_dup_docs,
        "minhash_fingerprint": q_minhash_fingerprint,
        "neardup_pairs": q_neardup_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "mmr_topk": q_mmr_topk,
        "point_in_time": q_point_in_time,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "lang_id_multi": q_lang_id_multi,
        "rolling_fingerprint": q_rolling_fingerprint,
        "simhash_docs": q_simhash_docs,
        "embedding_neardups": q_embedding_neardups,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "multimodal_features": q_multimodal_features,
        "audio_features": q_audio_features,
        "image_decode": q_image_decode,
        "sessionization": q_sessionization,
        "corpus_dedup": q_corpus_dedup,
    }


def oracle_sql() -> dict[str, str]:
    from kgspark import kg_oracle
    dec = "::DECIMAL(18,4)"
    rev = f"l_extendedprice{dec} * (1{dec} - l_discount{dec})"
    return kg_oracle.oracle_queries() | {
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity{dec}), 2)::DOUBLE AS sum_qty,
                   round(sum(l_extendedprice{dec}), 2)::DOUBLE AS sum_base_price,
                   round(sum({rev}), 2)::DOUBLE AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": f"""
            SELECT o_orderkey AS orderkey, o_orderdate,
                   round(sum({rev}), 2)::DOUBLE AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, orderkey LIMIT 10
        """,
        "regional_revenue": f"""
            SELECT r_name,
                   round(sum({rev}), 2)::DOUBLE AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM region JOIN nation ON r_regionkey = n_regionkey
                 JOIN customer ON n_nationkey = c_nationkey
                 JOIN orders ON c_custkey = o_custkey
                 JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY r_name ORDER BY r_name
        """,
        "point_lookup": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
            FROM lineitem WHERE l_orderkey IN (1,2,3,4,5,6,7)
            ORDER BY l_orderkey, l_linenumber
        """,
        "orphan_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01')
            ORDER BY c_custkey
        """,
        "pagination": """
            SELECT rn, p_partkey, p_name FROM (
              SELECT row_number() OVER (ORDER BY p_partkey) AS rn, p_partkey, p_name
              FROM part) t
            WHERE rn > 20 AND rn <= 40
        """,
        "temporal_close": """
            SELECT event_id, user_id, event_type, ts AS valid_at,
                   lead(ts) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS invalid_at,
                   lead(ts) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) IS NULL AS is_current
            FROM events ORDER BY event_id
        """,
        "dedup_keep_first": """
            SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts, event_id) AS rn
                  FROM events) t
            WHERE rn = 1 ORDER BY user_id, event_type
        """,
        "context_window": """
            SELECT event_id, user_id,
                   coalesce(string_agg(event_type, '|') OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS prev_context
            FROM events ORDER BY event_id
        """,
        "mention_count_rerank": """
            SELECT user_id, count(*) AS n_mentions FROM events
            GROUP BY user_id ORDER BY n_mentions DESC, user_id LIMIT 20
        """,
        "bm25_indexed": """
            WITH toks AS (
              SELECT doc_id, unnest(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9]+'),
                  t -> t <> '')) AS tok
              FROM documents),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen
                   FROM toks GROUP BY doc_id),
            st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dlen) AS avgdl
                   FROM dl),
            tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
                   WHERE tok IN ('filter', 'join', 'scan')
                   GROUP BY doc_id, tok),
            dfq AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS dfreq
                    FROM tf GROUP BY tok),
            sc AS (SELECT t.doc_id,
                          sum(ln(1 + (s.n_docs - d.dfreq + 0.5)
                                 / (d.dfreq + 0.5))
                              * t.tf / (t.tf + 1.2 * (1 - 0.75
                                        + 0.75 * l.dlen / s.avgdl))) AS score
                   FROM tf t JOIN dfq d USING (tok) JOIN dl l USING (doc_id),
                        st s
                   GROUP BY t.doc_id)
            SELECT doc_id, round(score, 6) AS score FROM (
              SELECT doc_id, score FROM sc WHERE score > 0
              ORDER BY score DESC, doc_id LIMIT 25) t
        """,
        "embedding_neardups": """
            WITH allv AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 10000, embedding::DOUBLE[]
              FROM embeddings WHERE vec_id < 25)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 4) AS cos
            FROM allv a JOIN allv b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.8
            ORDER BY id_a, id_b
        """,
        "ann_lsh_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT id, round(c, 4) AS cos FROM (
              SELECT vec_id AS id,
                     list_cosine_similarity(embedding::DOUBLE[], qv) AS c
              FROM embeddings, q WHERE vec_id <> 0
              ORDER BY c DESC, vec_id LIMIT 10) t
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT id, round(c, 4) AS cos FROM (
              SELECT vec_id AS id,
                     list_cosine_similarity(embedding::DOUBLE[], qv) AS c
              FROM embeddings, q WHERE vec_id <> 0
              ORDER BY c DESC, vec_id LIMIT 10) t
        """,
        "audio_features": """
            WITH p AS (
              SELECT doc_id AS id,
                     4000 + (doc_id % 10) * 400 AS n,
                     4 + (doc_id % 5) AS half,
                     (doc_id % 9 + 1) / 10.0 AS a
              FROM documents)
            SELECT id, 8000::INTEGER AS sample_rate, 1::INTEGER AS n_channels,
                   n::BIGINT AS n_samples,
                   n / 8000.0 AS duration_sec,
                   floor(a * 32767.0 + 0.5) / 32768.0 AS rms,
                   ((n - 1) // half)::BIGINT AS n_zero_crossings
            FROM p
        """,
        "corpus_dedup": """
            WITH RECURSIVE
            fp AS (
              SELECT doc_id, b.band, b.i FROM documents,
              LATERAL (
                SELECT unnest(['s0','s1','s2','s3']) AS seed,
                       unnest([0,1,2,3]) AS i
              ) s(seed, i),
              LATERAL (
                SELECT list_aggregate(list_transform(list_distinct(
                    regexp_extract_all(text, '[a-z0-9]+')),
                    t -> md5(s.seed || '|' || t)), 'min') AS band, s.i AS i
              ) b(band, i)
            ),
            bounded AS (
              SELECT * FROM fp
              WHERE (i, band) IN (
                SELECT (i, band) FROM fp GROUP BY i, band
                HAVING count(*) BETWEEN 2 AND 20)
            ),
            near AS (
              SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
              FROM bounded a JOIN bounded b
                ON a.i = b.i AND a.band = b.band AND a.doc_id < b.doc_id),
            eh AS (SELECT doc_id, md5(text) AS h FROM documents),
            em AS (SELECT h, min(doc_id) AS keep FROM eh GROUP BY h),
            ee AS (SELECT e.doc_id AS a, m.keep AS b FROM eh e
                   JOIN em m USING (h) WHERE e.doc_id <> m.keep),
            edges AS (SELECT a, b FROM near UNION SELECT a, b FROM ee),
            und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
            reach AS (SELECT a, b FROM und
                      UNION
                      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
            mapping AS (SELECT a AS doc_id, least(a, min(b)) AS canon
                        FROM reach GROUP BY a)
            SELECT d.doc_id,
                   coalesce(m.canon, d.doc_id)::BIGINT AS canonical_id
            FROM documents d LEFT JOIN mapping m USING (doc_id)
            ORDER BY d.doc_id
        """,
        "sessionization": """
            WITH o AS (
              SELECT user_id, ts, value, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
            SELECT user_id, min(ts) AS session_start,
                   count(*)::BIGINT AS n_events,
                   round(sum(value::DECIMAL(18,4)), 2)::DOUBLE AS total_value
            FROM s GROUP BY user_id, sid
        """,
        "image_decode": """
            SELECT doc_id AS id,
                   (4 + doc_id % 8)::INTEGER AS width,
                   (3 + doc_id % 5)::INTEGER AS height,
                   (doc_id % 256)::DOUBLE AS mean_r,
                   ((doc_id * 7) % 256)::DOUBLE AS mean_g,
                   ((doc_id * 13) % 256)::DOUBLE AS mean_b,
                   'ok' AS decode_status
            FROM documents
        """,
        "simhash_docs": """
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(
                  regexp_extract_all(text, '[a-z0-9]+'))) AS tok
              FROM documents),
            h AS (SELECT doc_id, md5_number_upper(tok)::UBIGINT AS h64
                  FROM toks),
            bits AS (SELECT doc_id, r.j,
                            CASE WHEN (h64 >> r.j) & 1 = 1 THEN 1 ELSE -1 END
                              AS v
                     FROM h, range(64) r(j)),
            acc AS (SELECT doc_id, j, sum(v) AS a FROM bits
                    GROUP BY doc_id, j),
            sig AS (SELECT doc_id,
                           sum(CASE WHEN a > 0 THEN (1::HUGEINT << j::INT)
                               ELSE 0::HUGEINT END) AS s
                    FROM acc GROUP BY doc_id)
            SELECT d.doc_id AS id,
                   CAST(CASE WHEN coalesce(s, 0) >= 9223372036854775808::HUGEINT
                             THEN coalesce(s, 0) - 18446744073709551616::HUGEINT
                             ELSE coalesce(s, 0) END AS BIGINT) AS simhash
            FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
            ORDER BY id
        """,
        "multimodal_features": """
            SELECT doc_id AS id,
                   octet_length(encode(text))::INT AS n_bytes,
                   md5(text) AS content_hash,
                   ((('0x' || substr(md5(text), 1, 4))::INT % 1920) + 1)::INT
                       AS fake_width,
                   ((('0x' || substr(md5(text), 5, 4))::INT % 1080) + 1)::INT
                       AS fake_height,
                   'stub' AS decode_status
            FROM documents ORDER BY id
        """,
        "json_extract": """
            SELECT json_extract_string(props, '$.k') AS k_val, count(*) AS n
            FROM events GROUP BY k_val ORDER BY k_val
        """,
        "exact_dup_docs": """
            SELECT md5(text) AS text_hash, count(*) AS n_docs,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY md5(text) ORDER BY text_hash
        """,
        "minhash_fingerprint": """
            SELECT doc_id,
                   list_aggregate(list_transform(list_distinct(
                       regexp_extract_all(text, '[a-z0-9]+')),
                       t -> md5('s0|' || t)), 'min') AS mh0,
                   list_aggregate(list_transform(list_distinct(
                       regexp_extract_all(text, '[a-z0-9]+')),
                       t -> md5('s1|' || t)), 'min') AS mh1,
                   list_aggregate(list_transform(list_distinct(
                       regexp_extract_all(text, '[a-z0-9]+')),
                       t -> md5('s2|' || t)), 'min') AS mh2,
                   list_aggregate(list_transform(list_distinct(
                       regexp_extract_all(text, '[a-z0-9]+')),
                       t -> md5('s3|' || t)), 'min') AS mh3
            FROM documents ORDER BY doc_id
        """,
        "neardup_pairs": """
            WITH fp AS (
              SELECT doc_id, b.band, b.i FROM documents,
              LATERAL (
                SELECT unnest(['s0','s1','s2','s3']) AS seed,
                       unnest([0,1,2,3]) AS i
              ) s(seed, i),
              LATERAL (
                SELECT list_aggregate(list_transform(list_distinct(
                    regexp_extract_all(text, '[a-z0-9]+')),
                    t -> md5(s.seed || '|' || t)), 'min') AS band, s.i AS i
              ) b(band, i)
            ),
            bounded AS (
              SELECT * FROM fp
              WHERE (i, band) IN (
                SELECT (i, band) FROM fp GROUP BY i, band
                HAVING count(*) BETWEEN 2 AND 20)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bounded a JOIN bounded b
              ON a.i = b.i AND a.band = b.band AND a.doc_id < b.doc_id
            ORDER BY doc_a, doc_b
        """,
        "ngram_jaccard": """
            WITH fp AS (
              SELECT doc_id, b.band, b.i FROM documents,
              LATERAL (
                SELECT unnest(['s0','s1','s2','s3']) AS seed,
                       unnest([0,1,2,3]) AS i
              ) s(seed, i),
              LATERAL (
                SELECT list_aggregate(list_transform(list_distinct(
                    regexp_extract_all(text, '[a-z0-9]+')),
                    t -> md5(s.seed || '|' || t)), 'min') AS band, s.i AS i
              ) b(band, i)
            ),
            bounded AS (
              SELECT * FROM fp
              WHERE (i, band) IN (
                SELECT (i, band) FROM fp GROUP BY i, band
                HAVING count(*) BETWEEN 2 AND 20)
            ),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bounded a JOIN bounded b
                ON a.i = b.i AND a.band = b.band AND a.doc_id < b.doc_id
            ),
            toks AS (
              SELECT doc_id, unnest(list_distinct(
                  regexp_extract_all(text, '[a-z0-9]+'))) AS tok
              FROM documents
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
              SELECT p.doc_a, p.doc_b, count(*) AS inter
              FROM pairs p JOIN toks ta ON ta.doc_id = p.doc_a
                   JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
              GROUP BY p.doc_a, p.doc_b
            )
            SELECT i.doc_a, i.doc_b,
                   round(i.inter / (sa.sz + sb.sz - i.inter), 4) AS jaccard
            FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                 JOIN sizes sb ON sb.doc_id = i.doc_b
            ORDER BY doc_a, doc_b
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS cos
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "mmr_topk": """
            WITH qe AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                        WHERE vec_id = 0),
            cand AS (
              SELECT vec_id, vec_id::VARCHAR AS uuid,
                     embedding::DOUBLE[] AS v,
                     list_cosine_similarity(embedding::DOUBLE[], qv) AS qsim
              FROM embeddings, qe WHERE vec_id <> 0
              ORDER BY round(qsim, 4) DESC, vec_id LIMIT 64),
            pairs AS (
              SELECT a.uuid, max(list_cosine_similarity(a.v, b.v)) AS max_other
              FROM cand a JOIN cand b ON a.uuid <> b.uuid GROUP BY a.uuid)
            SELECT c.uuid,
                   round(0.5 * c.qsim - 0.5 * coalesce(p.max_other, 0), 4) AS mmr
            FROM cand c LEFT JOIN pairs p ON c.uuid = p.uuid
        """,
        "point_in_time": """
            SELECT user_id, event_type, event_id AS current_event_id,
                   ts AS valid_at, invalid_at
            FROM (SELECT *, lead(ts) OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id) AS invalid_at
                  FROM events) t
            WHERE ts <= TIMESTAMP '2024-01-04 00:00:00'
              AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '2024-01-04 00:00:00')
            ORDER BY user_id, event_type
        """,
        "quality_score": """
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars,
                     len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
                     len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                         AS n_unique_tokens,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
              FROM documents)
            SELECT doc_id, n_chars, n_tokens, n_unique_tokens,
                   round(n_unique_tokens / greatest(n_tokens, 1), 4) AS ttr,
                   round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(n_digit / greatest(n_chars, 1), 4) AS digit_ratio
            FROM t ORDER BY doc_id
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(string_split_regex(text, '\s+'))::BIGINT AS whitespace_tokens,
                   len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS word_tokens,
                   CAST(coalesce(list_sum(list_transform(
                       regexp_extract_all(text, '[a-z0-9]+'),
                       t -> cast(ceil(length(t) / 4.0) AS INT))), 0) AS BIGINT)
                       AS bpe_ish_tokens
            FROM documents ORDER BY doc_id
        """,
        "lang_id_multi": r"""
            WITH ev AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\b(a|and|in|is|of|that|the|to)\b')) AS ev_en,
                     len(regexp_extract_all(text, '\b(de|el|en|es|la|que|un|y)\b')) AS ev_es,
                     len(regexp_extract_all(text, '\b(das|der|die|ein|ist|und|von|zu)\b')) AS ev_de
              FROM documents)
            SELECT doc_id, ev_de, ev_en, ev_es,
                   CASE WHEN b.n > 0 THEN b.lang ELSE 'und' END AS lang_pred
            FROM ev, LATERAL (
              SELECT n, lang FROM (VALUES (ev_de, 'de'), (ev_en, 'en'),
                                          (ev_es, 'es')) t(n, lang)
              ORDER BY n DESC, lang DESC LIMIT 1) b(n, lang)
            ORDER BY doc_id
        """,
        "rolling_fingerprint": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
              FROM documents),
            s AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
                         i -> md5(array_to_string(toks[i:i+7], ' '))) AS sh
              FROM t)
            SELECT doc_id, list_aggregate(sh, 'min') AS fingerprint,
                   len(list_distinct(sh)) AS n_shingles
            FROM s ORDER BY doc_id
        """,
    }
