"""Graph maintenance operators: episode windows, deletion with orphan GC,
group deletes, and point-in-time search filters.

Analogs of /root/reference/graphiti_core/utils/maintenance/
graph_data_operations.py, graphiti.py:641-704 (remove_episode) and
search/search_filters.py.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPISODE_WINDOW_LEN = 3  # graph_data_operations.py:26


def retrieve_episodes(episodes: DataFrame, reference_time: datetime,
                      last_n: int = EPISODE_WINDOW_LEN,
                      group_ids: list[str] | None = None) -> DataFrame:
    """Last-N episodes with valid_at <= reference_time per group, newest
    first (graph_data_operations.py:104-159)."""
    df = episodes.filter(F.col("valid_at") <= F.lit(reference_time))
    if group_ids:
        df = df.filter(F.col("group_id").isin(group_ids))
    w = Window.partitionBy("group_id").orderBy(F.desc("valid_at"), F.desc("uuid"))
    return (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= last_n).drop("rn"))


def episode_context_window(pages: DataFrame,
                           last_n: int = EPISODE_WINDOW_LEN) -> DataFrame:
    """Per-page previous-episodes context as a lag window (the batch analog
    of the per-episode retrieve_episodes call, SURVEY.md §2.1): each page
    gets the texts of its ``last_n`` predecessors in (warc_ts, url) order
    within its group — no point queries."""
    w = (Window.partitionBy("group_id").orderBy("warc_ts", "url")
         .rowsBetween(-last_n, -1))
    return pages.withColumn("prev_context", F.collect_list("text").over(w))


def remove_episode(tables: dict[str, DataFrame],
                   episode_uuid: str) -> dict[str, DataFrame]:
    """Delete an episode, the facts only it evidenced, and newly-orphaned
    nodes (graphiti.py:641-704: count-subquery orphan GC become anti-joins).

    Returns new table DataFrames (episodes, edges, mentions, nodes).
    """
    episodes = tables["episodes"].filter(F.col("uuid") != episode_uuid)
    # facts lose this episode from provenance; facts with empty provenance die
    edges = (tables["edges"]
             .withColumn("episodes", F.array_remove("episodes", episode_uuid))
             .filter(F.size("episodes") > 0))
    mentions = tables["mentions"].filter(F.col("episode_uuid") != episode_uuid)
    # orphan nodes: no remaining mention AND no remaining edge endpoint
    endpoint_refs = (edges.select(F.col("source_node_uuid").alias("node_uuid"))
                     .union(edges.select(F.col("target_node_uuid").alias("node_uuid")))
                     .distinct())
    live = mentions.select("node_uuid").distinct().union(endpoint_refs).distinct()
    nodes = tables["nodes"].join(live, tables["nodes"]["uuid"] == live["node_uuid"],
                                 "left_semi")
    return {"episodes": episodes, "edges": edges, "mentions": mentions,
            "nodes": nodes}


def delete_group(tables: dict[str, DataFrame], group_id: str) -> dict[str, DataFrame]:
    """Drop every row of a graph partition (Node.delete_by_group_id,
    nodes.py:113-124; with Iceberg this is a metadata-only partition drop).
    Tables without a group_id column (e.g. alias_map) pass through
    unchanged rather than vanishing from the returned dict."""
    return {k: v.filter(F.col("group_id") != group_id)
            if "group_id" in v.columns else v
            for k, v in tables.items()}


def clear_data(spark, base: str | None = None) -> None:
    """MATCH (n) DETACH DELETE n analog (graph_data_operations.py:95-101):
    drop-recreate of the output location."""
    if base:
        import shutil
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Point-in-time search filters (search_filters.py:25-171)
# ---------------------------------------------------------------------------

_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
}

_DATE_FIELDS = ("valid_at", "invalid_at", "expired_at", "created_at")


# The reference's one-call index bootstrap (build_indices_and_constraints,
# graph_data_operations.py:31-96) creates 19 range indexes and THREE Lucene
# fulltext indexes. The range indexes map to the parquet layout this engine
# already writes (group_id partition columns + per-column min/max row-group
# stats serve every uuid / group_id / timestamp predicate — SURVEY §2.1
# "Index/DDL" row); the fulltext indexes map to persisted BM25 postings
# indexes (kgspark/fulltext.py), one per entity kind, over the SAME column
# sets the reference indexes:
FULLTEXT_INDEXES: dict[str, tuple[str, tuple[str, ...]]] = {
    # index name                 table          columns (reference :76-84)
    "node_name_and_summary": ("nodes", ("name", "summary")),
    "community_name": ("communities", ("name",)),
    "edge_name_and_fact": ("edges", ("name", "fact")),
}


def build_indices_and_constraints(tables: dict[str, DataFrame], out_dir: str,
                                  delete_existing: bool = False,
                                  num_buckets: int = 64) -> dict[str, str]:
    """One-call fulltext-index bootstrap over the graph tables
    (build_indices_and_constraints, graph_data_operations.py:31-96
    analog). Builds the reference's three fulltext indexes as persisted
    BM25 postings indexes under ``{out_dir}/{index_name}``, each
    searchable via ``fulltext.bm25_query_indexed`` and pluggable into
    ``search.hybrid_search(fulltext_index_path=…)``, and each
    incrementally maintainable via ``fulltext.update_fulltext_index``
    (re-index the SAME concatenated column set for delta rows).

    IF-NOT-EXISTS semantics like the reference's CREATE INDEX statements:
    an index that already has a committed generation is left untouched
    unless ``delete_existing=True`` (the analog of the reference's
    drop-then-recreate path). The group_id column is carried into every
    index (the reference includes group_id in each fulltext index's field
    list; here it is a filter column for group-scoped queries, with exact
    filter-local BM25 stats). Returns {index_name: path} for the indexes
    present in ``tables``."""
    import shutil
    from pathlib import Path

    from kgspark import fulltext, segments

    out: dict[str, str] = {}
    for idx_name, (table, cols) in FULLTEXT_INDEXES.items():
        df = tables.get(table)
        if df is None:
            continue
        path = str(Path(out_dir) / idx_name)
        if delete_existing:
            shutil.rmtree(path, ignore_errors=True)
        if segments.committed_gen(path) is None:
            present = [c for c in cols if c in df.columns]
            searchable = F.concat_ws(" ", *[
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in present])
            fulltext.build_fulltext_index(
                df.withColumn("__search_text", searchable),
                "__search_text", path, id_col="uuid",
                num_buckets=num_buckets)
        out[idx_name] = path
    return out


def build_filter(spec: dict) -> Column:
    """SearchFilters analog: per temporal field, a list of OR-groups, each a
    list of AND-ed ``(op, value)`` pairs (the DNF shape of
    search_filters.py:65-171); plus optional ``node_labels`` / ``edge_types``
    membership lists.

    Example::

        build_filter({
            "valid_at": [[("<=", ts), (">", ts0)]],   # (valid<=ts AND valid>ts0)
            "invalid_at": [[("is_null", None)], [(">", ts)]],  # null OR >ts
            "edge_types": ["LIKES", "WORKS_FOR"],
        })
    """
    known = set(_DATE_FIELDS) | {"node_labels", "edge_types", "group_ids"}
    unknown = set(spec) - known
    if unknown:
        # SearchFilters is a typed model in the reference — a typo'd key
        # must fail loudly, not silently return an unfiltered predicate
        raise ValueError(f"build_filter: unknown filter key(s) {sorted(unknown)}; "
                         f"expected one of {sorted(known)}")
    conds: list[Column] = []
    for field in _DATE_FIELDS:
        groups = spec.get(field)
        if not groups:
            continue
        or_parts = []
        for group in groups:
            and_part = None
            for op, value in group:
                c = _OPS[op](F.col(field), F.lit(value))
                and_part = c if and_part is None else (and_part & c)
            if and_part is not None:
                or_parts.append(and_part)
        if or_parts:
            combined = or_parts[0]
            for p in or_parts[1:]:
                combined = combined | p
            conds.append(combined)
    if spec.get("node_labels"):
        conds.append(F.arrays_overlap(
            F.col("labels"), F.array(*[F.lit(x) for x in spec["node_labels"]])))
    if spec.get("edge_types"):
        conds.append(F.col("name").isin(spec["edge_types"]))
    if spec.get("group_ids"):
        conds.append(F.col("group_id").isin(spec["group_ids"]))
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def facts_as_of(edges: DataFrame, as_of: datetime) -> DataFrame:
    """Point-in-time view: facts true at ``as_of`` (valid_at <= t and not
    yet invalid) — the canonical bi-temporal query the filters exist for."""
    return edges.filter(build_filter({
        "valid_at": [[("<=", as_of)]],
        "invalid_at": [[("is_null", None)], [(">", as_of)]],
    }))
