"""Connected components over alias pairs — the canonicalization core.

Replaces the reference's uuid-map transitive closure (compress_uuid_map,
/root/reference/graphiti_core/utils/bulk_utils.py:314-323, and the pointer
chase bulk_processor.py:269-301).

Two strategies:

- ``connected_components`` (default): **exact union-find per group partition**
  in one Arrow stage. Alias components can never span ``group_id`` because
  pre-canonical entity uuids embed the group (textcore.entity_uuid →
  md5('ent|<group>|<norm name>')), so the component problem is
  embarrassingly parallel over groups: one shuffle co-locates each group's
  pairs, then a vectorized union-find resolves them locally. This replaces
  the iterative min-label loop's ~8 jobs (burst materializations +
  convergence checks) with ONE — driver-side job count, not data volume, is
  the scaling bottleneck of iterative refinement (BENCH/BASELINE.md).
  State per task = the group's alias PAIRS (not its entities): at
  10^12-document scale groups are date×domain buckets and their pair sets
  are orders of magnitude smaller than the corpus; a group whose pairs
  exceed executor memory should use the iterative fallback below.

- ``connected_components_iterative``: distributed min-label propagation
  (large-star/small-star family) for groups too large for local resolution;
  raises if the component diameter exceeds ``max_iterations`` instead of
  silently returning split components.

The canonical id of a component is the MINIMUM member uuid — the same
deterministic rule the oracle applies, so component naming matches exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 24
BURST = 4  # propagation rounds between convergence checks

CC_DDL = "uuid string, canonical_uuid string"


def _union_find(pdf: pd.DataFrame, src: str, dst: str) -> pd.DataFrame:
    """Exact union-find with path compression; roots are kept minimal
    (attach the larger root under the smaller), so the final root of every
    vertex is the MIN uuid of its component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf[src], pdf[dst]):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return pd.DataFrame(
        {"uuid": list(parent), "canonical_uuid": [find(v) for v in parent]})


def connected_components(pairs: DataFrame, src: str = "uuid_a", dst: str = "uuid_b",
                         group_col: str = "group_id") -> DataFrame:
    """pairs(src, dst [, group_col]) -> mapping(uuid, canonical_uuid), only
    for vertices that appear in at least one pair (identity rows are
    implicit). One shuffle (hash partition by group), one Arrow stage."""
    if group_col not in pairs.columns:
        pairs = pairs.withColumn("__cc_g", F.lit("all"))
        group_col = "__cc_g"

    def run(key, pdf):
        return _union_find(pdf, src, dst)

    return (pairs.select(group_col, src, dst)
            .groupBy(group_col).applyInPandas(run, CC_DDL))


# Above this many alias pairs in ONE group the single-task union-find
# stops being the right tool (that group's pairs land in one executor
# task) — the same threshold datapipe.corpus_dedup uses for its
# corpus-spanning duplicate graph. 2M string pairs is ~100s of MB in one
# task: comfortably local; a pathological mega-group is not.
CC_AUTO_PAIRS = 2_000_000


def connected_components_auto(pairs: DataFrame, src: str = "uuid_a",
                              dst: str = "uuid_b",
                              group_col: str = "group_id",
                              auto_pair_threshold: int = CC_AUTO_PAIRS) -> DataFrame:
    """Strategy-routing closure: one cheap count-by-group agg, then each
    group takes the right path — local exact union-find below
    ``auto_pair_threshold`` pairs, distributed min-label propagation above
    it. Both produce the identical min-uuid canonical mapping (pinned by
    test_cc_local_matches_iterative + test_cc_auto_mixed_groups_parity),
    so routing is purely a physical choice. The collected oversize-group
    id list is small by construction (groups are date×domain buckets;
    only pathological ones cross the threshold). The iterative form's
    pointer doubling makes its round count O(log diameter), so routing a
    long alias chain to it is safe — 24 rounds cover diameter ~2^24."""
    if group_col not in pairs.columns:
        if pairs.count() > auto_pair_threshold:
            return connected_components_iterative(pairs, src, dst)
        return connected_components(pairs, src, dst, group_col)
    sizes = pairs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    big = [r[group_col] for r in
           sizes.filter(F.col("n") > auto_pair_threshold).collect()]
    if not big:
        return connected_components(pairs, src, dst, group_col)
    out = connected_components_iterative(
        pairs.filter(F.col(group_col).isin(big)), src, dst)
    # NULL-safe small branch: isin(big) is NULL (not false) for NULL group
    # ids, so `~isin(big)` alone would silently drop every null-group pair
    # whenever any group crosses the threshold. Nulls can never be in the
    # collected big list (groupBy keeps them as their own key), so they
    # always belong to the small branch.
    return connected_components(
        pairs.filter(~F.col(group_col).isin(big)
                     | F.col(group_col).isNull()), src, dst,
        group_col).unionByName(out)


def connected_components_iterative(pairs: DataFrame, src: str = "uuid_a",
                                   dst: str = "uuid_b",
                                   max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """Distributed min-label propagation with POINTER DOUBLING for groups
    whose pair sets exceed local memory. Plain min-label propagation moves
    the component minimum one hop per round — O(diameter) rounds, so a long
    alias chain (diameter > max_iterations) would fail where the local
    union-find handles any diameter. Each round therefore also shortcuts
    label(v) <- label(label(v)) (labels ARE vertex ids, so the lookup is a
    self-join), halving the remaining chain depth: convergence is
    O(log diameter), and 24 rounds cover diameters up to ~2^24. Rounds run
    in BURSTs of 4 between convergence checks; raises RuntimeError on
    non-convergence (a silently split component would diverge from the
    oracle's union-find with no signal)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("v")).distinct() \
        .withColumn("label", F.col("v"))

    def one_round(lbl: DataFrame) -> DataFrame:
        neighbor_labels = (
            edges.join(lbl.withColumnRenamed("v", "b"), "b")
            .select(F.col("a").alias("v"), "label")
        )
        merged = (lbl.union(neighbor_labels)
                  .groupBy("v").agg(F.min("label").alias("label")))
        # pointer doubling: label(v) <- min(label(v), label(label(v))).
        # Labels only ever decrease and always name a vertex of the same
        # component, so the shortcut preserves the invariant while cutting
        # chain depth in half each round.
        via = merged.select(F.col("v").alias("label"),
                            F.col("label").alias("label2"))
        return (merged.join(via, "label", "left")
                .select("v", F.coalesce("label2", "label").alias("label")))

    rounds, converged = 0, False
    while rounds < max_iterations:
        new_labels = labels
        for _ in range(min(BURST, max_iterations - rounds)):
            new_labels = one_round(new_labels)
            rounds += 1
        new_labels = new_labels.localCheckpoint()  # cut lineage per burst
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "v")
            .filter(F.col("label") != F.col("old"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_iterative: not converged after "
            f"{max_iterations} rounds — component diameter exceeds the "
            f"iteration budget; raise max_iterations")

    return labels.select(F.col("v").alias("uuid"), F.col("label").alias("canonical_uuid"))


def resolve_pointers(df: DataFrame, mapping: DataFrame, cols: list[str]) -> DataFrame:
    """Rewrite uuid columns through the alias map (resolve_edge_pointers
    analog, bulk_utils.py:329-336): one left-join per column with
    ``coalesce(new, old)`` — unmapped uuids are already canonical. The alias
    map only holds vertices that were actually linked (small relative to the
    corpus), so AQE turns these into broadcast joins at runtime; no explicit
    hint so the plan still degrades gracefully if the map ever grows."""
    out = df
    for c in cols:
        m = mapping.select(F.col("uuid").alias(c),
                           F.col("canonical_uuid").alias(f"__new_{c}"))
        out = (
            out.join(m, c, "left")
            .withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
            .drop(f"__new_{c}")
        )
    return out
