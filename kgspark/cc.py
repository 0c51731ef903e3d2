"""Connected components over alias pairs — the canonicalization core.

Replaces the reference's uuid-map transitive closure (compress_uuid_map,
/root/reference/graphiti_core/utils/bulk_utils.py:314-323, and the pointer
chase bulk_processor.py:269-301) with distributed iterative label
minimization (the large-star/small-star family): every vertex repeatedly
adopts the minimum label in its closed neighborhood until fixpoint. Alias
clusters have tiny diameters, so convergence is a handful of rounds;
``localCheckpoint`` per round cuts lineage growth (SURVEY.md §7.3 risk 3).

The canonical id of a component is the MINIMUM member uuid — the same
deterministic rule the oracle applies, so component naming matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 24
BURST = 4  # propagation rounds between convergence checks


def connected_components(pairs: DataFrame, src: str = "uuid_a", dst: str = "uuid_b",
                         max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """pairs(src, dst) -> mapping(uuid, canonical_uuid), only for vertices
    that appear in at least one pair (identity rows are implicit).

    Rounds run in BURSTs of 4 between convergence checks: alias components
    have tiny diameters, so one burst usually converges and the whole
    canonicalization costs 2 Spark jobs (burst materialization + check)
    instead of 2 per round — job-count, not data volume, is the scaling
    bottleneck of driver-side iteration.
    """
    # undirected edge list, deduped
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # label init: each vertex starts as its own component
    labels = edges.select(F.col("a").alias("v")).distinct() \
        .withColumn("label", F.col("v"))

    def one_round(lbl: DataFrame) -> DataFrame:
        neighbor_labels = (
            edges.join(lbl.withColumnRenamed("v", "b"), "b")
            .select(F.col("a").alias("v"), "label")
        )
        return (lbl.union(neighbor_labels)
                .groupBy("v").agg(F.min("label").alias("label")))

    rounds = 0
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
        converged = changed == 0
        labels = new_labels
        if converged:
            break

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
