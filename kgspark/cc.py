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

MAX_ITERATIONS = 25


def connected_components(pairs: DataFrame, src: str = "uuid_a", dst: str = "uuid_b",
                         max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """pairs(src, dst) -> mapping(uuid, canonical_uuid), only for vertices
    that appear in at least one pair (identity rows are implicit).
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

    for _ in range(max_iterations):
        # candidate labels flowing across edges: min(neighbor labels, own)
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("v", "b"), "b")
            .select(F.col("a").alias("v"), "label")
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("v").agg(F.min("label").alias("label"))
            .localCheckpoint()  # cut lineage each round
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "v")
            .filter(F.col("label") != F.col("old"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
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
