"""Bi-temporal pass: contradiction detection + edge invalidation in one
window-shaped shuffle.

Batch restatement of the reference's incremental contradiction machinery
(/root/reference/graphiti_core/utils/maintenance/edge_operations.py:234-305,
temporal_operations.py:71-103):

- each fact joins its contradiction-scope keys (pair-class and
  subject-functional scopes — the deterministic analog of the LLM
  "which facts does this contradict" call);
- within a key, a fact is closed by the EARLIEST strictly-later conflicting
  fact: ``invalid_at = min(explicit invalid_at, min{other.valid_at :
  other.valid_at > mine, conflict(mine, other)})``;
- ``expired_at`` (transaction time the system learned of the invalidation,
  edges.py:194-196) = the batch timestamp whenever invalid_at was assigned.

This single rule reproduces BOTH incremental branches — candidate
invalidation (edge_operations.py:234-261) and new-edge self-expiry
(:286-300) — because the incremental process, run to convergence in any
arrival order, assigns each fact exactly the minimum later conflicting
valid_at (see tests/test_temporal.py for the ported reference scenarios).

Event predicates (LEFT_JOB, ...) close conflicting state facts but are never
themselves closed.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.textcore import (
    CONTRA_PAIR_CLASSES,
    EVENT_PREDICATES,
    FUNCTIONAL_PREDICATES,
)


def _pair_class_expr():
    expr = F.lit(None).cast("string")
    # build CASE chain from the shared predicate->class table
    for pred, cls in CONTRA_PAIR_CLASSES.items():
        expr = F.when(F.col("predicate") == pred, F.lit(cls)).otherwise(expr)
    return expr


def with_contra_keys(edges: DataFrame) -> DataFrame:
    """Explode each edge row into its contradiction-scope keys.

    Key shapes (textcore.contradiction_keys): ``pair|<class>|<lo>|<hi>`` and
    ``subj|<predicate>|<subject uuid>``.
    """
    lo = F.least("src_uuid", "dst_uuid")
    hi = F.greatest("src_uuid", "dst_uuid")
    pair_key = F.when(
        _pair_class_expr().isNotNull(),
        F.concat_ws("|", F.lit("pair"), _pair_class_expr(), lo, hi),
    )
    subj_key = F.when(
        F.col("predicate").isin(*FUNCTIONAL_PREDICATES),
        F.concat_ws("|", F.lit("subj"), F.col("predicate"), F.col("src_uuid")),
    )
    return (
        edges
        .withColumn("contra_key", F.explode(
            F.array_compact(F.array(pair_key, subj_key))))
    )


def temporal_pass(edges: DataFrame, batch_ts: datetime) -> tuple[DataFrame, DataFrame]:
    """edges must carry: uuid, src_uuid, dst_uuid, predicate, valid_at,
    invalid_at_explicit, expired_at (null), group_id.

    Returns (edges with final invalid_at/expired_at, invalidation records
    ``(edge_uuid, invalid_at, expired_at, caused_by_edge_uuid)`` —
    FIXTURES.md §2 edge_invalidations).
    """
    keyed = with_contra_keys(edges).select(
        "uuid", "contra_key", "predicate", "valid_at",
        F.col("dst_uuid").alias("obj"),
    )
    w = Window.partitionBy("contra_key")
    # All facts sharing the key, as an array; each row then selects its own
    # earliest strictly-later conflicting fact. Key groups are small by
    # construction (facts about one node pair / one subject+predicate), so
    # the collected array is bounded — no unbounded-state risk at scale.
    scope = F.split(F.col("contra_key"), "\\|").getItem(0)
    conflicts = (
        keyed
        .withColumn("peers", F.collect_list(
            F.struct("valid_at", "uuid", "predicate", "obj")).over(w))
        .withColumn(
            "later_conflicts",
            F.filter(
                "peers",
                lambda p: p["valid_at"].isNotNull()
                & F.col("valid_at").isNotNull()
                & (p["valid_at"] > F.col("valid_at"))
                & (
                    F.when(scope == "pair", p["predicate"] != F.col("predicate"))
                    .otherwise(p["obj"] != F.col("obj"))
                ),
            ),
        )
        # a point-in-time event is never closed (it only closes others)
        .filter(~F.col("predicate").isin(*EVENT_PREDICATES))
        .withColumn("closer", F.array_min("later_conflicts"))
        .filter(F.col("closer").isNotNull())
        .groupBy("uuid")
        .agg(F.min("closer").alias("closer"))  # min over this edge's keys
        .select("uuid",
                F.col("closer.valid_at").alias("conflict_invalid_at"),
                F.col("closer.uuid").alias("caused_by_edge_uuid"))
    )

    resolved = (
        edges.join(conflicts, "uuid", "left")
        .withColumn(
            "invalid_at",
            F.least("invalid_at_explicit", "conflict_invalid_at"),
        )
        .withColumn(
            "expired_at",
            F.when(F.col("invalid_at").isNotNull(), F.lit(batch_ts)),
        )
    )
    invalidations = (
        resolved
        .filter(
            F.col("conflict_invalid_at").isNotNull()
            & (F.col("invalid_at_explicit").isNull()
               | (F.col("conflict_invalid_at") < F.col("invalid_at_explicit")))
        )
        .select(
            F.col("uuid").alias("edge_uuid"),
            F.col("conflict_invalid_at").alias("invalid_at"),
            F.col("expired_at"),
            "caused_by_edge_uuid",
            "group_id",
        )
    )
    return resolved.drop("conflict_invalid_at"), invalidations
