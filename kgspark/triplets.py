"""Direct triple assertion — the ``add_triplet`` analog.

/root/reference/graphiti_core/graphiti.py:569-607 lets a caller insert a
(subject, predicate, object) fact without an episode; the reference routes
it through the same node resolution, edge dedup and contradiction handling
as extraction. The batch analog takes a DataFrame of asserted triples and
produces nodes/edges/invalidations through the SAME
``dedup.dedup_edges`` + ``temporal.temporal_pass`` operators, so a manual
assertion is bi-temporally indistinguishable from an extracted one.

Input columns (group_id, subject, predicate, object required; the rest
optional): fact, url (provenance id, default 'manual'), warc_ts,
valid_at_explicit, invalid_at_explicit.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark import dedup, temporal, udfs

_NORM_FACT_DDL = "fact string, norm_fact string"


def _with_norm_fact(df: DataFrame) -> DataFrame:
    """norm_fact via the shared textcore rule (date phrases stripped) —
    Arrow-vectorized, same function as the extraction stage."""
    from kgspark.textcore import normalize_fact

    def run(batches):
        for pdf in batches:
            facts = pdf["fact"].drop_duplicates()
            yield pd.DataFrame({
                "fact": facts,
                "norm_fact": [normalize_fact(f) for f in facts]})

    nf = df.select("fact").mapInPandas(run, _NORM_FACT_DDL) \
        .dropDuplicates(["fact"])
    return df.join(nf, "fact", "left")


def add_triplets(triples: DataFrame,
                 batch_ts: datetime | None = None) -> dict[str, DataFrame]:
    """Returns {"nodes", "edges", "edge_invalidations"} for the asserted
    facts. Merge into stored tables with kgspark.io.merge_upsert."""
    if batch_ts is None:
        batch_ts = datetime(2025, 1, 1)
    t = triples
    if "fact" not in t.columns:
        t = t.withColumn("fact", F.concat_ws(
            " ", "subject", F.lower(F.regexp_replace("predicate", "_", " ")),
            "object"))
    if "url" not in t.columns:
        t = t.withColumn("url", F.lit("manual"))
    if "warc_ts" not in t.columns:
        t = t.withColumn("warc_ts", F.lit(batch_ts))
    for c in ("valid_at_explicit", "invalid_at_explicit"):
        if c not in t.columns:
            t = t.withColumn(c, F.lit(None).cast("timestamp"))

    t = (_with_norm_fact(t)
         .withColumn("norm_subj", udfs.norm_name_col(F.col("subject")))
         .withColumn("norm_obj", udfs.norm_name_col(F.col("object")))
         .withColumn("src_uuid", F.md5(F.concat_ws(
             "|", F.lit("ent"), F.col("group_id"), F.col("norm_subj"))))
         .withColumn("dst_uuid", F.md5(F.concat_ws(
             "|", F.lit("ent"), F.col("group_id"), F.col("norm_obj")))))

    # endpoint nodes (EntityNode save analog, graphiti.py:581-585)
    ends = t.select("group_id", F.col("subject").alias("name"),
                    F.col("src_uuid").alias("uuid"), "warc_ts") \
        .union(t.select("group_id", "object", "dst_uuid", "warc_ts"))
    nodes = (ends.groupBy("group_id", "uuid")
             .agg(F.min(F.struct("warc_ts", "name")).alias("m"))
             .select("uuid", F.col("m.name").alias("name"), "group_id",
                     F.array(F.lit("Entity")).alias("labels"),
                     F.col("m.warc_ts").alias("created_at")))

    merged = dedup.dedup_edges(t)
    resolved, invalidations = temporal.temporal_pass(merged, batch_ts)
    edges = resolved.select(
        "uuid",
        F.col("src_uuid").alias("source_node_uuid"),
        F.col("dst_uuid").alias("target_node_uuid"),
        F.col("predicate").alias("name"),
        "fact", "group_id", "episodes", "created_at",
        "valid_at", "invalid_at", "expired_at")
    return {"nodes": nodes, "edges": edges,
            "edge_invalidations": invalidations}
