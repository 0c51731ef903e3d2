"""Cross-episode edge deduplication + provenance merge.

Batch analog of dedupe_extracted_edge(s) / chunk_edges_by_nodes /
compress_edges (/root/reference/graphiti_core/utils/maintenance/
edge_operations.py:151-192,308-381, utils/bulk_utils.py:292-311,379-396):
facts are duplicates iff they share (group, canonical src, predicate,
canonical dst, normalized fact — date phrases stripped). The kept edge is
the FIRST occurrence by (warc_ts, url); provenance episodes are set-merged
(edge_operations.py:186-187); explicit dates from the LAST restating episode
win (resolve_extracted_edge overwrites valid_at/invalid_at when the current
episode extracted dates — edge_operations.py:280-284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_edges(triples: DataFrame) -> DataFrame:
    """triples: group_id, src_uuid, dst_uuid, predicate, fact, norm_fact,
    url, warc_ts, valid_at_explicit, invalid_at_explicit.

    Returns one edge row per duplicate-class with merged provenance.
    """
    key = ["group_id", "src_uuid", "predicate", "dst_uuid", "norm_fact"]
    merged = (
        triples
        .filter(F.col("src_uuid") != F.col("dst_uuid"))  # self-loop drop (bulk_utils.py:385-386)
        .groupBy(*key)
        .agg(
            F.min(F.struct(F.col("warc_ts"), F.col("url"),
                           F.col("fact"))).alias("first_occ"),
            F.max(F.when(F.col("valid_at_explicit").isNotNull(),
                         F.struct("warc_ts", "url", "valid_at_explicit"))).alias("last_valid"),
            F.max(F.when(F.col("invalid_at_explicit").isNotNull(),
                         F.struct("warc_ts", "url", "invalid_at_explicit"))).alias("last_invalid"),
            F.array_sort(F.collect_set("url")).alias("episodes"),
            F.min("warc_ts").alias("created_at"),
        )
        .select(
            *key,
            F.col("first_occ.fact").alias("fact"),
            "episodes", "created_at",
            # valid_at: last explicit restatement wins, else the first
            # occurrence's crawl time (present-tense default — prompt rule 3,
            # prompts/extract_edge_dates.py:81)
            F.coalesce(F.col("last_valid.valid_at_explicit"),
                       F.col("first_occ.warc_ts")).alias("valid_at"),
            F.col("last_invalid.invalid_at_explicit").alias("invalid_at_explicit"),
        )
        .withColumn("uuid", F.md5(F.concat_ws(
            "|", F.lit("edge"), F.col("group_id"), F.col("src_uuid"),
            F.col("predicate"), F.col("dst_uuid"), F.col("norm_fact"))))
    )
    return merged
