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

Scale shape: hub facts (the same assertion crawled from tens of thousands of
pages) skew a naive groupBy — one reducer would absorb the whole duplicate
class. The aggregation therefore runs in TWO phases with an explicit salt on
the provenance url (north-rule hub salting): phase 1 aggregates per
(class, salt) spreading each hub class over N_SALTS reducers; phase 2 merges
the per-salt partials. min/max merge losslessly; provenance merges as
set-union then is CAPPED at ``max_provenance`` urls (smallest-first,
deterministic) with the exact total kept in ``n_occurrences`` — an explicit,
logged bound, not a silent truncation (a 10^12-corpus hub fact cannot carry
an unbounded episodes array).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 16
MAX_PROVENANCE = 1000

KEY = ["group_id", "src_uuid", "predicate", "dst_uuid", "norm_fact"]


def dedup_edges(triples: DataFrame, n_salts: int = N_SALTS,
                max_provenance: int = MAX_PROVENANCE) -> DataFrame:
    """triples: group_id, src_uuid, dst_uuid, predicate, fact, norm_fact,
    url, warc_ts, valid_at_explicit, invalid_at_explicit.

    Returns one edge row per duplicate-class with merged provenance.
    """
    salted = (
        triples
        .filter(F.col("src_uuid") != F.col("dst_uuid"))  # self-loop drop (bulk_utils.py:385-386)
        .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)))
    )
    partial = (
        salted
        .groupBy(*KEY, "salt")
        .agg(
            F.min(F.struct(F.col("warc_ts"), F.col("url"),
                           F.col("fact"))).alias("first_occ"),
            F.max(F.when(F.col("valid_at_explicit").isNotNull(),
                         F.struct("warc_ts", "url", "valid_at_explicit"))).alias("last_valid"),
            F.max(F.when(F.col("invalid_at_explicit").isNotNull(),
                         F.struct("warc_ts", "url", "invalid_at_explicit"))).alias("last_invalid"),
            F.slice(F.array_sort(F.collect_set("url")), 1,
                    max_provenance).alias("eps"),
            F.min("warc_ts").alias("created_at_p"),
            F.count(F.lit(1)).alias("n_occ"),
        )
    )
    merged = (
        partial
        .groupBy(*KEY)
        .agg(
            F.min("first_occ").alias("first_occ"),
            F.max("last_valid").alias("last_valid"),
            F.max("last_invalid").alias("last_invalid"),
            F.slice(F.array_sort(F.array_distinct(F.flatten(F.collect_list("eps")))),
                    1, max_provenance).alias("episodes"),
            F.min("created_at_p").alias("created_at"),
            F.sum("n_occ").alias("n_occurrences"),
        )
        .select(
            *KEY,
            F.col("first_occ.fact").alias("fact"),
            "episodes", "created_at", "n_occurrences",
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
