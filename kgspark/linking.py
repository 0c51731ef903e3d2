"""Entity linking: blocking + scoring + alias pairs.

Replaces the reference's per-extracted-node hybrid candidate search +
LLM duplicate decision (get_relevant_nodes /root/reference/graphiti_core/
search/search_utils.py:638-676, resolve_extracted_node
utils/maintenance/node_operations.py:268-415, name-exact match
utils/bulk_utils.py:205-215) with one similarity self-join:

1. distinct entities per (group_id, normalized name) — exact dupes collapse
   here for free (the ``node_name_match`` analog);
2. MinHash-LSH band keys (same function as the oracle) + first-token blocks
   as candidate-pair generators;
3. **explicit hub salting** of hot blocking keys before the pair shuffle
   (north rule): hot keys are detected by frequency and split across salts
   with one side replicated, which preserves every pair exactly while
   spreading Zipf-hub blocks over the cluster;
4. pair scoring fully JVM-side (whole-stage codegen): normalized-equality,
   abbreviation rule, shingle-Jaccard + embedding-cosine (stored 1024-dim
   hashed embeddings, dot product via ``F.zip_with``/``F.aggregate``) — the
   same decision rule as ``textcore.should_link`` (parity-tested).

Dynamic events never link (node_operations.py:56-64); they chain via
PREVIOUS_INSTANCE edges instead (node_operations.py:379-394).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark import udfs
from kgspark.textcore import (
    LINK_COSINE_THRESHOLD,
    LINK_JACCARD_THRESHOLD,
)

# Blocks larger than this are considered skewed (hub keys) and get salted.
HOT_KEY_THRESHOLD = 256
N_SALTS = 8


def distinct_entities(mentions: DataFrame, entity_types=None) -> DataFrame:
    """One row per (group_id, normalized name): the unit of linking.

    ``ext_uuid`` is deterministic (md5 of group + normalized name) so both
    the Spark DAG and the oracle agree on pre-canonicalization identity.

    ``entity_types``: the registry the mentions were classified with, if
    any — custom types with dynamic=True join DynamicEvent in the
    never-merge set (is_dynamic), keeping the pipeline consistent with
    textcore.should_link's veto.
    """
    from kgspark.entity_types import dynamic_labels
    dyn = dynamic_labels(entity_types)
    if "norm_name" not in mentions.columns:
        mentions = mentions.withColumn(
            "norm_name", udfs.norm_name_col(F.col("name")))
    per_name = (
        mentions
        .groupBy("group_id", "norm_name", "name", "label")
        .agg(F.count(F.lit(1)).alias("c"), F.min("warc_ts").alias("fs"))
    )
    e = (
        per_name
        .groupBy("group_id", "norm_name")
        .agg(
            # representative raw name: most-mentioned, then longest, then max
            # (prefers full names over aliases; deterministic tie-break —
            # resolve_extracted_node keeps the resolved/full name)
            F.max(F.struct(F.col("c"), F.length("name").alias("l"),
                           F.col("name").alias("n"),
                           F.col("label").alias("lb"))).alias("rep"),
            F.min("fs").alias("first_seen"),
            F.sum("c").alias("n_mentions"),
        )
        .select(
            "group_id", "norm_name",
            F.col("rep.n").alias("name"), F.col("rep.lb").alias("label"),
            "first_seen", "n_mentions",
        )
        .withColumn("ext_uuid", F.md5(F.concat_ws("|", F.lit("ent"),
                                                  F.col("group_id"), F.col("norm_name"))))
        .withColumn("is_dynamic", F.col("label").isin(*sorted(dyn)))
    )
    return e


def _shingle_col(norm_name):
    """Char-3-shingles of '^'+norm+'$' — JVM-side mirror of
    textcore.name_shingles (parity-tested)."""
    padded = F.concat(F.lit("^"), norm_name, F.lit("$"))
    return F.when(
        F.length(padded) <= 3, F.array(padded)
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - 2),
                lambda i: padded.substr(i, F.lit(3)),
            )
        )
    )


def _salted_self_join(keys: DataFrame, key_cols: list[str], payload: str) -> DataFrame:
    """Self-join ``keys`` on ``key_cols`` producing unordered distinct pairs of
    ``payload`` values, with explicit salting of hot keys.

    Hot keys (frequency > HOT_KEY_THRESHOLD) are detected with a cheap
    aggregate, broadcast, and split: the left side gets a deterministic salt
    in [0, N_SALTS); the right side is replicated across all salts for hot
    keys only. Every pair is preserved exactly once; hub blocks no longer
    land on a single reducer. (North-rule requirement: salt skewed hub
    entities before the link-score shuffle; SURVEY.md §4 skew row.)
    """
    hot = (
        keys.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("kc"))
        .filter(F.col("kc") > HOT_KEY_THRESHOLD)
        .select(*key_cols, F.lit(True).alias("is_hot"))
    )
    k = (
        keys.join(F.broadcast(hot), key_cols, "left")
        .withColumn("is_hot", F.coalesce(F.col("is_hot"), F.lit(False)))
    )
    left = k.withColumn(
        "salt",
        F.when(F.col("is_hot"), F.pmod(F.xxhash64(payload), F.lit(N_SALTS))).otherwise(F.lit(0)),
    )
    right = k.withColumn(
        "salt",
        F.explode(
            F.when(F.col("is_hot"), F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    a = left.select(*key_cols, "salt", F.col(payload).alias("pa"))
    b = right.select(*key_cols, "salt", F.col(payload).alias("pb"))
    return (
        a.join(b, key_cols + ["salt"])
        .filter(F.col("pa") < F.col("pb"))
        .select(key_cols[0], "pa", "pb")
        .distinct()
    )


def candidate_pairs(entities: DataFrame) -> DataFrame:
    """Blocking: MinHash-LSH bands ∪ first-token blocks -> distinct
    (group_id, norm_name a, norm_name b) candidate pairs (a < b).

    Both key families are unioned into ONE keyed table before a SINGLE
    salted self-join (band keys carry a ``b<i>|`` prefix, token blocks a
    ``tok|`` prefix, so the key spaces cannot collide). One pair shuffle +
    one distinct instead of two of each — shuffle-barrier count is the
    full-DAG scaling bottleneck (BENCH/BASELINE.md)."""
    linkable = entities.filter(~F.col("is_dynamic"))
    bands = udfs.entity_band_keys(linkable) \
        .select("group_id", "band_key", "norm_name")
    blocks = linkable.select(
        "group_id",
        F.concat(F.lit("tok|"),
                 F.split(F.col("norm_name"), " ").getItem(0)).alias("band_key"),
        "norm_name",
    )
    # checkpoint: the salted self-join references the keyed table three
    # times (hot-key detection + both sides); without materialization the
    # banding UDF would run three times
    keys = bands.union(blocks).localCheckpoint()
    return _salted_self_join(keys, ["group_id", "band_key"], "norm_name") \
        .withColumnRenamed("pa", "norm_a").withColumnRenamed("pb", "norm_b")


def score_pairs(entities: DataFrame, pairs: DataFrame,
                emb: DataFrame | None = None) -> DataFrame:
    """Apply the linking decision rule JVM-side; returns accepted alias pairs
    as (group_id, uuid_a, uuid_b).

    Decision (== textcore.should_link): abbreviation alias OR
    (shingle-Jaccard >= 0.35 AND embedding-cosine >= 0.6). Exact normalized
    matches were already collapsed by ``distinct_entities``.

    ``emb`` (group_id, norm_name, name_embedding) lets the caller share one
    embedding pass across the whole build (kgspark/pipeline.py computes it
    once and reuses it for the nodes table).
    """
    if emb is None:
        emb = udfs.embed_entities(entities.filter(~F.col("is_dynamic")))
    # Scoring is COMPUTE-bound, not byte-bound: each pair pays three
    # 1024-element higher-order aggregates (cosine + norms), ~100µs/row,
    # while the pair rows themselves are ~60 bytes. AQE's byte-based
    # coalescing therefore collapses the candidate-pair exchange to one or
    # two reducers (1MB minPartitionSize) and serializes the whole scoring
    # stage onto them. An EXPLICIT numbered repartition is exempt from AQE
    # coalescing, so it pins scoring parallelism at the session's shuffle
    # width; the extra exchange moves only the slim (group, name, name)
    # pair rows — embeddings are attached after, by broadcast of ``attrs``.
    n_part = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pairs = pairs.repartition(n_part)
    attrs = (
        entities.filter(~F.col("is_dynamic"))
        .select("group_id", "norm_name", "ext_uuid")
        .join(emb, ["group_id", "norm_name"])
        .withColumn("shingles", _shingle_col(F.col("norm_name")))
        .withColumn("tokens", F.split("norm_name", " "))
        # per-ENTITY invariants hoisted out of the per-pair projection:
        # the embedding L2 norm and summed token length are functions of
        # one side only, so computing them here turns three interpreted
        # 1024-element higher-order aggregates per PAIR into one (the dot
        # product). Same left-to-right accumulation and per-side sqrt as
        # before — the cosine value is bit-identical.
        .withColumn("nrm", F.sqrt(
            F.aggregate(F.transform("name_embedding", lambda x: x * x),
                        F.lit(0.0), lambda acc, v: acc + v)))
        .withColumn("tlen", F.aggregate(F.transform(F.split("norm_name", " "),
                                                    F.length),
                                        F.lit(0), lambda acc, v: acc + v))
    )
    # The 1024-double embedding is ~80x wider than every other attribute
    # combined, and only pairs surviving the cheap tests need it: linked
    # implies (abbrev OR jac >= threshold), so that necessary condition is
    # evaluated on SLIM rows first and the embeddings join only the
    # survivors (~1/3 of candidates on the bench corpus). At 10^12 scale
    # this keeps the 8KB/row arrays out of the full candidate-pair
    # exchange — the wide join is sized by accepted-ish pairs, not by
    # blocking recall. The ``linked`` predicate itself is unchanged below,
    # so the accepted set is identical by construction.
    slim = attrs.drop("name_embedding")
    a = slim.select(
        "group_id", F.col("norm_name").alias("norm_a"), F.col("ext_uuid").alias("uuid_a"),
        F.col("shingles").alias("sh_a"),
        F.col("tokens").alias("tok_a"), F.col("nrm").alias("nrm_a"),
        F.col("tlen").alias("len_a"))
    b = slim.select(
        "group_id", F.col("norm_name").alias("norm_b"), F.col("ext_uuid").alias("uuid_b"),
        F.col("shingles").alias("sh_b"),
        F.col("tokens").alias("tok_b"), F.col("nrm").alias("nrm_b"),
        F.col("tlen").alias("len_b"))
    ea = attrs.select("group_id", F.col("norm_name").alias("norm_a"),
                      F.col("name_embedding").alias("emb_a"))
    eb = attrs.select("group_id", F.col("norm_name").alias("norm_b"),
                      F.col("name_embedding").alias("emb_b"))
    pre = (
        pairs
        .join(a, ["group_id", "norm_a"])
        .join(b, ["group_id", "norm_b"])
        .withColumn("jac",
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "abbrev",
            (F.size("tok_a") == F.size("tok_b"))
            & (F.element_at("tok_a", 1) == F.element_at("tok_b", 1))
            & F.when(
                F.col("len_a") <= F.col("len_b"),
                F.forall(F.zip_with("tok_a", "tok_b", lambda s, l: l.startswith(s)),
                         lambda x: x),
            ).otherwise(
                F.forall(F.zip_with("tok_b", "tok_a", lambda s, l: l.startswith(s)),
                         lambda x: x),
            ),
        )
        # the necessary condition of ``linked`` — pushes the wide embedding
        # join below from all candidates down to the survivors
        .filter(F.col("abbrev")
                | (F.col("jac") >= F.lit(LINK_JACCARD_THRESHOLD)))
    )
    scored = (
        pre
        .join(ea, ["group_id", "norm_a"])
        .join(eb, ["group_id", "norm_b"])
        # EXACTLY textcore.cosine: double dot / (norm_a * norm_b), same
        # left-to-right accumulation order as the Python generator sums —
        # bitwise-identical to the oracle's decision, and the same formula
        # the DuckDB oracle's list_cosine_similarity computes (the per-side
        # norms are hoisted into ``attrs``: same sum order, same sqrt)
        .withColumn("cos",
                    F.aggregate(F.zip_with("emb_a", "emb_b",
                                           lambda x, y: x * y),
                                F.lit(0.0), lambda acc, v: acc + v)
                    / (F.col("nrm_a") * F.col("nrm_b")))
        .withColumn(
            "linked",
            F.col("abbrev")
            | ((F.col("jac") >= F.lit(LINK_JACCARD_THRESHOLD))
               & (F.col("cos") >= F.lit(LINK_COSINE_THRESHOLD))),
        )
    )
    return scored.filter("linked").select("group_id", "uuid_a", "uuid_b")
