"""DuckDB oracles for the flagship kg_* driver queries.

The KG-construction DAG is mostly plain relational algebra over the
deterministic extraction output. To give the driver a HARD correctness
signal on the flagship (VERDICT r1 item 1), the session's kg build
materializes exactly the non-SQL-expressible intermediates to parquet:

- ``pages_meta``                      — input page metadata (url, group_id,
  lang, source) PLUS raw content from the synthetic corpus (an INPUT of the
  DAG, not a computed stage; content feeds the episode-source oracles that
  re-derive message/json extraction in SQL);
- ``mentions_raw`` / ``triples_raw``  — the Arrow-UDF extraction stages
  (kgspark/udfs.py wrapping kgspark/textcore.py);
- ``band_keys``                       — MinHash-LSH band keys (md5 minhash,
  textcore.minhash_band_keys);
- ``embeddings``                      — 1024-dim hash embeddings per entity
  (textcore.hash_embedding);
- ``lp_labels``                       — label-propagation community labels
  (iterative fixpoint; pinned by tests/test_communities_search.py);
- ``query_emb``                       — the hybrid-search query embedding.

Everything DOWNSTREAM is recomputed independently in DuckDB SQL:
name normalization, distinct-entity aggregation, candidate blocking
(bands ∪ first-token blocks), the full linking decision rule (abbreviation
/ shingle-Jaccard / embedding-cosine thresholds), connected-components
closure (recursive CTE), canonical node assembly, mention rewriting, edge
dedup + provenance dates, the bi-temporal contradiction pass, BFS, and
hybrid RRF search. A bug anywhere in the Spark DAG's algebra therefore
shows up as a driver hash mismatch.

Reference semantics: graphiti.py:189-437 lifecycle; dedup
edge_operations.py:151-192; contradiction edge_operations.py:234-305;
closure bulk_utils.py:314-323.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.textcore import (
    CONTRA_PAIR_CLASSES,
    EVENT_PREDICATES,
    FUNCTIONAL_PREDICATES,
    JSON_RELATION_KEYS,
)

KG_ORACLE_DIR = "/tmp/kgspark_kg_oracle"
HYBRID_QUERY = "Priya Sharma"
# hybrid_node_search (search_utils.py:564-631) driver fixture: each string
# is BOTH a fulltext query and (via hash_embedding) a similarity query, so
# the batch runs 2 bm25 legs + 2 cosine legs fused by RRF
HNS_QUERIES = ["Priya Sharma", "Glowco"]
HNS_LIMIT = 10
BATCH_TS_SQL = "TIMESTAMP '2025-01-01'"

# kg_incremental_attach fixture rule: canonical nodes whose uuid's LAST
# hex digit falls in this set are the "new arrivals" (~25% of an md5-hex
# uuid space, deterministic on both sides). The old graph = edges whose
# BOTH endpoints are old; old labels = LP over that subgraph
# (materialized as lp_labels_old.parquet); the oracle re-derives the
# modal-neighbor cascade + unassigned set in SQL.
INCREMENT_HEX = ("0", "1", "2", "3")
INCREMENT_ROUNDS = 3

# literal fixture shared by q_kg_typed_attributes (__spark_entry__.py) and
# its oracle — the p2 restatement (later warc_ts) must OVERRIDE p1's
# country value; p3's Metro has no match and keeps the schema default
KG_ATTR_PAGES = [
    ("p1", "2024-01-01",
     "Ana Ruiz lives in Quito City.\nQuito City is located in Ecuador."),
    ("p2", "2024-02-01", "Quito City is located in Peru."),
    ("p3", "2024-03-01", "Bo Chen lives in Lima City."),
]


def materialize(spark: SparkSession, pages: DataFrame,
                edges: DataFrame, out_dir: str = KG_ORACLE_DIR,
                intermediates: dict | None = None) -> None:
    """Write the oracle input parquet files (single-file, atomic rename).

    This is the PARITY path for the small driver fixture (240 pages), not
    the production write path — tables are collected via toPandas and
    written as single parquet files so the DuckDB oracle can read them by
    absolute path.

    ``intermediates``: the underscore-keyed extraction intermediates from
    ``build_graph(expose_intermediates=True)`` — when provided, the
    dominant Python-UDF extraction front-end is NOT re-run here (it used
    to roughly double per-session extraction CPU).
    """
    import pandas as pd

    from kgspark import communities, linking, udfs
    from kgspark.textcore import hash_embedding

    os.makedirs(out_dir, exist_ok=True)
    inter = intermediates or {}
    mentions_raw = inter.get("_mentions_raw")
    if mentions_raw is None:
        mentions_raw = udfs.extract_mentions(pages)
    triples_raw = inter.get("_triples_raw")
    if triples_raw is None:
        triples_raw = udfs.extract_triples(pages)
    entities = inter.get("_entities")
    if entities is None:
        entities = linking.distinct_entities(mentions_raw)
    bands = udfs.entity_band_keys(entities.filter(~F.col("is_dynamic")))
    emb = inter.get("_embeddings")
    if emb is None:
        emb = udfs.embed_entities(entities)
    lp = communities.label_propagation(communities.adjacency(edges))
    old_edges = edges.filter(
        ~F.substring("source_node_uuid", 32, 1).isin(*INCREMENT_HEX)
        & ~F.substring("target_node_uuid", 32, 1).isin(*INCREMENT_HEX))
    lp_old = communities.label_propagation(communities.adjacency(old_edges))
    frames = {
        # url/group/lang/source + raw content: the episode-source oracles
        # (kg_message_speakers / kg_json_*) re-derive extraction from RAW
        # content in SQL (line split + split-part speakers; json_keys/
        # json_extract fields), so the EpisodeType dispatch itself is
        # hash-gated, not just the downstream algebra
        "pages_meta": pages.select(
            "url", "group_id", "lang", "source",
            F.col("text").alias("content")).toPandas(),
        "mentions_raw": mentions_raw.toPandas(),
        "triples_raw": triples_raw.toPandas(),
        "band_keys": bands.toPandas(),
        "embeddings": emb.toPandas(),
        "lp_labels": lp.toPandas(),
        "lp_labels_old": lp_old.toPandas(),
        "query_emb": pd.DataFrame({"embedding": [hash_embedding(HYBRID_QUERY)]}),
        # batch-lookup queries (hybrid_node_search twin): one embedding per
        # query, keyed by position
        "hns_query_emb": pd.DataFrame({
            "qi": list(range(len(HNS_QUERIES))),
            "embedding": [hash_embedding(q) for q in HNS_QUERIES]}),
    }
    for name, pdf in frames.items():
        tmp = os.path.join(out_dir, f".{name}.tmp.parquet")
        pdf.to_parquet(tmp)
        os.replace(tmp, os.path.join(out_dir, f"{name}.parquet"))


def _norm(col: str) -> str:
    """textcore.normalize_name in DuckDB."""
    return ("trim(regexp_replace(regexp_replace(lower(" + col + "), "
            "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")


def _norm_fact(col: str) -> str:
    """textcore.normalize_fact in DuckDB: strip the SAME date-phrase
    regexes before normalize_name, so a fact restated with/without its
    date phrase lands in the same dedup class on both sides (the patterns
    are RE2-compatible: no backrefs/lookarounds)."""
    from kgspark import textcore as tc

    s = col
    for rx in tc.DATE_STRIP_RES:  # the ONE shared pattern list — no drift
        pat = rx.pattern.replace("'", "''")
        s = f"regexp_replace({s}, '{pat}', ' ', 'g')"
    return _norm(s)


def _in_list(preds) -> str:
    return ", ".join(f"'{p}'" for p in sorted(preds))


def _pair_class_case() -> str:
    whens = " ".join(f"WHEN '{p}' THEN '{c}'"
                     for p, c in sorted(CONTRA_PAIR_CLASSES.items()))
    return f"CASE predicate {whens} END"


def _ctes(d: str) -> str:
    """The shared CTE chain (DuckDB only evaluates referenced CTEs)."""
    key5 = "group_id, src_uuid, predicate, dst_uuid, norm_fact"
    return f"""
mr AS (
  SELECT url, group_id, warc_ts, name, label, {_norm('name')} AS norm_name
  FROM '{d}/mentions_raw.parquet'),
per_name AS (
  SELECT group_id, norm_name, name, label, count(*) AS c, min(warc_ts) AS fs
  FROM mr GROUP BY group_id, norm_name, name, label),
entities AS MATERIALIZED (
  SELECT group_id, norm_name, name, label, first_seen, n_mentions, ext_uuid,
         (label = 'DynamicEvent') AS is_dynamic
  FROM (
    SELECT group_id, norm_name, name, label,
           min(fs) OVER w AS first_seen,
           CAST(sum(c) OVER w AS BIGINT) AS n_mentions,
           md5('ent|' || group_id || '|' || norm_name) AS ext_uuid,
           row_number() OVER (PARTITION BY group_id, norm_name
               ORDER BY c DESC, length(name) DESC, name DESC, label DESC) AS rn
    FROM per_name
    WINDOW w AS (PARTITION BY group_id, norm_name)
  ) t WHERE rn = 1),
linkable AS (SELECT * FROM entities WHERE NOT is_dynamic),
lkeys AS (
  SELECT group_id, band_key, norm_name FROM '{d}/band_keys.parquet'
  UNION ALL
  SELECT group_id, 'tok|' || split_part(norm_name, ' ', 1) AS band_key, norm_name
  FROM linkable),
cand AS MATERIALIZED (
  SELECT DISTINCT a.group_id, a.norm_name AS norm_a, b.norm_name AS norm_b
  FROM lkeys a JOIN lkeys b
    ON a.group_id = b.group_id AND a.band_key = b.band_key
       AND a.norm_name < b.norm_name),
emb AS (SELECT group_id, norm_name, name_embedding
        FROM '{d}/embeddings.parquet'),
attrs0 AS (
  SELECT l.group_id, l.norm_name, l.ext_uuid, e.name_embedding::DOUBLE[] AS v,
         '^' || l.norm_name || '$' AS padded,
         string_split(l.norm_name, ' ') AS toks
  FROM linkable l JOIN emb e
    ON e.group_id = l.group_id AND e.norm_name = l.norm_name),
attrs AS MATERIALIZED (
  SELECT *,
         CASE WHEN length(padded) <= 3 THEN [padded]
              ELSE list_distinct(list_transform(range(1, length(padded) - 1),
                   i -> substring(padded, i::INT, 3))) END AS shingles,
         CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
              AS BIGINT) AS toklen
  FROM attrs0),
scored AS (
  SELECT c.group_id, a.ext_uuid AS uuid_a, b.ext_uuid AS uuid_b,
         len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE AS jac,
         list_cosine_similarity(a.v, b.v) AS cosv,
         (len(a.toks) = len(b.toks) AND a.toks[1] = b.toks[1] AND
          CASE WHEN a.toklen <= b.toklen
               THEN len(list_filter(list_zip(a.toks, b.toks),
                        p -> starts_with(p[2], p[1]))) = len(a.toks)
               ELSE len(list_filter(list_zip(b.toks, a.toks),
                        p -> starts_with(p[2], p[1]))) = len(b.toks)
          END) AS abbrev
  FROM cand c
  JOIN attrs a ON a.group_id = c.group_id AND a.norm_name = c.norm_a
  JOIN attrs b ON b.group_id = c.group_id AND b.norm_name = c.norm_b),
accepted AS MATERIALIZED (
  SELECT group_id, uuid_a, uuid_b FROM scored
  WHERE abbrev OR (jac >= 0.35 AND cosv >= 0.6)),
und AS (SELECT uuid_a AS a, uuid_b AS b FROM accepted
        UNION SELECT uuid_b AS a, uuid_a AS b FROM accepted),
reach AS (SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
mapping AS MATERIALIZED (SELECT a AS uuid, least(a, min(b)) AS canonical_uuid
            FROM reach GROUP BY a),
canon AS MATERIALIZED (
  SELECT e.group_id, e.norm_name, e.name, e.label, e.first_seen,
         e.n_mentions, e.ext_uuid, e.is_dynamic,
         coalesce(m.canonical_uuid, e.ext_uuid) AS uuid
  FROM entities e LEFT JOIN mapping m ON e.ext_uuid = m.uuid),
node_agg AS (
  SELECT group_id, uuid, min(first_seen) AS created_at,
         CAST(sum(n_mentions) AS BIGINT) AS n_mentions,
         list_sort(list_distinct(list_append(list(DISTINCT label), 'Entity')))
           AS labels_arr
  FROM canon GROUP BY group_id, uuid),
node_rep AS (
  SELECT group_id, uuid, name AS rep_name, label AS rep_label,
         norm_name AS rep_norm
  FROM (SELECT *, row_number() OVER (PARTITION BY group_id, uuid
          ORDER BY n_mentions DESC, length(name) DESC, name DESC, label DESC) AS rn
        FROM canon) t WHERE rn = 1),
nodes AS MATERIALIZED (
  SELECT a.uuid, r.rep_name AS name, a.group_id,
         array_to_string(a.labels_arr, '|') AS labels,
         a.created_at, r.rep_norm,
         r.rep_name || ' is a ' || r.rep_label || ' mentioned in '
           || a.n_mentions::VARCHAR || ' pages' AS summary
  FROM node_agg a JOIN node_rep r
    ON a.group_id = r.group_id AND a.uuid = r.uuid),
mr_keyed AS (
  SELECT mr.*, md5('ent|' || group_id || '|' || norm_name) AS ext_uuid FROM mr),
mentions AS MATERIALIZED (
  SELECT DISTINCT
         md5('mention|' || k.url || '|'
             || coalesce(m.canonical_uuid, k.ext_uuid)) AS uuid,
         k.url AS episode_uuid,
         coalesce(m.canonical_uuid, k.ext_uuid) AS node_uuid,
         k.group_id, k.warc_ts AS created_at
  FROM mr_keyed k LEFT JOIN mapping m ON k.ext_uuid = m.uuid),
tr AS (SELECT *, {_norm('subject')} AS norm_subj, {_norm('object')} AS norm_obj
       FROM '{d}/triples_raw.parquet'),
tk AS (
  SELECT t.url, t.group_id, t.warc_ts, t.predicate, t.fact, t.norm_fact,
         t.valid_at_explicit, t.invalid_at_explicit,
         es.ext_uuid AS src_raw, eo.ext_uuid AS dst_raw
  FROM tr t
  JOIN entities es ON es.group_id = t.group_id AND es.norm_name = t.norm_subj
  JOIN entities eo ON eo.group_id = t.group_id AND eo.norm_name = t.norm_obj),
base AS MATERIALIZED (
  SELECT tk.*, coalesce(ms.canonical_uuid, src_raw) AS src_uuid,
               coalesce(mo.canonical_uuid, dst_raw) AS dst_uuid
  FROM tk LEFT JOIN mapping ms ON tk.src_raw = ms.uuid
          LEFT JOIN mapping mo ON tk.dst_raw = mo.uuid
  WHERE coalesce(ms.canonical_uuid, src_raw)
        <> coalesce(mo.canonical_uuid, dst_raw)),
first_occ AS (
  SELECT {key5}, fact, warc_ts AS first_ts
  FROM (SELECT *, row_number() OVER (PARTITION BY {key5}
          ORDER BY warc_ts, url, fact) AS rn FROM base) t WHERE rn = 1),
eagg AS (
  SELECT {key5}, min(warc_ts) AS created_at
  FROM base GROUP BY {key5}),
lastv AS (
  SELECT {key5}, valid_at_explicit AS lv
  FROM (SELECT *, row_number() OVER (PARTITION BY {key5}
          ORDER BY warc_ts DESC, url DESC, valid_at_explicit DESC) AS rn
        FROM base WHERE valid_at_explicit IS NOT NULL) t WHERE rn = 1),
lasti AS (
  SELECT {key5}, invalid_at_explicit AS liv
  FROM (SELECT *, row_number() OVER (PARTITION BY {key5}
          ORDER BY warc_ts DESC, url DESC, invalid_at_explicit DESC) AS rn
        FROM base WHERE invalid_at_explicit IS NOT NULL) t WHERE rn = 1),
edges0 AS MATERIALIZED (
  SELECT f.group_id, f.src_uuid, f.predicate, f.dst_uuid, f.norm_fact, f.fact,
         a.created_at,
         coalesce(lv.lv, f.first_ts) AS valid_at,
         li.liv AS invalid_at_explicit,
         md5('edge|' || f.group_id || '|' || f.src_uuid || '|' || f.predicate
             || '|' || f.dst_uuid || '|' || f.norm_fact) AS uuid
  FROM first_occ f
  JOIN eagg a USING ({key5})
  LEFT JOIN lastv lv USING ({key5})
  LEFT JOIN lasti li USING ({key5})),
keyed AS MATERIALIZED (
  SELECT uuid, valid_at, predicate, dst_uuid AS obj, 'pair' AS scope,
         'pair|' || {_pair_class_case()} || '|' || least(src_uuid, dst_uuid)
           || '|' || greatest(src_uuid, dst_uuid) AS contra_key
  FROM edges0 WHERE predicate IN ({_in_list(CONTRA_PAIR_CLASSES)})
  UNION ALL
  SELECT uuid, valid_at, predicate, dst_uuid, 'subj',
         'subj|' || predicate || '|' || src_uuid
  FROM edges0 WHERE predicate IN ({_in_list(FUNCTIONAL_PREDICATES)})),
confl AS MATERIALIZED (
  SELECT uuid, conflict_invalid_at, caused_by_edge_uuid FROM (
    SELECT k1.uuid, k2.valid_at AS conflict_invalid_at,
           k2.uuid AS caused_by_edge_uuid,
           row_number() OVER (PARTITION BY k1.uuid
                              ORDER BY k2.valid_at, k2.uuid) AS rn
    FROM keyed k1 JOIN keyed k2 ON k1.contra_key = k2.contra_key
     AND k1.valid_at IS NOT NULL AND k2.valid_at IS NOT NULL
     AND k2.valid_at > k1.valid_at
     AND ((k1.scope = 'pair' AND k2.predicate <> k1.predicate)
          OR (k1.scope = 'subj' AND k2.obj <> k1.obj))
    WHERE k1.predicate NOT IN ({_in_list(EVENT_PREDICATES)})
  ) t WHERE rn = 1),
edges_final AS MATERIALIZED (
  SELECT e.uuid, e.src_uuid AS source_node_uuid,
         e.dst_uuid AS target_node_uuid,
         e.predicate AS name, e.fact, e.group_id, e.created_at, e.valid_at,
         CASE WHEN e.invalid_at_explicit IS NULL THEN c.conflict_invalid_at
              WHEN c.conflict_invalid_at IS NULL THEN e.invalid_at_explicit
              ELSE least(e.invalid_at_explicit, c.conflict_invalid_at)
         END AS invalid_at,
         c.conflict_invalid_at, c.caused_by_edge_uuid, e.invalid_at_explicit
  FROM edges0 e LEFT JOIN confl c ON e.uuid = c.uuid)
"""


def _add_triplets_sql() -> str:
    """Independent recompute of q_add_triplets (__spark_entry__.py): the
    same literal assertions through dedup + temporal algebra in SQL."""
    return f"""
    WITH raw AS (
      SELECT * FROM (VALUES
        ('g0', 'Ana Ruiz', 'LIVES_IN', 'Quito City', TIMESTAMP '2024-01-01'),
        ('g0', 'Ana Ruiz', 'LIVES_IN', 'Lima City',  TIMESTAMP '2024-06-01'),
        ('g0', 'Ana Ruiz', 'LIVES_IN', 'Quito City', TIMESTAMP '2024-01-01'),
        ('g0', 'Bo Chen', 'WORKS_FOR', 'Glowco',     TIMESTAMP '2024-02-01'),
        ('g0', 'Bo Chen', 'LEFT_JOB', 'Glowco',      TIMESTAMP '2024-09-01')
      ) t(group_id, subject, predicate, object, valid_at_explicit)),
    tt AS (
      SELECT *,
        subject || ' ' || lower(replace(predicate, '_', ' ')) || ' '
          || object AS fact,
        {_norm('subject')} AS norm_subj, {_norm('object')} AS norm_obj
      FROM raw),
    tk AS (
      SELECT *, md5('ent|' || group_id || '|' || norm_subj) AS src_uuid,
                md5('ent|' || group_id || '|' || norm_obj) AS dst_uuid,
                {_norm_fact('fact')} AS norm_fact
      FROM tt),
    ded AS (
      SELECT group_id, src_uuid, predicate, dst_uuid, norm_fact,
             min(fact) AS fact, max(valid_at_explicit) AS valid_at,
             md5('edge|' || group_id || '|' || src_uuid || '|' || predicate
                 || '|' || dst_uuid || '|' || norm_fact) AS uuid
      FROM tk WHERE src_uuid <> dst_uuid
      GROUP BY group_id, src_uuid, predicate, dst_uuid, norm_fact),
    keyed AS (
      SELECT uuid, valid_at, predicate, dst_uuid AS obj, 'pair' AS scope,
             'pair|' || {_pair_class_case()} || '|' || least(src_uuid, dst_uuid)
               || '|' || greatest(src_uuid, dst_uuid) AS contra_key
      FROM ded WHERE predicate IN ({_in_list(CONTRA_PAIR_CLASSES)})
      UNION ALL
      SELECT uuid, valid_at, predicate, dst_uuid, 'subj',
             'subj|' || predicate || '|' || src_uuid
      FROM ded WHERE predicate IN ({_in_list(FUNCTIONAL_PREDICATES)})),
    confl AS (
      SELECT uuid, conflict_invalid_at FROM (
        SELECT k1.uuid, k2.valid_at AS conflict_invalid_at,
               row_number() OVER (PARTITION BY k1.uuid
                                  ORDER BY k2.valid_at, k2.uuid) AS rn
        FROM keyed k1 JOIN keyed k2 ON k1.contra_key = k2.contra_key
         AND k2.valid_at > k1.valid_at
         AND ((k1.scope = 'pair' AND k2.predicate <> k1.predicate)
              OR (k1.scope = 'subj' AND k2.obj <> k1.obj))
        WHERE k1.predicate NOT IN ({_in_list(EVENT_PREDICATES)})
      ) t WHERE rn = 1)
    SELECT d.uuid, d.src_uuid AS source_node_uuid,
           d.dst_uuid AS target_node_uuid, d.predicate AS name, d.fact,
           d.group_id, d.valid_at, c.conflict_invalid_at AS invalid_at
    FROM ded d LEFT JOIN confl c ON d.uuid = c.uuid
    ORDER BY d.uuid"""


def oracle_queries(d: str = KG_ORACLE_DIR) -> dict[str, str]:
    """DuckDB SQL twin per kg_* driver query."""
    pre = f"WITH RECURSIVE {_ctes(d)}"
    q = {}
    q["kg_nodes"] = pre + """
        SELECT uuid, name, group_id, labels, created_at, summary FROM nodes"""
    q["kg_mentions"] = pre + """
        SELECT uuid, episode_uuid, node_uuid, group_id, created_at FROM mentions"""
    q["kg_edges"] = pre + f"""
        SELECT uuid, source_node_uuid, target_node_uuid, name, fact, group_id,
               created_at, valid_at, invalid_at,
               CASE WHEN invalid_at IS NOT NULL THEN {BATCH_TS_SQL} END
                 AS expired_at
        FROM edges_final"""
    q["kg_invalidations"] = pre + f"""
        SELECT uuid AS edge_uuid, conflict_invalid_at AS invalid_at,
               {BATCH_TS_SQL} AS expired_at, caused_by_edge_uuid, group_id
        FROM edges_final
        WHERE conflict_invalid_at IS NOT NULL
          AND (invalid_at_explicit IS NULL
               OR conflict_invalid_at < invalid_at_explicit)"""
    q["kg_previous_instances"] = pre + r"""
        , dyn AS (
          SELECT *, trim(regexp_replace(regexp_replace(
                 norm_name, '\d{4} \d{2} \d{2}', ' ', 'g'),
                 ' +', ' ', 'g')) AS base
          FROM entities WHERE is_dynamic),
        chain AS (
          SELECT *, lag(ext_uuid) OVER w AS prev_uuid,
                 lag(name) OVER w AS prev_name
          FROM dyn
          WINDOW w AS (PARTITION BY group_id, base
                       ORDER BY first_seen, ext_uuid))
        SELECT md5('previnst|' || group_id || '|' || ext_uuid || '|'
                   || prev_uuid) AS uuid,
               ext_uuid AS source_node_uuid, prev_uuid AS target_node_uuid,
               'PREVIOUS_INSTANCE' AS name,
               name || ' is a recurrence of ' || prev_name AS fact,
               group_id, first_seen AS created_at
        FROM chain WHERE prev_uuid IS NOT NULL"""
    q["kg_communities"] = pre + f"""
        , lp AS (SELECT * FROM '{d}/lp_labels.parquet'),
        sized AS (SELECT group_id, community_id FROM lp
                  GROUP BY group_id, community_id HAVING count(*) > 1),
        membs AS (SELECT lp.group_id, lp.uuid, lp.community_id
                  FROM lp JOIN sized USING (group_id, community_id)),
        cnamed AS (
          SELECT m.group_id, m.community_id, count(*)::BIGINT AS n_members,
                 (list_sort(list(n.name)))[1:5] AS top_names
          FROM membs m JOIN nodes n
            ON n.group_id = m.group_id AND n.uuid = m.uuid
          GROUP BY m.group_id, m.community_id)
        SELECT md5('comm|' || group_id || '|' || community_id) AS uuid,
               group_id, community_id, n_members,
               array_to_string(top_names, ', ') AS name,
               'Community of ' || n_members::VARCHAR || ' entities: '
                 || array_to_string(top_names, ', ') AS summary
        FROM cnamed"""
    # incremental community attach (update_community analog) — the
    # modal-neighbor rule, the round-by-round cascade (INCREMENT_ROUNDS,
    # matching the Spark query's max_rounds) and the unassigned remainder,
    # re-derived from the same materialized old-label table the Spark side
    # recomputes deterministically (LP local fixpoint)
    ia = [f"""
        , lpo AS (SELECT group_id, uuid, community_id
                  FROM '{d}/lp_labels_old.parquet'),
        ia_undg AS (
          -- NO dedup: the modal vote is weighted by edge multiplicity
          -- (the reference's determine_entity_community counts per
          -- RELATES_TO relationship, not per distinct neighbor), so each
          -- parallel edge contributes one row and count(*) below equals
          -- the Spark side's sum(weight) over the aggregated adjacency
          SELECT group_id, a, b FROM (
            SELECT group_id, source_node_uuid AS a,
                   target_node_uuid AS b FROM edges_final
            UNION ALL
            SELECT group_id, target_node_uuid, source_node_uuid
            FROM edges_final) ia_raw),
        ia_rem0 AS (
          SELECT v.group_id, v.uuid FROM (
            SELECT DISTINCT group_id, a AS uuid FROM ia_undg) v
          LEFT JOIN lpo ON lpo.group_id = v.group_id AND lpo.uuid = v.uuid
          WHERE lpo.uuid IS NULL),
        ia_k0 AS (SELECT group_id, uuid, community_id FROM lpo)"""]
    for rr in range(1, INCREMENT_ROUNDS + 1):
        ia.append(f""",
        ia_r{rr} AS (
          SELECT group_id, a AS uuid, community_id FROM (
            SELECT u.group_id, u.a, k.community_id,
                   row_number() OVER (PARTITION BY u.group_id, u.a
                                      ORDER BY count(*) DESC,
                                               k.community_id) AS rn
            FROM ia_undg u
            JOIN ia_rem{rr - 1} nn
              ON nn.group_id = u.group_id AND nn.uuid = u.a
            JOIN ia_k{rr - 1} k
              ON k.group_id = u.group_id AND k.uuid = u.b
            GROUP BY u.group_id, u.a, k.community_id) WHERE rn = 1),
        ia_k{rr} AS (SELECT * FROM ia_k{rr - 1}
                     UNION ALL SELECT * FROM ia_r{rr}),
        ia_rem{rr} AS (
          SELECT nn.group_id, nn.uuid FROM ia_rem{rr - 1} nn
          LEFT JOIN ia_r{rr} a ON a.group_id = nn.group_id
                              AND a.uuid = nn.uuid
          WHERE a.uuid IS NULL)""")
    q["kg_incremental_attach"] = pre + "".join(ia) + "".join(
        f"""
        SELECT group_id, uuid, community_id, 'attached' AS status
        FROM ia_r{rr}
        UNION ALL""" for rr in range(1, INCREMENT_ROUNDS + 1)) + f"""
        SELECT group_id, uuid, NULL::VARCHAR AS community_id,
               'unassigned' AS status
        FROM ia_rem{INCREMENT_ROUNDS}"""
    q["kg_bfs"] = pre + """
        , topn AS (SELECT node_uuid FROM mentions GROUP BY node_uuid
                   ORDER BY count(*) DESC, node_uuid LIMIT 1),
        undg AS (SELECT source_node_uuid AS a, target_node_uuid AS b
                 FROM edges_final
                 UNION
                 SELECT target_node_uuid, source_node_uuid FROM edges_final),
        d1 AS (SELECT DISTINCT u.b AS uuid FROM undg u
               JOIN topn t ON u.a = t.node_uuid
               WHERE u.b NOT IN (SELECT node_uuid FROM topn)),
        d2 AS (SELECT DISTINCT u.b AS uuid FROM undg u
               JOIN d1 ON u.a = d1.uuid
               WHERE u.b NOT IN (SELECT node_uuid FROM topn)
                 AND u.b NOT IN (SELECT uuid FROM d1))
        SELECT uuid, dist FROM (
          SELECT node_uuid AS uuid, 0 AS dist FROM topn
          UNION ALL SELECT uuid, 1 FROM d1
          UNION ALL SELECT uuid, 2 FROM d2) t
        ORDER BY uuid"""
    q["kg_node_distance"] = pre + """
        , topn AS (SELECT node_uuid FROM mentions GROUP BY node_uuid
                   ORDER BY count(*) DESC, node_uuid LIMIT 1),
        undg AS (SELECT source_node_uuid AS a, target_node_uuid AS b
                 FROM edges_final
                 UNION
                 SELECT target_node_uuid, source_node_uuid FROM edges_final),
        d1 AS (SELECT DISTINCT u.b AS uuid FROM undg u
               JOIN topn t ON u.a = t.node_uuid
               WHERE u.b NOT IN (SELECT node_uuid FROM topn)),
        d2 AS (SELECT DISTINCT u.b AS uuid FROM undg u JOIN d1 ON u.a = d1.uuid
               WHERE u.b NOT IN (SELECT node_uuid FROM topn)
                 AND u.b NOT IN (SELECT uuid FROM d1)),
        d3 AS (SELECT DISTINCT u.b AS uuid FROM undg u JOIN d2 ON u.a = d2.uuid
               WHERE u.b NOT IN (SELECT node_uuid FROM topn)
                 AND u.b NOT IN (SELECT uuid FROM d1)
                 AND u.b NOT IN (SELECT uuid FROM d2)),
        dists AS (
          SELECT node_uuid AS uuid, 0 AS dist FROM topn
          UNION ALL SELECT uuid, 1 FROM d1
          UNION ALL SELECT uuid, 2 FROM d2
          UNION ALL SELECT uuid, 3 FROM d3)
        SELECT n.uuid, coalesce(d.dist, 1000000000) AS dist
        FROM nodes n LEFT JOIN dists d ON n.uuid = d.uuid
        ORDER BY dist, n.uuid LIMIT 20"""
    q["add_triplets"] = _add_triplets_sql()
    key5 = "group_id, src_uuid, predicate, dst_uuid, norm_fact"
    edge_uuid = ("md5('edge|' || group_id || '|' || src_uuid || '|' || "
                 "predicate || '|' || dst_uuid || '|' || norm_fact)")
    q["kg_provenance_sort"] = pre + f"""
        , occ AS (SELECT {edge_uuid} AS uuid, url FROM base)
        SELECT uuid, count(DISTINCT url)::BIGINT AS n_episodes,
               array_to_string(list_sort(list(DISTINCT url)), ',') AS episodes
        FROM occ GROUP BY uuid"""
    q["kg_priority_boost"] = pre + f"""
        , pl AS (SELECT url, lang FROM '{d}/pages_meta.parquet'),
        occn AS (SELECT {edge_uuid} AS uuid,
                        count(DISTINCT url)::DOUBLE AS score,
                        list(DISTINCT url) AS urls
                 FROM base GROUP BY {key5}),
        prio AS (SELECT DISTINCT o.uuid
                 FROM (SELECT uuid, unnest(urls) AS url FROM occn) o
                 JOIN pl ON o.url = pl.url AND pl.lang = 'en')
        SELECT o.uuid,
               round(o.score + CASE WHEN p.uuid IS NOT NULL
                                    THEN 0.2 ELSE 0 END, 4) AS score
        FROM occn o LEFT JOIN prio p ON o.uuid = p.uuid"""
    q["kg_hybrid_search"] = pre + f"""
        , nemb AS (
          SELECT n.uuid, n.name, e.name_embedding::DOUBLE[] AS v
          FROM nodes n JOIN emb e
            ON e.group_id = n.group_id AND e.norm_name = n.rep_norm),
        qe AS (SELECT embedding::DOUBLE[] AS qv FROM '{d}/query_emb.parquet'),
        ntoks AS (SELECT uuid, unnest(list_filter(
                    string_split_regex(lower(name), '[^a-z0-9]+'),
                    t -> t <> '')) AS tok
                  FROM nemb),
        ndl AS (SELECT uuid, count(*)::DOUBLE AS dlen FROM ntoks GROUP BY uuid),
        nst AS (SELECT count(*)::DOUBLE AS n_docs, avg(dlen) AS avgdl FROM ndl),
        ntf AS (SELECT uuid, tok, count(*)::DOUBLE AS tf FROM ntoks
                WHERE tok IN ('priya', 'sharma') GROUP BY uuid, tok),
        ndf AS (SELECT tok, count(DISTINCT uuid)::DOUBLE AS dfreq
                FROM ntf GROUP BY tok),
        -- Lucene BM25, k1=1.2 b=0.75 (kgspark/fulltext.py twin).
        -- The filter/order/top-40 candidate cut happens on the RAW score
        -- inside the subquery (matching bm25_search/similarity_search,
        -- which cut before hybrid_search rounds); DuckDB binds an outer
        -- ORDER BY to the rounded select alias, which would let a lower
        -- raw score win a rounded tie at the boundary.
        ft AS (SELECT uuid, round(score, 9) AS score FROM (
                 SELECT uuid, score FROM (
                   SELECT t.uuid,
                          sum(ln(1 + (s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5))
                              * t.tf / (t.tf + 1.2 * (1 - 0.75
                                        + 0.75 * l.dlen / s.avgdl))) AS score
                   FROM ntf t JOIN ndf d USING (tok) JOIN ndl l USING (uuid),
                        nst s
                   GROUP BY t.uuid) raw
                 WHERE score > 0 ORDER BY score DESC, uuid LIMIT 40) t),
        sim AS (SELECT uuid, round(score, 9) AS score FROM (
                  SELECT uuid, score FROM (
                    SELECT n.uuid, list_cosine_similarity(n.v, q.qv) AS score
                    FROM nemb n, qe q) raw
                  WHERE score > 0.6 ORDER BY score DESC, uuid LIMIT 40) t),
        ranked AS (
          SELECT uuid, row_number() OVER (ORDER BY score DESC, uuid) AS rank
          FROM ft
          UNION ALL
          SELECT uuid, row_number() OVER (ORDER BY score DESC, uuid) AS rank
          FROM sim)
        SELECT uuid, round(sum(1.0 / (rank + 1)), 8) AS rrf_score
        FROM ranked GROUP BY uuid
        ORDER BY rrf_score DESC, uuid LIMIT 20"""

    # hybrid_node_search twin (search_utils.py:564-631; search.py
    # hybrid_node_search): one bm25 leg per query + one cosine leg per
    # embedding, EACH capped at 2*limit on the RAW score, rounded to 9
    # before rank, RRF-fused with NO global limit (the reference returns
    # every deduped hit — tests/utils/search/search_utils_test.py:90-130)
    from kgspark.fulltext import py_tokens
    hns_parts, hns_ranked = [], []
    for i, hq in enumerate(HNS_QUERIES):
        toks = ", ".join(f"'{t}'" for t in py_tokens(hq)[:32])
        hns_parts.append(f"""
        ntf{i} AS (SELECT uuid, tok, count(*)::DOUBLE AS tf FROM ntoks
                   WHERE tok IN ({toks}) GROUP BY uuid, tok),
        ndf{i} AS (SELECT tok, count(DISTINCT uuid)::DOUBLE AS dfreq
                   FROM ntf{i} GROUP BY tok),
        ft{i} AS (SELECT uuid, round(score, 9) AS score FROM (
                    SELECT uuid, score FROM (
                      SELECT t.uuid,
                             sum(ln(1 + (s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5))
                                 * t.tf / (t.tf + 1.2 * (1 - 0.75
                                           + 0.75 * l.dlen / s.avgdl))) AS score
                      FROM ntf{i} t JOIN ndf{i} d USING (tok)
                           JOIN ndl l USING (uuid), nst s
                      GROUP BY t.uuid) raw
                    WHERE score > 0
                    ORDER BY score DESC, uuid LIMIT {2 * HNS_LIMIT}) t),
        sim{i} AS (SELECT uuid, round(score, 9) AS score FROM (
                     SELECT uuid, score FROM (
                       SELECT n.uuid, list_cosine_similarity(n.v, q.qv) AS score
                       FROM nemb n,
                            (SELECT embedding::DOUBLE[] AS qv
                             FROM '{d}/hns_query_emb.parquet'
                             WHERE qi = {i}) q) raw
                     WHERE score > 0.6
                     ORDER BY score DESC, uuid LIMIT {2 * HNS_LIMIT}) t)""")
        for leg in ("ft", "sim"):
            hns_ranked.append(
                f"""          SELECT uuid,
                 row_number() OVER (ORDER BY score DESC, uuid) AS rank
          FROM {leg}{i}""")
    q["kg_hybrid_node_search"] = pre + f"""
        , nemb AS (
          SELECT n.uuid, n.name, e.name_embedding::DOUBLE[] AS v
          FROM nodes n JOIN emb e
            ON e.group_id = n.group_id AND e.norm_name = n.rep_norm),
        ntoks AS (SELECT uuid, unnest(list_filter(
                    string_split_regex(lower(name), '[^a-z0-9]+'),
                    t -> t <> '')) AS tok
                  FROM nemb),
        ndl AS (SELECT uuid, count(*)::DOUBLE AS dlen FROM ntoks GROUP BY uuid),
        nst AS (SELECT count(*)::DOUBLE AS n_docs, avg(dlen) AS avgdl FROM ndl),
        {",".join(hns_parts)},
        ranked AS (
{chr(10).join("          UNION ALL" + chr(10) + p if j else p
              for j, p in enumerate(hns_ranked))})
        SELECT uuid, round(sum(1.0 / (rank + 1)), 8) AS rrf_score
        FROM ranked GROUP BY uuid"""

    # --- EpisodeType dispatch oracles: re-derive the message/json
    # extraction rules from RAW page content (textcore.extract_message_*/
    # extract_json_* twins; reference node_operations.py:67-124,177-187).
    # These bypass mentions_raw/triples_raw entirely — a dispatch bug on
    # the Spark side (wrong variant, wrong speaker rule, wrong field rule)
    # breaks the hash even though the materialized intermediates "agree".
    spk_re = r"^([A-Za-z][A-Za-z0-9_ .\-]{0,63}?):\s"
    q["kg_message_speakers"] = f"""
        WITH pm AS (SELECT url, content FROM '{d}/pages_meta.parquet'
                    WHERE source = 'message'),
        lines AS (SELECT url, trim(unnest(string_split(content, chr(10)))) AS line
                  FROM pm)
        SELECT DISTINCT url,
               trim(regexp_extract(line, '{spk_re}', 1)) AS name
        FROM lines
        WHERE regexp_matches(line, '{spk_re}')"""
    rel_keys = ", ".join(f"'{k}'" for k in sorted(JSON_RELATION_KEYS))
    json_kv = f"""
        pm AS (SELECT url, content FROM '{d}/pages_meta.parquet'
               WHERE source = 'json'),
        kv AS (SELECT url, content, unnest(json_keys(content)) AS k FROM pm),
        vals AS (SELECT url, k,
                        trim(json_extract_string(content, '$.' || k)) AS v
                 FROM kv)"""
    ent_key = (r"(regexp_matches(k, '(^name$|_name$|_id$|_sku$)') "
               f"OR k IN ({rel_keys}))")

    def usable(v: str) -> str:  # textcore.json_entity_fields value filter
        return (f"({v} IS NOT NULL AND {v} <> '' AND NOT "
                + r"regexp_matches(" + v + r", '^\d{4}-\d{2}-\d{2}'))")

    q["kg_json_mentions"] = f"""
        WITH {json_kv}
        SELECT DISTINCT url, v AS name FROM vals
        WHERE {usable('v')} AND {ent_key}"""
    # subject = the 'name' field (the fixture always carries one; the
    # python rule's first-*_name fallback is unit-tested instead)
    q["kg_json_triples"] = f"""
        WITH {json_kv},
        subj AS (SELECT url,
                        trim(json_extract_string(content, '$.name')) AS subject,
                        coalesce(
                          try_cast(json_extract_string(content, '$.since') AS TIMESTAMP),
                          try_cast(json_extract_string(content, '$.valid_from') AS TIMESTAMP)
                        ) AS valid_at_explicit
                 FROM pm)
        SELECT DISTINCT r.url, s.subject, upper(r.k) AS predicate,
               r.v AS object,
               s.subject || ' ' || r.k || ' ' || r.v || '.' AS fact,
               s.valid_at_explicit
        FROM vals r JOIN subj s USING (url)
        WHERE r.k IN ({rel_keys}) AND {usable('r.v')}
          AND s.subject IS NOT NULL AND s.subject <> '' AND r.v <> s.subject"""

    # --- typed-attribute extraction oracle: independent re-derivation of
    # the Metro entity set (regexp over the literal pages), the per-
    # attribute pattern extraction, AND the latest-warc_ts-wins override
    # (entity_types.extract_attributes + the pipeline aggregate).
    attr_values = ",\n        ".join(
        f"('{u}', TIMESTAMP '{ts}', '{t.replace(chr(10), ' ')}')"
        for u, ts, t in KG_ATTR_PAGES)
    q["kg_typed_attributes"] = f"""
        WITH ap(url, warc_ts, text) AS (VALUES
        {attr_values}),
        metros AS (
          SELECT DISTINCT unnest(
            regexp_extract_all(text, '[A-Z][a-z]+ City')) AS name FROM ap),
        hits AS (
          SELECT m.name, p.warc_ts,
                 regexp_extract(p.text,
                   m.name || ' is located in ([A-Z][a-z]+)', 1) AS v
          FROM metros m CROSS JOIN ap p),
        best AS (
          SELECT name, v FROM (
            SELECT name, v, row_number() OVER (
              PARTITION BY name ORDER BY warc_ts DESC) AS rn
            FROM hits WHERE v <> '') t WHERE rn = 1)
        SELECT m.name, 'country' AS k, coalesce(b.v, 'unknown') AS v
        FROM metros m LEFT JOIN best b USING (name)
        UNION ALL
        SELECT name, 'tier', 'metro' FROM metros"""
    return q
