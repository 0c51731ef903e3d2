"""Single-process oracle: replays the reference's per-episode incremental
semantics (add_episode lifecycle, /root/reference/graphiti_core/
graphiti.py:189-437; bulk path bulk_processor.py:518-663) over a pandas
``pages`` table, using the SAME pure extraction core (kgspark.textcore) the
Spark DAG uses.

The Spark pipeline is graded against this oracle: triple P/R >= 0.95
(BASELINE.json metric). Episodes are processed in (warc_ts, url) order — the
reference's incremental contradiction machinery converges to the same
fixpoint as the batch window pass under that ordering (SURVEY.md §7.3
risk 2; see the self-expiry branch edge_operations.py:286-300).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from datetime import datetime

import pandas as pd

from kgspark import textcore as tc
from kgspark.dedup import MAX_PROVENANCE


@dataclass
class OEntity:
    ext_uuid: str
    group_id: str
    norm_name: str
    name: str                 # first-seen raw form (rep recomputed at end)
    label: str
    first_seen: datetime
    n_mentions: int = 0
    names: dict = field(default_factory=dict)  # raw name -> count

    def rep_name(self) -> str:
        # same tie-break as linking.distinct_entities: count, length, max
        return max(self.names.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))[0]


@dataclass
class OEdge:
    group_id: str
    src: str          # entity ext_uuid (canonicalized at the end)
    predicate: str
    dst: str
    fact: str
    norm_fact: str
    episodes: list = field(default_factory=list)
    created_at: datetime | None = None
    valid_at: datetime | None = None
    invalid_at_explicit: datetime | None = None
    first_key: tuple | None = None  # (warc_ts, url, fact) keep-first key
    # NOTE: fact participates in the key so same-(ts,url) ties resolve
    # lexicographically — bit-identical to dedup.py's
    # F.min(struct(warc_ts, url, fact))
    last_explicit_valid: tuple | None = None   # (warc_ts, url, ts)
    last_explicit_invalid: tuple | None = None


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-uuid canonical (same deterministic rule as kgspark.cc)
            lo, hi = sorted([ra, rb])
            self.parent[hi] = lo


def run_oracle(pages: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Returns nodes/edges/mentions/edge_invalidations pandas tables with the
    same identity scheme as the Spark DAG (md5 ext uuids, min-uuid canonical,
    md5 edge uuids over final canonical endpoints)."""
    entities: dict[str, OEntity] = {}           # ext_uuid -> entity
    by_band: dict[tuple, list[str]] = defaultdict(list)   # (group, band_key) -> ext_uuids
    by_block: dict[tuple, list[str]] = defaultdict(list)  # (group, first_token)
    uf = UnionFind()
    edges: list[OEdge] = []
    edge_index: dict[tuple, list[OEdge]] = defaultdict(list)
    mentions_rows: list[dict] = []

    ordered = pages.sort_values(["warc_ts", "url"]).reset_index(drop=True)

    for _, page in ordered.iterrows():
        url, gid = page["url"], page["group_id"]
        ts = page["warc_ts"].to_pydatetime() if hasattr(page["warc_ts"], "to_pydatetime") else page["warc_ts"]
        text = page["text"]
        source = page["source"] if "source" in page else "text"

        # 1. mention detection (node_operations.py:148-265 analog;
        # EpisodeType dispatch node_operations.py:177-187)
        page_mentions = tc.extract_mentions_for(source, text)
        name_to_uuid: dict[str, str] = {}
        for m in page_mentions:
            nn = tc.normalize_name(m.name)
            ext = tc.entity_uuid(gid, m.name)
            name_to_uuid[nn] = ext
            if ext in entities:
                e = entities[ext]
                e.n_mentions += 1
                e.names[m.name] = e.names.get(m.name, 0) + 1
            else:
                e = OEntity(ext, gid, nn, m.name, m.label, ts, 1, {m.name: 1})
                entities[ext] = e
                # 2. candidate search (get_relevant_nodes analog): same
                # blocking keys as the Spark DAG -> identical candidates
                cands: set[str] = set()
                if m.label != "DynamicEvent":
                    for bk in tc.minhash_band_keys(m.name):
                        key = (gid, bk)
                        cands.update(by_band[key])
                        by_band[key].append(ext)
                    tok0 = nn.split()[0]
                    cands.update(by_block[(gid, tok0)])
                    by_block[(gid, tok0)].append(ext)
                # 3. duplicate decision + union (resolve_extracted_node)
                # candidates are inserted only when non-dynamic (above),
                # so no DynamicEvent re-check is needed here — same
                # invariant as linking.candidate_pairs' filter
                for cand in sorted(cands):
                    other = entities[cand]
                    # pass the label-derived flags (both False here: dynamic
                    # mentions never reach candidate insertion above) so the
                    # spec rule uses the same authority as the Spark DAG's
                    # is_dynamic filter rather than re-classifying names
                    if tc.should_link(m.name, other.name,
                                      dynamic_a=m.label == "DynamicEvent",
                                      dynamic_b=other.label == "DynamicEvent"):
                        uf.union(ext, cand)
            mentions_rows.append({
                "episode_uuid": url, "node_uuid": ext, "group_id": gid,
                "created_at": ts,
            })

        # 4. triple extraction + dedup + dates (edge_operations analog)
        for t in tc.extract_triples_for(source, text, ts):
            src = name_to_uuid.get(tc.normalize_name(t.subject))
            dst = name_to_uuid.get(tc.normalize_name(t.object))
            if src is None or dst is None or src == dst:
                continue
            nf = tc.normalize_fact(t.fact)
            # duplicate search within the same (current-canonical) pair
            # (get_relevant_edges analog — pair-key indexed,
            # bulk_processor.py:437-453)
            existing = None
            csrc, cdst = uf.find(src), uf.find(dst)
            for e in edge_index.get((gid, t.predicate, nf), []):
                if uf.find(e.src) == csrc and uf.find(e.dst) == cdst:
                    existing = e
                    break
            if existing is None:
                existing = OEdge(gid, src, t.predicate, dst, t.fact, nf,
                                 created_at=ts, first_key=(ts, url, t.fact))
                edges.append(existing)
                edge_index[(gid, t.predicate, nf)].append(existing)
            elif (ts, url, t.fact) < existing.first_key:
                # same class restated in the same episode with a different
                # surface form: keep the struct-min fact, matching Spark
                existing.first_key = (ts, url, t.fact)
                existing.fact = t.fact
            existing.episodes.append(url)
            existing.created_at = min(existing.created_at, ts)
            if t.explicit_dates:
                # struct-max semantics (F.max(when(...)) over
                # (warc_ts, url, date)) — not last-in-document-order
                if t.valid_at is not None:
                    cand = (ts, url, t.valid_at)
                    if (existing.last_explicit_valid is None
                            or cand > existing.last_explicit_valid):
                        existing.last_explicit_valid = cand
                if t.invalid_at is not None:
                    cand = (ts, url, t.invalid_at)
                    if (existing.last_explicit_invalid is None
                            or cand > existing.last_explicit_invalid):
                        existing.last_explicit_invalid = cand

    # final consolidation (compress_uuid_map analog, bulk_utils.py:314-323):
    # canonicalize endpoints, re-merge edges that became identical
    final_edges: dict[tuple, OEdge] = {}
    for e in edges:
        src, dst = uf.find(e.src), uf.find(e.dst)
        if src == dst:
            continue
        k = (e.group_id, src, e.predicate, dst, e.norm_fact)
        if k in final_edges:
            f = final_edges[k]
            f.episodes = sorted(set(f.episodes) | set(e.episodes))[:MAX_PROVENANCE]
            f.created_at = min(f.created_at, e.created_at)
            if e.first_key < f.first_key:
                f.first_key, f.fact = e.first_key, e.fact
            for attr in ("last_explicit_valid", "last_explicit_invalid"):
                a, b = getattr(f, attr), getattr(e, attr)
                setattr(f, attr, max(x for x in (a, b) if x is not None)
                        if (a or b) else None)
        else:
            e2 = OEdge(e.group_id, src, e.predicate, dst, e.fact, e.norm_fact,
                       sorted(set(e.episodes))[:MAX_PROVENANCE], e.created_at, None, None,
                       e.first_key, e.last_explicit_valid, e.last_explicit_invalid)
            final_edges[k] = e2

    # temporal resolution (resolve_extracted_edge semantics run to fixpoint:
    # each fact closed by its earliest strictly-later conflicting fact)
    batch_ts = datetime(2025, 1, 1)
    rows = []
    for k, e in final_edges.items():
        e.valid_at = (e.last_explicit_valid[2] if e.last_explicit_valid
                      else e.first_key[0])
        e.invalid_at_explicit = (e.last_explicit_invalid[2]
                                 if e.last_explicit_invalid else None)
    keyed: dict[str, list[tuple]] = defaultdict(list)
    uuids = {}
    for k, e in final_edges.items():
        uid = tc.edge_uuid(e.group_id, e.src, e.predicate, e.dst, e.norm_fact)
        uuids[k] = uid
        for key in tc.contradiction_keys(e.src, e.predicate, e.dst):
            keyed[f"{e.group_id}|{key}"].append((e.valid_at, uid, e.predicate, e.dst))
    invalidation_rows = []
    for k, e in final_edges.items():
        uid = uuids[k]
        closer = None
        if e.predicate not in tc.EVENT_PREDICATES:
            for key in tc.contradiction_keys(e.src, e.predicate, e.dst):
                scope = key.split("|", 1)[0]
                for (va, ouid, opred, oobj) in keyed[f"{e.group_id}|{key}"]:
                    if va is None or e.valid_at is None or va <= e.valid_at:
                        continue
                    conflict = (opred != e.predicate if scope == "pair"
                                else oobj != e.dst)
                    if conflict and (closer is None or (va, ouid) < closer):
                        closer = (va, ouid)
        invalid_at = e.invalid_at_explicit
        caused_by = None
        if closer is not None and (invalid_at is None or closer[0] < invalid_at):
            invalid_at = closer[0]
            caused_by = closer[1]
        elif closer is not None:
            closer = None
        expired_at = batch_ts if invalid_at is not None else None
        if caused_by is not None:
            invalidation_rows.append({
                "edge_uuid": uid, "invalid_at": invalid_at,
                "expired_at": expired_at, "caused_by_edge_uuid": caused_by,
                "group_id": e.group_id,
            })
        rows.append({
            "uuid": uid, "source_node_uuid": e.src,
            "target_node_uuid": e.dst, "name": e.predicate, "fact": e.fact,
            "group_id": e.group_id, "episodes": e.episodes,
            "created_at": e.created_at, "valid_at": e.valid_at,
            "invalid_at": invalid_at, "expired_at": expired_at,
        })

    # nodes
    comp_members: dict[str, list[OEntity]] = defaultdict(list)
    for ext, ent in entities.items():
        comp_members[uf.find(ext)].append(ent)
    node_rows = []
    for canon, members in comp_members.items():
        rep = max(members, key=lambda m: (m.n_mentions, len(m.rep_name()), m.rep_name()))
        node_rows.append({
            "uuid": canon, "name": rep.rep_name(), "group_id": rep.group_id,
            "labels": sorted({tc.classify_name(m.rep_name()) for m in members} | {"Entity"}),
            "created_at": min(m.first_seen for m in members),
            "n_mentions": sum(m.n_mentions for m in members),
        })

    mentions_df = pd.DataFrame(mentions_rows)
    if len(mentions_df):
        mentions_df["node_uuid"] = mentions_df["node_uuid"].map(uf.find)
        mentions_df = mentions_df.drop_duplicates(["episode_uuid", "node_uuid"])

    return {
        "nodes": pd.DataFrame(node_rows),
        "edges": pd.DataFrame(rows),
        "mentions": mentions_df,
        "edge_invalidations": pd.DataFrame(invalidation_rows),
    }
