"""Per-phase wall-clock profile of the KG-construction DAG.

Usage: python tools/phase_profile.py <pages> <cpus> [pages_dir]

Materializes each pipeline stage with a count() so phase costs are
attributed; the extra materializations make the total larger than the
fused bench number — the point is the RATIO of each phase across corpus
sizes / parallelism levels, not the absolute sum. Generates the corpus
to [pages_dir] (default /dev/shm/kgprof_<pages>) once and reuses it.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_pages = int(sys.argv[1])
    cpus = int(sys.argv[2])
    pages_dir = sys.argv[3] if len(sys.argv) > 3 else f"/dev/shm/kgprof_{n_pages}"
    richness = int(os.environ.get("KGSPARK_SCALING_RICHNESS", "3"))

    from kgspark import cc, dedup, linking, temporal, udfs
    from kgspark.datagen import pages_spark
    from kgspark.session import get_spark

    spark = get_spark("kgprof", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    if not Path(pages_dir, "_SUCCESS").exists():
        pages_spark(spark, n_pages, richness=richness, partitions=128) \
            .write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir).select(
        "url", "group_id", "warc_ts", "html", "text", "lang")

    # warmup: small pass to compile codegen / spin python workers
    from kgspark.pipeline import build_graph
    t0 = time.time()
    wpages = pages.limit(2000).localCheckpoint()
    build_graph(wpages, check_text=False, compute_embeddings=False)["edges"].count()
    warm = time.time() - t0

    phases: dict[str, float] = {}

    def clock(name: str, fn):
        t = time.time()
        out = fn()
        phases[name] = round(time.time() - t, 2)
        return out

    mentions_raw = udfs.extract_mentions(pages)
    entities = clock("1_extract+distinct_entities",
                     lambda: linking.distinct_entities(mentions_raw).localCheckpoint())
    emb_all = clock("2_embed_entities",
                    lambda: udfs.embed_entities(entities).localCheckpoint())
    pairs = clock("3_candidate_pairs",
                  lambda: linking.candidate_pairs(entities).localCheckpoint())
    alias_pairs = clock("4_score_pairs",
                        lambda: linking.score_pairs(entities, pairs, emb=emb_all)
                        .localCheckpoint())
    mapping = clock("5_connected_components",
                    lambda: cc.connected_components(alias_pairs).localCheckpoint())
    triples_raw = udfs.extract_triples(pages)
    ent_key = entities.select("group_id", "norm_name", "ext_uuid")
    from pyspark.sql import functions as F  # noqa: N812
    triples_keyed = (
        triples_raw
        .join(ent_key.withColumnRenamed("norm_name", "norm_subj")
              .withColumnRenamed("ext_uuid", "src_uuid"), ["group_id", "norm_subj"])
        .join(ent_key.withColumnRenamed("norm_name", "norm_obj")
              .withColumnRenamed("ext_uuid", "dst_uuid"), ["group_id", "norm_obj"])
    )
    triples_canon = clock(
        "6_extract_triples+entity_join",
        lambda: cc.resolve_pointers(triples_keyed, mapping,
                                    ["src_uuid", "dst_uuid"]).localCheckpoint())
    edges_merged = clock("7_dedup_edges",
                         lambda: dedup.dedup_edges(triples_canon).localCheckpoint())
    from datetime import datetime
    edges_resolved, _inval = temporal.temporal_pass(edges_merged, datetime(2025, 1, 1))
    n_edges = clock("8_temporal_pass", lambda: edges_resolved.count())

    counts = {"pages": n_pages, "entities": entities.count(),
              "pairs": pairs.count(), "alias_pairs": alias_pairs.count(),
              "triples_canon": triples_canon.count(),
              "edges_merged": edges_merged.count(), "edges": n_edges}
    print("PROFILE " + json.dumps({
        "cpus": cpus, "richness": richness, "warmup_sec": round(warm, 1),
        "phases": phases, "total_phases": round(sum(phases.values()), 1),
        "counts": counts}))


if __name__ == "__main__":
    main()
