"""Isolated A/B bench for dedup_edges variants.

Materializes the canonical-triples input (the dedup input in the real DAG)
once to parquet, then times each variant over the same input several times.

Usage: [taskset -c 0-7] python tools/dedup_ab.py <pages> <cpus> <variant>[,variant...]
Variants: ``salted`` (two-phase, n_salts=16) | ``nosalt`` (single-phase) |
``uuidkey`` (single-phase but grouped on the 16-byte md5 class uuid instead
of the 5 wide string key columns, which ride along as cheap ``first``
aggregates — narrower grouping hash/compare state for the same output),
each optionally prefixed ``lowfb-`` to restore the 128-key
ObjectHashAggregate sort-fallback threshold that kgspark/session.py raises
(e.g. ``salted,nosalt,lowfb-nosalt``).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def materialize_input(spark, n_pages: int, path: str):
    from kgspark import cc, linking, udfs
    from kgspark.datagen import pages_spark

    richness = int(os.environ.get("KGSPARK_SCALING_RICHNESS", "3"))
    pages_dir = f"/dev/shm/kgprof_pages_{n_pages}"
    if not Path(pages_dir, "_SUCCESS").exists():
        pages_spark(spark, n_pages, richness=richness, partitions=128) \
            .write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    from pyspark.sql import functions as F  # noqa: N812
    mentions_raw = udfs.extract_mentions(pages)
    entities = linking.distinct_entities(mentions_raw).localCheckpoint()
    emb = udfs.embed_entities(entities)
    pairs = linking.candidate_pairs(entities)
    alias_pairs = linking.score_pairs(entities, pairs, emb=emb)
    mapping = cc.connected_components(alias_pairs)
    triples_raw = udfs.extract_triples(pages)
    ent_key = entities.select("group_id", "norm_name", "ext_uuid")
    keyed = (
        triples_raw
        .join(ent_key.withColumnRenamed("norm_name", "norm_subj")
              .withColumnRenamed("ext_uuid", "src_uuid"), ["group_id", "norm_subj"])
        .join(ent_key.withColumnRenamed("norm_name", "norm_obj")
              .withColumnRenamed("ext_uuid", "dst_uuid"), ["group_id", "norm_obj"])
    )
    canon = cc.resolve_pointers(keyed, mapping, ["src_uuid", "dst_uuid"])
    canon.write.mode("overwrite").parquet(path)


def main() -> None:
    n_pages, cpus = int(sys.argv[1]), int(sys.argv[2])
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else ["base"]
    from kgspark import dedup
    from kgspark.session import get_spark
    spark = get_spark("dedup-ab", cpus=cpus, shuffle_partitions=4 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    inp = f"/dev/shm/dedup_ab_input_{n_pages}"
    if not Path(inp, "_SUCCESS").exists():
        materialize_input(spark, n_pages, inp)
    triples = spark.read.parquet(inp)
    print("input_rows", triples.count(), file=sys.stderr)

    def cpu_ticks():
        parts = open("/proc/stat").readline().split()
        vals = [int(x) for x in parts[1:]]
        # user+nice+system+irq+softirq, idle+iowait, steal
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        return busy, vals[3] + vals[4], vals[7]

    def run(name, fn, runs=3):
        times, steals = [], []
        for _ in range(runs):
            b0, i0, s0 = cpu_ticks()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
            b1, i1, s1 = cpu_ticks()
            tot = (b1 - b0) + (i1 - i0) + (s1 - s0)
            steals.append(round(100 * (s1 - s0) / max(tot, 1), 1))
        print("RESULT " + json.dumps({"variant": name, "cpus": cpus,
                                      "runs_sec": times, "steal_pct": steals,
                                      "best": min(times)}))

    for v in variants:
        # variant grammar: [lowfb-]salted|nosalt ; lowfb- restores the 128
        # default ObjectHashAggregate fallback threshold (session.py now
        # raises it)
        name = v
        if v.startswith("lowfb-"):
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
            v = v.removeprefix("lowfb-")
        else:
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(4 * 1024 * 1024))
        if v == "salted":
            run(name, lambda: dedup.dedup_edges(triples, n_salts=16))
        elif v == "nosalt":
            run(name, lambda: dedup.dedup_edges(triples, n_salts=0))
        elif v == "uuidkey":
            run(name, lambda: _dedup_uuidkey(triples))
        else:
            raise SystemExit(f"unknown variant {v}")


def _dedup_uuidkey(triples):
    """dedup_edges single-phase plan, but grouped on the md5 class uuid.

    The 5 KEY columns are functionally determined by the uuid, so they ride
    along as ``first`` aggregates (no per-row comparisons) while grouping
    hashes/compares one 32-char column instead of five (~150 chars incl. the
    free-text norm_fact)."""
    from pyspark.sql import functions as F  # noqa: N812
    from kgspark.dedup import KEY, MAX_PROVENANCE, _class_aggs

    base = (
        triples.filter(F.col("src_uuid") != F.col("dst_uuid"))
        .withColumn("uuid", F.md5(F.concat_ws(
            "|", F.lit("edge"), F.col("group_id"), F.col("src_uuid"),
            F.col("predicate"), F.col("dst_uuid"), F.col("norm_fact"))))
    )
    classes = base.groupBy("uuid").agg(
        *[F.first(k).alias(k) for k in KEY], *_class_aggs(MAX_PROVENANCE))
    return classes.select(
        *KEY,
        F.col("first_occ.fact").alias("fact"),
        "episodes", "created_at", "n_occurrences",
        F.coalesce(F.col("last_valid.valid_at_explicit"),
                   F.col("first_occ.warc_ts")).alias("valid_at"),
        F.col("last_invalid.invalid_at_explicit").alias("invalid_at_explicit"),
        "uuid")


if __name__ == "__main__":
    main()
