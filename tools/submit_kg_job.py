"""spark-submit entrypoint for the KG-construction DAG (north-rule launch
mode: ``spark-submit --py-files kgspark.zip tools/submit_kg_job.py ...``).

Unlike the test/bench harnesses this file does NOT put the repo on
``sys.path`` — the ``kgspark`` package must arrive via ``--py-files`` (or an
installed wheel), exactly as it would on a real multi-executor cluster:

    cd /root/repo && zip -qr /tmp/kgspark.zip kgspark
    spark-submit --master local[8] --py-files /tmp/kgspark.zip \
        tools/submit_kg_job.py <pages_parquet_dir> <output_dir> [--resumable]

Size the driver/executors in the submit conf as on any cluster. In
LOCAL master mode everything (tasks, Arrow transfers, broadcast) lives
in the driver JVM, so pass --driver-memory explicitly — the 1g default
dies with a netty direct-buffer OOM around 10^6 pages (measured at
1.6M pages / local[32]; --driver-memory 48g completes).

The session comes from ``SparkSession.builder.getOrCreate()`` with no
master/memory overrides, so whatever cluster manager and sizing
spark-submit was given is what runs the job. Scale-relevant SQL conf that
the DAG is designed around (AQE + skew-join, Arrow) is applied as runtime
SQL conf; shuffle partitioning follows ``spark.sql.shuffle.partitions``
from the submit conf (defaulted here to 4x parallelism if unset by the
launcher, mirroring kgspark/session.py).

Writes the full table set (nodes, edges, mentions, episodes,
edge_invalidations, previous_instance_edges) partitioned by group_id under
<output_dir>, with per-group lineage rows when --resumable is given
(checkpoint-resume: re-submitting skips completed groups). Prints one
METRICS json line.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    pages_dir, out_dir = args
    resumable = "--resumable" in sys.argv

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kgspark-submit").getOrCreate()
    # runtime SQL conf the DAG assumes (safe to set post-launch; cluster
    # sizing itself stays whatever spark-submit was given)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        par = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(4 * par, 8)))

    from kgspark import io
    from kgspark.pipeline import build_graph

    pages = spark.read.parquet(pages_dir)
    t0 = time.time()
    if resumable:
        metrics = io.run_resumable(spark, pages, out_dir)
        n_edges = io.read_table(spark, out_dir, "edges").count()
    else:
        out = build_graph(pages, check_text=False, compute_embeddings=False)
        io.write_tables(out, out_dir)
        n_edges = io.read_table(spark, out_dir, "edges").count()
        metrics = None
    wall = time.time() - t0
    n_pages = pages.count()
    print("METRICS " + json.dumps({
        "pages": n_pages, "edges": n_edges, "sec": round(wall, 2),
        "pages_per_sec": round(n_pages / wall, 1),
        "triples_per_sec": round(n_edges / wall, 1),
        "resumable": resumable,
        "groups_processed": metrics and metrics.get("groups_processed"),
        "groups_skipped": metrics and metrics.get("groups_skipped"),
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
