"""One fused kg_job run over a pre-generated corpus, with knobs.

Usage: python tools/kgjob_once.py <pages_dir> <cpus> <shuffle_partitions> [full]
Prints RESULT {...} with wall seconds. For A/B-ing session knobs on the
same input without paying generation each time. With the optional
``full`` arg, each timed run writes ALL output tables via io.write_tables
(the submit_kg_job shape — multi-action, exercises per-table subtree
reuse) instead of the single-action edges.count().

KGSPARK_JOB_RUNS overrides the timed-run count (default 2); each run's
epoch-ms window is printed so an event log (KGSPARK_EVENTLOG) can be
sliced per run when attributing driver gaps / stage costs."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    pages_dir, cpus, parts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    full = len(sys.argv) > 4 and sys.argv[4] == "full"
    from kgspark import io
    from kgspark.pipeline import build_graph
    from kgspark.session import get_spark
    spark = get_spark("kgjob-once", cpus=cpus, shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()  # parquet metadata count — cheap, and lets
    # downstream tooling record pages/sec from the job itself instead of
    # trusting an env default (ADVICE r4)
    # warmup
    wp = pages.limit(2000).localCheckpoint()
    build_graph(wp, check_text=False, compute_embeddings=False)["edges"].count()
    import os
    n_runs = int(os.environ.get("KGSPARK_JOB_RUNS", "2"))
    runs, windows = [], []
    for i in range(n_runs):
        t0 = time.time()
        out = build_graph(pages, check_text=False, compute_embeddings=False)
        if full:
            import shutil
            dest = f"/dev/shm/kgjob_full_out_{cpus}"
            shutil.rmtree(dest, ignore_errors=True)
            io.write_tables(out, dest)
            n = spark.read.parquet(f"{dest}/edges").count()
        else:
            n = out["edges"].count()
        t1 = time.time()
        runs.append(round(t1 - t0, 2))
        windows.append([int(t0 * 1000), int(t1 * 1000)])
    print("RESULT " + json.dumps({"cpus": cpus, "parts": parts, "full": full,
                                  "edges": n, "pages": n_pages,
                                  "runs_sec": runs,
                                  "best": min(runs), "windows_ms": windows}))


if __name__ == "__main__":
    main()
