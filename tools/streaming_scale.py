"""Streaming-ingest scale evidence (round-4 brief: the small-fixture
convergence test exists; scale evidence didn't).

Runs ``streaming.incremental_ingest`` over a >=100k-page corpus split into
arrival-ordered micro-batch files, records per-batch wall times from the
StreamingQuery progress events, then verifies convergence-to-batch: the
streamed graph's edge table must equal a one-shot ``build_graph`` over the
same corpus (count + order-independent crc32 checksum over the bi-temporal
edge key). The result record is written to ``BENCH/streaming_scale.json``
and committed as the round's evidence.

Usage:
    python tools/streaming_scale.py [n_pages] [n_batches]   # 120000 6
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from kgspark import io as kio  # noqa: E402
from kgspark import streaming  # noqa: E402
from kgspark.datagen import PAGES_DDL, SEED, gen_pages_batch  # noqa: E402
from kgspark.pipeline import build_graph  # noqa: E402
from kgspark.session import get_spark  # noqa: E402

EDGE_KEY = ("uuid", "valid_at", "invalid_at")


def _batch_pages(spark, lo: int, hi: int, n_pages: int):
    """Arrival-ordered slice [lo, hi) of the SAME deterministic corpus
    pages_spark(n_pages) generates (gen_pages_batch is per-index pure)."""

    def gen(batches):
        for pdf in batches:
            yield gen_pages_batch(pdf["id"].tolist(), n_pages, SEED, 1)

    return spark.range(lo, hi, numPartitions=8).mapInPandas(gen, PAGES_DDL)


def _edge_sig(edges) -> tuple[int, int]:
    row = (edges.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws(
            "|", *[F.col(c).cast("string") for c in EDGE_KEY]))).alias("sig"))
        .first())
    return int(row["n"]), int(row["sig"])


def _index_convergence(spark, idx: dict, n_pages: int) -> dict:
    """Verify each stream-maintained index converges to a from-scratch
    result over the final corpus: BM25 scores float-exact vs a corpus
    bm25_search; ANN (full probe) and IVF (nprobe = n_clusters) top-10
    equal exact brute force over the same deterministic embeddings."""
    import math

    from kgspark import datapipe as dp
    from kgspark import fulltext, segments, udfs

    corpus = _batch_pages(spark, 0, n_pages, n_pages).localCheckpoint()
    out = {"fulltext_gens": segments.committed_gen(
               idx["fulltext_index_dir"]),
           "ann_gens": segments.committed_gen(idx["ann_index_dir"]),
           "ivf_gens": segments.committed_gen(idx["ivf_index_dir"])}
    ft_ok = True
    for qy in ("works for", "acquired the"):
        scan = {r["url"]: r["score"] for r in fulltext.bm25_search(
            corpus, "text", qy, limit=50, id_col="url").collect()}
        got = {r["url"]: r["score"] for r in fulltext.bm25_query_indexed(
            spark, idx["fulltext_index_dir"], qy, limit=50,
            id_col="url").collect()}
        ft_ok = ft_ok and set(got) == set(scan) and all(
            math.isclose(got[k], scan[k], abs_tol=1e-9) for k in scan)
    out["fulltext_converged"] = ft_ok
    vecs = corpus.select(
        "url", udfs.embed_expr()(F.col("text")).alias("embedding")
    ).localCheckpoint()
    qv = [float(x) for x in vecs.orderBy("url").first()["embedding"]]
    want = [r["id"] for r in dp.ann_bruteforce(
        vecs, qv, k=10, id_col="url", emb_col="embedding").collect()]
    got_ann = [r["id"] for r in dp.ann_query_indexed(
        spark, idx["ann_index_dir"], qv, k=10, probe_hamming=12,
        id_col="url", emb_col="embedding").collect()]
    got_ivf = [r["id"] for r in dp.ann_ivf_indexed(
        spark, idx["ivf_index_dir"], qv, k=10, nprobe=idx["ivf_clusters"],
        id_col="url", emb_col="embedding").collect()]
    out["ann_converged"] = got_ann == want
    out["ivf_converged"] = got_ivf == want
    return out


def main() -> None:
    # --indexes: also maintain the persisted BM25 + ANN + IVF indexes per
    # micro-batch (r5 wiring) and verify each converges to a from-scratch
    # result over the final corpus; evidence lands in
    # BENCH/streaming_index_scale.json (the plain-ingest record in
    # streaming_scale.json is kept separate for cross-round comparability)
    args = [a for a in sys.argv[1:] if a != "--indexes"]
    with_indexes = "--indexes" in sys.argv[1:]
    n_pages = int(args[0]) if len(args) > 0 else 120_000
    n_batches = int(args[1]) if len(args) > 1 else 6
    spark = get_spark("kgspark-streaming-scale", cpus=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="kgstream_scale_")
    try:
        inp = str(Path(tmp) / "incoming")
        base = str(Path(tmp) / "graph")
        step = n_pages // n_batches
        t0 = time.time()
        for b in range(n_batches):
            hi = n_pages if b == n_batches - 1 else (b + 1) * step
            # one file per batch + maxFilesPerTrigger=1 -> one micro-batch
            # per arrival chunk, in path order
            (_batch_pages(spark, b * step, hi, n_pages)
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{inp}/batch_{b:03d}"))
        gen_sec = round(time.time() - t0, 2)

        idx = {}
        if with_indexes:
            idx = {"fulltext_index_dir": str(Path(tmp) / "ft_idx"),
                   "ann_index_dir": str(Path(tmp) / "ann_idx"),
                   "ivf_index_dir": str(Path(tmp) / "ivf_idx"),
                   "ivf_clusters": 16}
        t0 = time.time()
        # one single-file chunk per micro-batch, in path (= arrival) order
        q = streaming.incremental_ingest(spark, inp + "/*", base,
                                         max_files_per_trigger=1, **idx)
        q.awaitTermination(3600)
        stream_sec = round(time.time() - t0, 2)
        progress = [p if isinstance(p, dict) else json.loads(p)
                    for p in q.recentProgress]
        batches = [
            {"batch_id": p["batchId"],
             "rows": p["numInputRows"],
             "sec": round(p["durationMs"]["triggerExecution"] / 1000, 2)}
            for p in progress if p["numInputRows"]]

        stream_n, stream_sig = _edge_sig(
            kio.read_table(spark, base, "edges"))

        t0 = time.time()
        batch_out = build_graph(
            _batch_pages(spark, 0, n_pages, n_pages),
            check_text=False, compute_embeddings=False)
        batch_n, batch_sig = _edge_sig(batch_out["edges"])
        batch_sec = round(time.time() - t0, 2)

        rec = {
            "n_pages": n_pages,
            "n_batches": n_batches,
            "gen_sec": gen_sec,
            "stream_total_sec": stream_sec,
            "per_batch": batches,
            "batch_build_sec": batch_sec,
            "stream_edges": stream_n,
            "batch_edges": batch_n,
            "converged": stream_n == batch_n and stream_sig == batch_sig,
            "note": ("per_batch sec = triggerExecution of each micro-batch; "
                     "each batch recomputes only its dirty groups from the "
                     "bronze union, so later batches pay for accumulated "
                     "group history, not the whole corpus"),
        }
        if with_indexes:
            rec["indexes"] = _index_convergence(spark, idx, n_pages)
        print(json.dumps(rec, indent=2))
        if not rec["converged"]:
            raise SystemExit("stream result diverged from batch build")
        if with_indexes and not all(
                v for k, v in rec["indexes"].items()
                if k.endswith("_converged")):
            raise SystemExit("a stream-maintained index diverged")
        out = Path(__file__).resolve().parents[1] / "BENCH"
        out.mkdir(exist_ok=True)
        name = ("streaming_index_scale.json" if with_indexes
                else "streaming_scale.json")
        (out / name).write_text(json.dumps(rec, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
