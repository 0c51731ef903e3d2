"""Structured-Streaming front-end for incremental construction.

The reference is incremental, not streaming (SURVEY.md §2.8): episodes
arrive one at a time and mutate graph state. The Spark-native restatement:

- ``incremental_ingest``: a file-source stream of page batches; each
  micro-batch marks its groups dirty and re-materializes exactly those
  graph partitions through the batch DAG (idempotent per-partition
  overwrite, kgspark/io.py) — the streaming analog of the reference's
  per-episode dedup-and-upsert loop (graphiti.py:262-413), with
  checkpointed progress via the lineage manifest.
- ``streaming_mention_counts``: a true event-time streaming operator —
  watermarked, windowed mention counts over the page stream (late pages
  within the watermark update their window; later ones are dropped), the
  streaming analog of the episode-window retrieval
  (graph_data_operations.py:104-159).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import io as kio
from kgspark import udfs
from kgspark.datagen import PAGES_DDL


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream
            .schema(PAGES_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def incremental_ingest(spark: SparkSession, input_dir: str, base: str,
                       checkpoint_dir: str | None = None):
    """Start (availableNow) a stream that incrementally maintains the graph
    tables under ``base``. Returns the StreamingQuery; callers
    ``awaitTermination`` it.

    Semantics: a micro-batch's groups are recomputed from ALL pages seen so
    far for those groups (bronze union), then the partitions are
    overwritten. Recompute-the-partition beats row-level merge here because
    dedup/linking/temporal closure are group-global — the same reason the
    reference re-searches the whole graph per episode.
    """
    bronze = str(Path(base) / "_bronze_pages")
    checkpoint_dir = checkpoint_dir or str(Path(base) / "_stream_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (batch_df.write.mode("append").partitionBy("group_id").parquet(bronze))
        dirty = [r["group_id"] for r in
                 batch_df.select("group_id").distinct().collect()]
        # invalidate lineage for dirty groups -> run_resumable recomputes them
        for g in dirty:
            rec = kio._lineage_dir(base) / f"group={g}.json"
            if rec.exists():
                rec.unlink()
        all_pages = (spark.read.parquet(bronze)
                     .filter(F.col("group_id").isin(dirty))
                     .dropDuplicates(["url"]))
        kio.run_resumable(spark, all_pages, base, compute_embeddings=False)

    return (read_pages_stream(spark, input_dir)
            .writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_mention_counts(pages_stream: DataFrame,
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Watermarked windowed aggregation over the page stream: mentions per
    (entity name, event-time window). Late pages beyond the watermark are
    dropped; within it, windows update in place (update/append per sink)."""
    mentions = udfs.extract_mentions(pages_stream)
    return (mentions
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window), "group_id", "name")
            .agg(F.count(F.lit(1)).alias("n_mentions")))
