"""Checkpoint-resume + lineage (north rule; SURVEY.md §7.1 step 8):
interrupt after a subset of groups, resume, verify the final tables equal a
single-shot run and lineage metrics exist per partition."""

import json
from pathlib import Path

from pyspark.sql import functions as F

from kgspark import io as kio
from kgspark.datagen import pages_spark

N_PAGES = 120


def _edge_set(df):
    return {(r["uuid"], r["group_id"], r["valid_at"], r["invalid_at"])
            for r in df.select("uuid", "group_id", "valid_at", "invalid_at").collect()}


def test_resume_equals_single_shot(spark, tmp_path):
    pages = pages_spark(spark, N_PAGES, partitions=4).localCheckpoint()
    groups = sorted(r["group_id"] for r in pages.select("group_id").distinct().collect())
    assert len(groups) >= 3

    # run 1: only the first group (simulated interruption via a filtered input)
    base = str(tmp_path / "graph")
    first = pages.filter(F.col("group_id") == groups[0])
    s1 = kio.run_resumable(spark, first, base, compute_embeddings=False)
    assert s1["groups_processed"] == 1
    assert kio.completed_groups(base) == {groups[0]}

    # run 2: full input — completed group must be skipped, rest processed
    s2 = kio.run_resumable(spark, pages, base, compute_embeddings=False)
    assert s2["groups_skipped"] == 1
    assert s2["groups_processed"] == len(groups) - 1

    # equality with a single-shot run
    base2 = str(tmp_path / "graph2")
    kio.run_resumable(spark, pages, base2, compute_embeddings=False)
    resumed = _edge_set(kio.read_table(spark, base, "edges"))
    oneshot = _edge_set(kio.read_table(spark, base2, "edges"))
    assert resumed == oneshot and resumed

    # re-running is a no-op (idempotent)
    s3 = kio.run_resumable(spark, pages, base)
    assert s3["groups_processed"] == 0

    # lineage: one record per group with metrics
    recs = [json.loads(p.read_text())
            for p in (Path(base) / "_lineage").glob("group=*.json")]
    assert {r["group_id"] for r in recs} == set(groups)
    assert all(r["counts"]["edges"] >= 0 and "seconds" in r for r in recs)


def test_resume_skipped_metric_counts_this_inputs_groups(spark, tmp_path):
    # groups_skipped reflects THIS input's already-done groups, not the
    # whole lineage manifest (r2 review finding)
    import pandas as pd
    from kgspark.datagen import pages_pandas

    base = str(tmp_path / "graph")
    pdf = pages_pandas(60)
    pages = spark.createDataFrame(pdf)
    s1 = kio.run_resumable(spark, pages, base, compute_embeddings=False)
    assert s1["groups_skipped"] == 0
    one_group = sorted(pdf["group_id"].unique())[0]
    sub = spark.createDataFrame(pdf[pdf["group_id"] == one_group])
    s2 = kio.run_resumable(spark, sub, base, compute_embeddings=False)
    assert s2["groups_total"] == 1
    assert s2["groups_skipped"] == 1      # this input's only group was done
    assert s2["groups_processed"] == 0
