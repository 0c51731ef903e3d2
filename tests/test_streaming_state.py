"""applyInPandasWithState custom stateful operator: the streaming
contradiction monitor must converge to the batch temporal pass across
micro-batches, updating earlier verdicts when a better (earlier) conflicting
fact arrives later — state carried across separate query restarts via the
checkpoint."""

from datetime import datetime

import pandas as pd

from kgspark.temporal import contra_keyed

EDGE_COLS = ["uuid", "group_id", "src_uuid", "dst_uuid", "predicate",
             "valid_at", "invalid_at_explicit"]
EDGE_SCHEMA = ("uuid string, group_id string, src_uuid string, "
               "dst_uuid string, predicate string, valid_at timestamp, "
               "invalid_at_explicit timestamp")


def _write_batch(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=EDGE_COLS),
                          schema=EDGE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)


def _run_query(spark, in_dir, ckpt, sink_name):
    # foreachBatch sink: supports checkpoint recovery across query restarts
    # (the memory sink does not), so group state survives between runs
    from kgspark.streaming import streaming_contradiction_monitor
    collected = []

    def sink(df, _bid):
        collected.extend(df.collect())

    stream = (spark.readStream.schema(EDGE_SCHEMA).parquet(in_dir))
    q = (streaming_contradiction_monitor(contra_keyed(stream))
         .writeStream.foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    return {r["edge_uuid"]: r for r in collected}


def test_monitor_updates_verdicts_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: e1 (Jan) is closed by e2 (May)
    _write_batch(spark, in_dir, [
        ("e1", "g", "p", "cityA", "LIVES_IN", datetime(2024, 1, 1), None),
        ("e2", "g", "p", "cityB", "LIVES_IN", datetime(2024, 5, 1), None),
    ])
    out1 = _run_query(spark, in_dir, ckpt, "mon1")
    assert out1["e1"]["caused_by_edge_uuid"] == "e2"
    assert out1["e1"]["invalid_at"] == datetime(2024, 5, 1)
    assert "e2" not in out1

    # batch 2: e3 (Mar) arrives late -> e1's closer IMPROVES to e3, and e3
    # itself is closed by e2 — both emitted, both depending on batch-1 state
    _write_batch(spark, in_dir, [
        ("e3", "g", "p", "cityC", "LIVES_IN", datetime(2024, 3, 1), None),
    ])
    out2 = _run_query(spark, in_dir, ckpt, "mon2")
    assert out2["e1"]["caused_by_edge_uuid"] == "e3"
    assert out2["e1"]["invalid_at"] == datetime(2024, 3, 1)
    assert out2["e3"]["caused_by_edge_uuid"] == "e2"
    assert len(out2) == 2  # e2 stays open — nothing else re-emitted


def test_monitor_matches_batch_temporal_pass(spark, tmp_path):
    from kgspark.temporal import temporal_pass
    in_dir = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    rows = [
        ("a1", "g", "x", "y", "LIKES", datetime(2024, 1, 1), None),
        ("a2", "g", "x", "y", "DISLIKES", datetime(2024, 2, 1), None),
        ("a3", "g", "x", "z", "WORKS_FOR", datetime(2024, 1, 15), None),
        ("a4", "g", "x", "z", "LEFT_JOB", datetime(2024, 6, 1), None),
        ("a5", "g", "x", "w", "SPONSORS", datetime(2024, 3, 1), None),
    ]
    _write_batch(spark, in_dir, rows[:3])
    out_b1 = _run_query(spark, in_dir, ckpt, "mon3")
    _write_batch(spark, in_dir, rows[3:])
    out_b2 = _run_query(spark, in_dir, ckpt, "mon4")
    merged = {**out_b1, **out_b2}  # latest verdict per edge wins

    edges = spark.createDataFrame(pd.DataFrame(rows, columns=EDGE_COLS),
                                  schema=EDGE_SCHEMA)
    _, inv = temporal_pass(edges, datetime(2025, 1, 1))
    batch = {(r["edge_uuid"], r["invalid_at"], r["caused_by_edge_uuid"])
             for r in inv.collect()}
    stream = {(u, r["invalid_at"], r["caused_by_edge_uuid"])
              for u, r in merged.items()}
    assert stream == batch
