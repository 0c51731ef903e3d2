"""Training-data pipeline operators (dedup / similarity / text analysis /
multimodal plumbing) over the driver-provided documents & embeddings tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgspark import datapipe as dp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def test_exact_dedup(spark, docs):
    out = dp.exact_dedup(docs)
    assert out.count() <= docs.count()
    assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()


def test_neardup_and_jaccard(spark, docs):
    pairs = dp.neardup_pairs(docs)
    jac = dp.ngram_jaccard(docs, pairs)
    assert jac.count() == pairs.count()
    assert jac.filter((F.col("jaccard") < 0) | (F.col("jaccard") > 1)).count() == 0


def test_simhash_selfconsistent(spark, docs):
    sh = dp.simhash(docs.limit(50))
    assert sh.count() == 50
    # identical text -> identical simhash
    two = docs.limit(1).union(docs.limit(1))
    vals = [r["simhash"] for r in dp.simhash(two).collect()]
    assert vals[0] == vals[1]


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    brute = [r["id"] for r in dp.ann_bruteforce(
        emb.filter("vec_id <> 0"), list(qv), k=10).collect()]
    lsh = [r["id"] for r in dp.ann_lsh(
        emb.filter("vec_id <> 0"), list(qv), k=10, probe_hamming=6).collect()]
    # LSH is approximate: require decent overlap with brute force
    assert len(set(brute) & set(lsh)) >= 5


def test_ann_lsh_full_probe_is_exact(spark, emb):
    # probe_hamming = n_planes probes every bucket (the nprobe=nlist exact
    # regime): the result must equal brute force bit-for-bit
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    brute = [(r["id"], round(r["cos"], 9)) for r in dp.ann_bruteforce(
        emb.filter("vec_id <> 0"), list(qv), k=10).collect()]
    lsh = [(r["id"], round(r["cos"], 9)) for r in dp.ann_lsh(
        emb.filter("vec_id <> 0"), list(qv), k=10, probe_hamming=12).collect()]
    assert brute == lsh


def test_ann_indexed_matches_bruteforce(spark, emb, tmp_path):
    # persisted bucket-partitioned index at full probe == brute force, and
    # the probed scan must prune partitions (bucket IN filter at the source)
    path = str(tmp_path / "ann_index")
    rest = emb.filter("vec_id <> 0")
    dp.build_ann_index(rest, path)
    qv = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    brute = [(r["id"], round(r["cos"], 9))
             for r in dp.ann_bruteforce(rest, qv, k=10).collect()]
    idx_full = [(r["id"], round(r["cos"], 9))
                for r in dp.ann_query_indexed(spark, path, qv, k=10,
                                              probe_hamming=12).collect()]
    assert idx_full == brute
    approx = {r["id"] for r in dp.ann_query_indexed(spark, path, qv, k=10,
                                                    probe_hamming=6).collect()}
    assert len(approx & {i for i, _ in brute}) >= 5
    plan = dp.ann_query_indexed(spark, path, qv, k=10, probe_hamming=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan or "bucket#" in plan


def test_ann_ivf_full_probe_is_exact_and_recall(spark, emb):
    # nprobe = n_clusters scans every cluster — must equal brute force;
    # centroid learning is deterministic, so re-derivation agrees
    rest = emb.filter("vec_id <> 0")
    qv = [float(x)
          for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    brute = [(r["id"], round(r["cos"], 9))
             for r in dp.ann_bruteforce(rest, qv, k=10).collect()]
    cents = dp.ivf_centroids(rest, k=8, iters=2)
    assert cents == dp.ivf_centroids(rest, k=8, iters=2)
    full = [(r["id"], round(r["cos"], 9))
            for r in dp.ann_ivf(rest, qv, k=10, n_clusters=8, nprobe=8,
                                centroids=cents).collect()]
    assert full == brute
    approx = {r["id"] for r in dp.ann_ivf(rest, qv, k=10, n_clusters=8,
                                          nprobe=4, centroids=cents).collect()}
    assert len(approx & {i for i, _ in brute}) >= 5


def test_ann_ivf_indexed_prunes_partitions(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_index")
    rest = emb.filter("vec_id <> 0")
    dp.build_ivf_index(rest, path, n_clusters=8, iters=2)
    qv = [float(x)
          for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    brute = [(r["id"], round(r["cos"], 9))
             for r in dp.ann_bruteforce(rest, qv, k=10).collect()]
    idx_full = [(r["id"], round(r["cos"], 9))
                for r in dp.ann_ivf_indexed(spark, path, qv, k=10,
                                            nprobe=8).collect()]
    assert idx_full == brute
    plan = dp.ann_ivf_indexed(spark, path, qv, k=10, nprobe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan or "cluster#" in plan


def test_embedding_neardups_bounded(spark, emb):
    out = dp.embedding_neardups(emb, threshold=0.9)
    assert out.filter("id_a >= id_b").count() == 0


def test_embedding_neardups_planted_recall(spark, emb):
    # exact copies must always collide in every LSH band -> recall 1
    planted = emb.filter("vec_id < 25").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    allv = emb.select("vec_id", "embedding").unionByName(planted)
    got = {(r["id_a"], r["id_b"])
           for r in dp.embedding_neardups(allv, threshold=0.8).collect()}
    assert {(i, i + 10000) for i in range(25)} <= got


def test_language_id(spark, docs):
    out = dp.language_id(docs)
    assert out.count() == docs.count()
    assert set(r["lang_pred"] for r in out.collect()) <= {"en", "es", "de", "und"}


def test_quality_and_tokens(spark, docs):
    q = dp.quality_score(docs).collect()
    assert all(0 <= r["type_token_ratio"] <= 1 for r in q)
    t = dp.token_counts(docs).collect()
    assert all(r["bpe_ish_tokens"] >= r["word_tokens"] for r in t)


def test_rolling_fingerprint(spark, docs):
    out = dp.rolling_fingerprint(docs)
    assert out.filter(F.col("fingerprint").isNull()).count() == 0


def test_multimodal_stub_plumbing(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "blob": [b"fake-image-bytes-1", b"fake-image-bytes-2", None],
    })
    df = spark.createDataFrame(pdf)
    feats = dp.extract_image_features(df, "id", "blob").collect()
    assert len(feats) == 3
    by_id = {r["id"]: r for r in feats}
    assert by_id[1]["fake_width"] >= 1 and by_id[1]["decode_status"] == "stub"
    assert by_id[3]["n_bytes"] == 0
    # deterministic across runs
    again = {r["id"]: r["content_hash"]
             for r in dp.extract_image_features(df, "id", "blob").collect()}
    assert again[1] == by_id[1]["content_hash"]

    frames = dp.sample_frames(df, "id", "blob", n_frames=3)
    assert frames.count() == 9
    # real-decoder path raises cleanly (documented stub)
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        dp.extract_image_features(df, "id", "blob", use_real_decoder=True).collect()
