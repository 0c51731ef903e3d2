"""Parity between JVM-side expressions and the pure-Python core.

The linking decision runs fully JVM-side (kgspark/linking.py); these tests
pin the JVM expressions to textcore's reference implementations so the Spark
DAG and the oracle can never disagree on per-pair decisions.
"""

import pandas as pd
from pyspark.sql import functions as F

from kgspark import textcore as tc
from kgspark import udfs
from kgspark.linking import _shingle_col

NAMES = ["Priya Sharma", "Priya Sh", "priya_sharma", "Glowco", "Summer Glow Campaign",
         "Outage 2024-03-05", "Zen Team", "a", "Mira Chen"]


def test_norm_name_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"name": NAMES}))
    got = [r[0] for r in df.select(udfs.norm_name_col(F.col("name"))).collect()]
    assert got == [tc.normalize_name(n) for n in NAMES]


def test_shingle_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"norm": [tc.normalize_name(n) for n in NAMES]}))
    got = df.select(_shingle_col(F.col("norm")).alias("s")).collect()
    for name, row in zip(NAMES, got):
        assert set(row["s"]) == set(tc.name_shingles(name)), name


def test_embedding_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "group_id": ["g"] * len(NAMES),
        "norm_name": [tc.normalize_name(n) for n in NAMES],
        "name": NAMES,
    }))
    got = {r["norm_name"]: r["name_embedding"]
           for r in udfs.embed_entities(df).collect()}
    for n in NAMES:
        ref = tc.hash_embedding(n)
        out = got[tc.normalize_name(n)]
        assert len(out) == tc.EMBED_DIM
        assert max(abs(a - b) for a, b in zip(out, ref)) < 1e-6


def test_band_key_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "group_id": ["g"] * len(NAMES),
        "norm_name": [tc.normalize_name(n) for n in NAMES],
        "name": NAMES,
    }))
    rows = udfs.entity_band_keys(df).collect()
    by_name = {}
    for r in rows:
        by_name.setdefault(r["norm_name"], []).append(r["band_key"])
    for n in NAMES:
        # two raw forms can share a normalized name ('Priya Sharma' /
        # 'priya_sharma') — band keys depend only on the normalized form
        assert set(by_name[tc.normalize_name(n)]) == set(tc.minhash_band_keys(n))
