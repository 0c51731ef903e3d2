"""Driver simulator: exercises the real __spark_entry__ contract the way the
round driver does — entry() smoke, then each queries() entry vs its
oracle_sql() twin in DuckDB (row count + column names + order-insensitive
value compare). Usage:

    python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from kgspark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, dict)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    na, nb = normalize(a), normalize(b)
    for c in na.columns:
        ca, cb = na[c], nb[c]
        if str(ca.dtype).startswith("float") or str(cb.dtype).startswith("float"):
            import numpy as np
            ca = pd.to_numeric(ca, errors="coerce")
            cb = pd.to_numeric(cb, errors="coerce")
            if not np.allclose(ca.fillna(-9e18), cb.fillna(-9e18), rtol=0, atol=1e-9):
                bad = (ca - cb).abs().idxmax()
                return f"VALUE MISMATCH col={c} row={bad} {ca[bad]} != {cb[bad]}"
        else:
            # nulls FIRST: astype(str) stringifies missing values
            # engine-specifically (None->'None', nan->'nan', NaT->'NaT'),
            # so fillna after it was dead and Spark-vs-DuckDB null
            # representations could false-fail the compare
            ca = ca.astype(object).where(ca.notna(), "<null>").astype(str)
            cb = cb.astype(object).where(cb.notna(), "<null>").astype(str)
            eq = (ca == cb)
            if not eq.all():
                i = eq.idxmin()
                return f"VALUE MISMATCH col={c} row={i} {ca[i]!r} != {cb[i]!r}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-sim", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s, schema: "
          f"{[f.name for f in edf.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  ({el:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} DUCK ERROR: {str(e)[:300]}")
            continue
        verdict = compare(sdf, ddf)
        if verdict != "OK":
            failures.append(name)
        print(f"{name:24s} {verdict}  ({len(sdf)} rows, {el:.1f}s)")
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
