"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # The driver's canonicalizer sort_values() raises
            # "unhashable type" on list/ndarray cells (CORRECTNESS_r01
            # kmeans_centers/maximum_cliques). Reproduce that strictness
            # here instead of papering over it with str().
            sample = df[c].dropna().head(20)
            if any(isinstance(v, (list, tuple, dict, bytearray)) or
                   type(v).__name__ == "ndarray" for v in sample):
                raise TypeError(
                    f"column {c!r} holds unhashable values; the driver "
                    "canonicalizer would reject this query output"
                )
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from linkgraph import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16, app_name="contract-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(exc).__name__}: {exc}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK   {name}: {len(s)} rows")
        except AssertionError as exc:
            failures.append(name)
            msg = str(exc).splitlines()
            print(f"FAIL {name}: values differ: {' / '.join(msg[:3])}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
