"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and exact values (rows sorted by all columns, columns
sorted by name) — the same shape as CORRECTNESS_r{N}.json.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from atlas_spark.session import get_spark

    spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: schema mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        a, b = canon(sdf), canon(odf)
        bad = 0
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            for x, y in zip(av, bv):
                if not values_equal(x, y):
                    bad += 1
                    if bad <= 3:
                        print(f"  {name}.{col}: {x!r} != {y!r}")
        if bad:
            failures.append((name, f"{bad} value mismatches"))
            print(f"FAIL {name}: {bad} value mismatches over {len(a)} rows")
        else:
            print(f"PASS {name} ({len(sdf)} rows)")

    # entry smoke
    if not only:
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"entry(): {n} rows, schema: {[f.name for f in edf.schema.fields]}")
        if n <= 0:
            failures.append(("entry", "0 rows"))

    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
