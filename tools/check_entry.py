"""Local emulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at sf0.01, compare row count +
column names + order-insensitive values. Usage:

    PYTHONPATH=/root/repo python3 tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from webscraper_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif dt.startswith("float"):
            df[c] = df[c].round(9)
        elif "int" in dt.lower():
            df[c] = df[c].astype("Int64")
        elif dt.startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_entry", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name != "anti_join_seen":
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns differ: {list(a.columns)} vs {list(b.columns)}"))
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"row count {len(a)} vs {len(b)}"))
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_rows = neq.any(axis=1)
            n_bad = int(bad_rows.sum())
            failures.append((name, f"{n_bad} mismatching rows"))
            print(f"FAIL  {name}: {n_bad}/{len(a)} mismatching rows; first:")
            idx = bad_rows.idxmax()
            print("  spark :", a.loc[idx].to_dict())
            print("  duckdb:", b.loc[idx].to_dict())
            continue
        print(f"OK    {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures")
    for n, why in failures:
        print(f"  - {n}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
