#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify output.

Mimics the driver's t2 gate: for each query key, load the Spark-written
parquet result and the DuckDB oracle result, sort columns by name,
normalize values, and compare row counts + value hashes.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        # decimals -> float? keep as string repr for exactness instead
        if s.dtype == object:
            df[c] = s.map(lambda v: None if v is None or v != v else str(v))
    return df


def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name} (no Spark output)")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        ha, hb = hash_df(a), hash_df(b)
        if ha != hb:
            # also try row-sorted compare to see if it's only ordering
            a2 = a.sort_values(list(a.columns)).reset_index(drop=True)
            b2 = b.sort_values(list(b.columns)).reset_index(drop=True)
            tag = "HASH(ord)" if hash_df(a2) == hash_df(b2) else "HASH"
            print(f"{tag:8} {name}")
            # show first diff
            for i in range(min(len(a), 5000)):
                ra, rb = tuple(a.iloc[i]), tuple(b.iloc[i])
                if repr(ra) != repr(rb):
                    print(f"  row {i}: spark={ra}\n          duck ={rb}")
                    break
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(a)} rows)")
            n_pass += 1
    # queries without oracle
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            status = "ROWSONLY" if n > 0 else "EMPTY!!!"
            print(f"{status} {d.name} ({n} rows)")
            n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
