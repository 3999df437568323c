#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

For each query dir in <verify_out_dir>, reads the Spark parquet result,
runs the matching oracle SQL (from oracle_sql.json) in DuckDB against the
sf parquet tables, sorts columns by name and rows by all columns, and
compares values. Reports per-query match/mismatch.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    qdirs = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")
    )
    n_ok = n_bad = n_rowsonly = 0
    for q in qdirs:
        spark_df = pd.read_parquet(f"{out_dir}/{q}")
        if q not in oracles:
            print(f"{q}: rows-only ({len(spark_df)} rows)")
            n_rowsonly += 1
            continue
        try:
            oracle_df = con.sql(oracles[q]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{q}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        a, b = norm(spark_df), norm(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"{q}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"{q}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"{q}: OK ({len(a)} rows)")
            n_ok += 1
        except AssertionError as e:
            # retry with tolerance to show whether it's an exact-hash risk
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)
                print(f"{q}: NEAR-MATCH (rounding hash risk!)")
            except AssertionError:
                print(f"{q}: VALUE MISMATCH: {str(e)[:300]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
