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


def kind(dtype) -> str:
    """Dtype CLASS after normalization — the driver's hash distinguishes
    int from float (150 vs 150.0 hash differently), so a post-norm
    int-vs-float mismatch must FAIL here too, not silently compare equal
    (the q168 r8 escape: DuckDB window sum(BIGINT) -> HUGEINT -> float64)."""
    s = str(dtype)
    if s.startswith("datetime"):
        return "datetime"
    if s in ("object", "string", "str"):
        return "str"
    if s == "bool":
        return "bool"
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    return s


# DuckDB result types that pandas coerces AWAY from int64 — any oracle
# emitting one of these hashes as float driver-side while Spark hashes
# bigint. Uncast sum() is the usual source (sum(BIGINT) -> HUGEINT).
HAZARD_TYPES = ("HUGEINT", "UHUGEINT")


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
            rel = con.sql(oracles[q])
            hazards = [
                (c, t) for c, t in zip(rel.columns, [str(t) for t in rel.types])
                if t in HAZARD_TYPES or t.startswith("DECIMAL")
            ]
            oracle_df = rel.df()
        except Exception as e:  # noqa: BLE001
            print(f"{q}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        if hazards:
            print(f"{q}: ORACLE TYPE LINT: uncast wide types {hazards} — add ::BIGINT/::DOUBLE")
            n_bad += 1
            continue
        a, b = norm(spark_df), norm(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"{q}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
            continue
        kinds_a = [kind(a[c].dtype) for c in a.columns]
        kinds_b = [kind(b[c].dtype) for c in b.columns]
        if kinds_a != kinds_b:
            diff = [
                (c, ka, kb) for c, ka, kb in zip(a.columns, kinds_a, kinds_b) if ka != kb
            ]
            print(f"{q}: DTYPE CLASS MISMATCH (driver hash would fail): {diff}")
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
