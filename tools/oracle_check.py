#!/usr/bin/env python3
"""Local emulator of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

For each query in oracle_sql.json: read the Spark result parquet, run the
oracle SQL in DuckDB over views of the same source tables, sort columns by
name, and compare values (ordered and row-sorted). Reports per-query status.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: tz-aware → naive UTC, all to object for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if pd.isna(a) != pd.isna(b):
                return False
            return a == b
        except Exception:
            return False
    return a == b


def compare(name, spark_df, duck_df):
    issues = []
    if list(spark_df.columns) != list(duck_df.columns):
        issues.append(f"columns: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        return issues
    if len(spark_df) != len(duck_df):
        issues.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return issues
    mism = 0
    for c in spark_df.columns:
        sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not values_equal(a, b):
                mism += 1
                if mism <= 3:
                    issues.append(f"  value mismatch col={c} row={i}: spark={a!r} duck={b!r}")
    if mism:
        issues.insert(0, f"{mism} value mismatches")
    return issues


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.sql(sql).df())
            issues = compare(name, spark_df, duck_df)
        except Exception as e:
            issues = [f"EXCEPTION: {e}"]
        if issues:
            bad += 1
            print(f"FAIL {name}")
            for i in issues[:5]:
                print(f"     {i}")
        else:
            ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"\n{ok} ok, {bad} fail")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
