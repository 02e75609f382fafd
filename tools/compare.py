#!/usr/bin/env python3
"""Local mini-driver: replicate the round harness's correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result) and runs the oracle SQL
from <outDir>/oracle_sql.json in DuckDB with the sf parquet files
registered as tables; compares row count, column names and cell values
(columns sorted by name, rows sorted by all columns).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except duckdb.Error:
            pass
    n_pass = n_fail = n_noorc = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = [d[0] for d in spark.description], spark.fetchall()
        except duckdb.Error as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            orc = con.sql(sql)
            o_cols, o_rows = [d[0] for d in orc.description], orc.fetchall()
        except duckdb.Error as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"ok   {name} ({len(s_rows)} rows)")
        n_pass += 1
    # queries without oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or (only and name not in only):
            continue
        if name not in oracle and os.path.isdir(f"{out_dir}/{name}"):
            try:
                n = con.sql(
                    f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
                print(f"rows {name}: no oracle, {n} rows")
                n_noorc += 1
            except duckdb.Error as e:
                print(f"FAIL {name}: no oracle AND unreadable: {e}")
                n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_noorc}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
