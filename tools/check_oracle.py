#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB over the same parquet tables,
loads the Spark result parquet, sorts columns by name, canonicalizes
values, and compares hashes — mirroring the driver's compare as closely
as we can infer it. Local-only tooling; not part of the shipped library.
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("nan")
                else:
                    out.append(f"{v:.6f}")
            elif isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                out.append(str(list(v)))
            else:
                out.append(str(v))
        rows.append("|".join(out))
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        a, b = canon(spark_df), canon(oracle_df)
        if sorted(spark_df.columns.tolist()) != sorted(oracle_df.columns.tolist()):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
            n_fail += 1
        elif a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n    spark : {x}\n    oracle: {y}")
                    break
            if len(a) != len(b) and a and b:
                print(f"    spark[0] : {a[0]}\n    oracle[0]: {b[0]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
