#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver's compare as calibrated against CORRECTNESS_r01.json:
  - Spark side read with pandas/pyarrow (parquet DECIMAL -> decimal.Decimal
    objects, arrays -> numpy.ndarray) — NOT through DuckDB.
  - Oracle side via duckdb .df() (DECIMAL -> float64).
  - Columns sorted by name, rows sorted with DataFrame.sort_values over all
    columns, then every cell stringified with raw str() — no %.6f smoothing,
    no normalization. Any dtype-level stringification divergence (Decimal
    trailing zeros vs float repr) therefore fails, exactly like the driver.
  - Array/list columns make sort_values raise (unhashable ndarray) -> ERR,
    exactly like the driver's mm_features failure in round 1.

Calibration (this file's own regression test): run against the round-1
verify output; it must fail q1_agg, q4_window, q8_distinct_agg, cs_build,
hist_edits (hash) and error on mm_features, and pass the other 36.
Local-only tooling; not part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> list:
    """Driver-style canonicalization: sort columns by name, sort rows by all
    columns, stringify every cell with plain str()."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    return ["|".join(str(v) for v in row)
            for row in df.itertuples(index=False)]


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
            print(f"ERR  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            # the driver reads the Spark result with pandas, not DuckDB:
            # parquet DECIMAL becomes decimal.Decimal, arrays become ndarray
            spark_df = pd.read_parquet(spark_path)
        except Exception as e:
            print(f"ERR  {name}: spark read error: {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns.tolist()) != sorted(oracle_df.columns.tolist()):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} "
                  f"oracle={sorted(oracle_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(oracle_df)}")
            n_fail += 1
            continue
        try:
            a, b = canon(spark_df), canon(oracle_df)
        except Exception as e:
            print(f"ERR  {name}: canon error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: hash mismatch ({len(a)} rows)")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n    spark : {x}\n    oracle: {y}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
