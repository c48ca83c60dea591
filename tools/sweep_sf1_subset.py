"""Targeted sf1 oracle sweep: compare a Verify dump at /tmp/sf1 against
DuckDB for just the keys present in the dump dir (the round's new keys),
appending PASS/FAIL lines to a progress file so reruns resume.

Usage: python3 tools/sweep_sf1_subset.py <sf1_dir> <verify_out_dir> <progress_file>
"""
import sys, json, time, os
import duckdb, pandas as pd
import importlib.util

spec = importlib.util.spec_from_file_location(
    "co", os.path.join(os.path.dirname(__file__), "check_oracle.py"))
co = importlib.util.module_from_spec(spec); spec.loader.exec_module(co)

sf_dir, out_dir, progress = sys.argv[1], sys.argv[2], sys.argv[3]

done = set()
if os.path.exists(progress):
    for line in open(progress):
        parts = line.split()
        if len(parts) >= 2 and parts[0] == "PASS":
            done.add(parts[1])

con = duckdb.connect()
con.execute("SET threads=10")
for t in co.TABLES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

keys = sorted(k for k in oracles
              if os.path.isdir(os.path.join(out_dir, k)) and k not in done)
npass = nfail = 0
with open(progress, "a") as pf:
    for name in keys:
        t0 = time.time()
        try:
            spark_df = pd.read_parquet(os.path.join(out_dir, name))
            oracle_df = con.execute(oracles[name]).df()
            a, b = co.canon(spark_df.copy()), co.canon(oracle_df.copy())
            ok = (len(a) == len(b)) and (a == b)
            status = "PASS" if ok else "FAIL"
        except Exception as e:
            status = f"ERR {type(e).__name__}: {str(e)[:120]}"
        line = f"{status} {name} ({time.time()-t0:.1f}s)"
        print(line, flush=True)
        pf.write(line + "\n"); pf.flush()
        npass += status == "PASS"; nfail += status != "PASS"
print(f"== {npass + len(done)} pass / {nfail} fail (of {len(keys) + len(done)}) ==")
