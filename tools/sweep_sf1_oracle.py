import sys, json, time, os
import duckdb, pandas as pd
import importlib.util
spec = importlib.util.spec_from_file_location("co", "/root/repo/tools/check_oracle.py")
co = importlib.util.module_from_spec(spec); spec.loader.exec_module(co)

done = {}
for f in ('/tmp/sf1_sweep_progress.txt', '/tmp/sf1_sweep3.txt'):
    if not os.path.exists(f): continue
    for line in open(f):
        parts = line.split()
        if len(parts) >= 2 and parts[0] == "PASS":
            done[parts[1]] = "PASS"

sf_dir, out_dir = "/tmp/sf1", "/tmp/vout_sf1"
con = duckdb.connect()
con.execute("SET threads=10")
for t in co.TABLES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def clusters_oracle():
    # Same sigs/cand/agreed pipeline as the SQL oracle, but the
    # transitive closure runs as exact union-find here: the recursive
    # closure is Sum(|C|^2) rows and sf1 has a 28k-node component.
    sql = oracles["dedup_clusters"]
    head, tail = sql.rsplit("reach(node, m) AS (", 1)
    head = head.rstrip().rstrip(',')
    edges = con.execute(head + "\nSELECT a, b FROM edges").df()
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r: r = parent[r]
        while parent.get(x, x) != x: parent[x], x = r, parent[x]
        return r
    for a, b in zip(edges['a'].values, edges['b'].values):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb: parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(edges['a'].astype(int)) | set(edges['b'].astype(int)))
    return pd.DataFrame({'doc_id': nodes,
                         'cluster_id': [find(n) for n in nodes]}).astype('int64')

results = dict(done)
for name in sorted(oracles):
    if name in done:
        continue
    t0 = time.time()
    try:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name == "dedup_clusters":
            oracle_df = clusters_oracle()
        else:
            oracle_df = con.execute(oracles[name]).df()
        a, b = co.canon(spark_df.copy()), co.canon(oracle_df.copy())
        ok = (len(a) == len(b)) and (a == b)
        status = "PASS" if ok else "FAIL"
    except Exception as e:
        status = f"ERR {type(e).__name__}: {str(e)[:120]}"
    dt = time.time() - t0
    results[name] = status
    print(f"{status} {name} ({dt:.1f}s)", flush=True)
n_pass = sum(1 for s in results.values() if s == "PASS")
print(f"== {n_pass} pass / {len(results) - n_pass} fail (of {len(oracles)}) ==", flush=True)
