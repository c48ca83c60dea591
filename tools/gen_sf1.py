#!/usr/bin/env python3
"""Generate sf1 bench tables as a 10x key-shifted scale-up of sf0.1.

Driver-side tooling only (pyarrow/numpy) -- the library never reads this
code. Design goals, so the sf1 run answers "which query is super-linear?"
rather than measuring a distribution artifact:

- Every scaled table gets copy c's keys shifted by c * (max_key + 1);
  foreign keys shift by the referenced table's stride, so per-key join
  fan-outs are IDENTICAL to sf0.1 -- rows grow 10x, join outputs grow
  10x, skew profile unchanged.
- region/nation stay fixed (dimension tables a real deployment would not
  scale); nation FKs are left untouched.
- documents: copies > 0 get a synthetic token interleaved every 3 words
  so cross-copy shingle Jaccard ~ 0 -- the corpus duplicate RATE matches
  sf0.1 instead of every doc gaining 9 near-identical clones (which
  would grow LSH pair output quadratically and mask real scaling).
  n_chars is recomputed to stay consistent with the text.
- embeddings: copies > 0 get deterministic per-vector noise large enough
  to leave the near-dup cosine band, same reasoning.
- events.parquet is TIMESTAMP(NANOS); pyarrow round-trips preserve the
  physical type (DuckDB would silently coerce to micros and break the
  GraftSession nanosAsLong read path).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(DST, exist_ok=True)


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def stride(table, col):
    return int(pa.compute.max(table[col]).as_py()) + 1


def shifted(table, shifts, c, transform=None):
    """One copy with each (col -> stride) shifted by c * stride."""
    cols = {}
    for name in table.column_names:
        arr = table[name]
        if name in shifts:
            typ = arr.type
            cols[name] = pa.compute.add(arr, pa.scalar(c * shifts[name], type=typ))
        else:
            cols[name] = arr
    t = pa.table(cols)
    return transform(t, c) if transform else t


def scale(name, shifts, transform=None):
    t = read(name)
    out = pa.concat_tables([shifted(t, shifts, c, transform) for c in range(COPIES)])
    write(name, out)
    return t


# fixed dims
for name in ("region", "nation"):
    write(name, read(name))

cust = read("customer")
supp = read("supplier")
part = read("part")
orders = read("orders")
s_cust = stride(cust, "c_custkey")
s_supp = stride(supp, "s_suppkey")
s_part = stride(part, "p_partkey")
s_ord = stride(orders, "o_orderkey")

scale("customer", {"c_custkey": s_cust})
scale("supplier", {"s_suppkey": s_supp})
scale("part", {"p_partkey": s_part})
scale("orders", {"o_orderkey": s_ord, "o_custkey": s_cust})
scale("lineitem", {"l_orderkey": s_ord, "l_partkey": s_part, "l_suppkey": s_supp})

ev = read("events")
scale("events", {"event_id": stride(ev, "event_id"),
                 "user_id": stride(ev, "user_id")})


def doc_transform(t, c):
    if c == 0:
        return t
    texts = t["text"].to_pylist()
    out = []
    for i, txt in enumerate(texts):
        words = txt.split(" ")
        mixed = []
        for j, w in enumerate(words):
            mixed.append(w)
            if j % 3 == 2:
                mixed.append(f"zq{c}w{(i + j) % 97}")
        out.append(" ".join(mixed))
    cols = {n: t[n] for n in t.column_names}
    cols["text"] = pa.array(out, type=pa.string())
    cols["n_chars"] = pa.array([len(s) for s in out], type=pa.int64())
    return pa.table(cols)


docs = read("documents")
scale("documents", {"doc_id": stride(docs, "doc_id")}, doc_transform)


def emb_transform(t, c):
    if c == 0:
        return t
    vecs = t["embedding"].to_pylist()
    ids = t["vec_id"].to_pylist()
    out = []
    for vid, v in enumerate(vecs):
        a = np.asarray(v, dtype=np.float32)
        rng = np.random.default_rng(ids[vid] * 31 + c)
        noise = rng.standard_normal(a.shape).astype(np.float32)
        nn = np.linalg.norm(noise)
        an = np.linalg.norm(a)
        if nn > 0 and an > 0:
            a = a + noise * (0.8 * an / nn)
        out.append(a.tolist())
    cols = {n: t[n] for n in t.column_names}
    cols["embedding"] = pa.array(out, type=t["embedding"].type)
    return pa.table(cols)


emb = read("embeddings")
scale("embeddings", {"vec_id": stride(emb, "vec_id")}, emb_transform)
print("done ->", DST)
