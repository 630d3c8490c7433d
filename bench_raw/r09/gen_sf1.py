"""Generate an sf1.0-scale analog of /root/testdata/sf0.1 for local measurement.

The driver's own sf1.0 corpus (BENCH_r08: 50k docs) is not on disk this
session; this reproduces its observed statistics (same schema, 10x rows,
same vocab/length/lang mix, ~5% dup-append near-pair structure, tiled
TPC-H tables with offset keys, jittered events, random unit embeddings).
Measurement-only — never used by bench.py unless SPARK_GRAFT_SF_DIR says so.
"""
import os, duckdb, numpy as np, pandas as pd

OUT = "/root/sf1.0"
SRC = "/root/testdata/sf0.1"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)

# ---- documents: 50k docs over the observed 30-word vocab ----
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "key", "order", "sort", "line", "part", "customer", "row", "agg",
         "fast", "slow", "the", "query", "a", "scan", "batch"]
N_DOCS = 50_000
n_base = int(N_DOCS * 0.95)          # 5% are dup-append copies
n_tok = rng.integers(10, 101, size=n_base)
texts = [" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), size=k))
         for k in n_tok]
# near-dup copies: base text + " dup"
n_copies = N_DOCS - n_base
copy_src = rng.choice(n_base, size=n_copies, replace=False)
texts += [texts[i] + " dup" for i in copy_src]
# a few exact duplicates (sf0.1 had 8 pairs / 5k docs)
for i in rng.choice(n_base, size=80, replace=False):
    texts[int(rng.integers(0, len(texts)))] = texts[i]
perm = rng.permutation(N_DOCS)
texts = [texts[i] for i in perm]
langs = rng.choice(["en", "zh", "es", "fr", "de"], size=N_DOCS,
                   p=[0.41, 0.15, 0.15, 0.15, 0.14])
docs = pd.DataFrame({
    "doc_id": np.arange(N_DOCS, dtype=np.int64),
    "text": texts,
    "lang": langs,
    "source": [f"src{int(i)}" for i in rng.integers(0, 20, size=N_DOCS)],
})
docs["n_chars"] = docs["text"].str.len().astype(np.int64)
docs.to_parquet(f"{OUT}/documents.parquet", index=False)
print("documents", len(docs))

# ---- embeddings: 20k random unit vectors, labels 0..9 ----
E = rng.standard_normal((20_000, 64)).astype(np.float32)
E /= np.linalg.norm(E, axis=1, keepdims=True)
emb = pd.DataFrame({
    "vec_id": np.arange(20_000, dtype=np.int64),
    "embedding": [e for e in E],
    "label": rng.integers(0, 10, size=20_000).astype(np.int32),
})
emb.to_parquet(f"{OUT}/embeddings.parquet", index=False)
print("embeddings", len(emb))

con = duckdb.connect()
con.execute("SET threads TO 16")

# ---- tiled TPC-H tables: 10 copies with offset keys ----
tile = "(select unnest(range(10)) k)"
con.execute(f"""
COPY (
  select l_orderkey + k*150000 as l_orderkey,
         l_partkey + k*20000  as l_partkey,
         l_suppkey + k*1000   as l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  from '{SRC}/lineitem.parquet', {tile}
) TO '{OUT}/lineitem.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  select o_orderkey + k*150000 as o_orderkey,
         o_custkey + k*15000   as o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  from '{SRC}/orders.parquet', {tile}
) TO '{OUT}/orders.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  select c_custkey + k*15000 as c_custkey,
         'Customer#' || lpad(cast(c_custkey + k*15000 as varchar), 9, '0') as c_name,
         c_nationkey, c_acctbal, c_mktsegment
  from '{SRC}/customer.parquet', {tile}
) TO '{OUT}/customer.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  select p_partkey + k*20000 as p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  from '{SRC}/part.parquet', {tile}
) TO '{OUT}/part.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  select s_suppkey + k*1000 as s_suppkey,
         'Supplier#' || lpad(cast(s_suppkey + k*1000 as varchar), 9, '0') as s_name,
         s_nationkey, s_acctbal
  from '{SRC}/supplier.parquet', {tile}
) TO '{OUT}/supplier.parquet' (FORMAT parquet)
""")
for t in ("nation", "region"):
    con.execute(f"COPY (select * from '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT parquet)")
con.execute(f"""
COPY (
  select event_id + k*100000 as event_id,
         ts + to_microseconds(cast(k*7_000_000 as bigint)) as ts,
         user_id + k*1500 as user_id,
         event_type, value, props
  from '{SRC}/events.parquet', {tile}
) TO '{OUT}/events.parquet' (FORMAT parquet)
""")
print("tables tiled")
open(f"{OUT}/_DONE", "w").close()
for f in sorted(os.listdir(OUT)):
    print(f, os.path.getsize(f"{OUT}/{f}"))
