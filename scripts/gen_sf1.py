#!/usr/bin/env python3
"""Generate sf1 fixtures (10x sf0.1) for the scaling decade check.

Construction: 10 KEY-OFFSET copies of the sf0.1 fact tables, dims
unchanged — so every keyed structure (orders/lineitem joins, per-user
event series, the document dup graph, the embedding corpus) scales
EXACTLY 10x with no new cross-copy structure:

  - lineitem/orders: l_orderkey/o_orderkey += i*150_000 (dims reused:
    10x facts per part/supplier/customer, the realistic direction);
  - events: event_id += i*100_000, user_id += i*1_500 (user grain
    scales with the data, so per-user state stays bounded);
  - documents: doc_id += i*5_000 and every TOKEN of copy i>0 gets a
    'c<i>' prefix — token spaces are disjoint across copies, so the
    near-dup graph is 10 disjoint copies of sf0.1's graph (linear),
    never a 10x-denser clique blow-up that would change the DATA's
    asymptotics rather than test the engine's;
  - embeddings: vec_id += i*2_000 (panel probes vec_id<16 keep their
    copy-0 ground truth; buckets grow linearly).

Output: /root/repo/sf1data/*.parquet (gitignored; ~200 MB).
Usage: python3 scripts/gen_sf1.py
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "sf1data")
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rp(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    # r14: cap row groups so SCANS can parallelize — a parquet row group
    # is the atomic scan unit, and duckdb's default 122,880-row groups
    # leave the small tables (documents/embeddings) as ONE group = one
    # task at any core count (the r13 scaling-check blind spot).
    # 4,096-row groups ≈ 12 groups for documents, 5 for embeddings at
    # sf1 — enough for the core-ratio to be observable while each group
    # stays >100 KB.
    con.sql(f"COPY ({sql}) TO '{DST}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 4096)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
                ).fetchone()[0]
    print(f"{t}: {n} rows")


# dims: verbatim
for t in ["region", "nation", "customer", "supplier", "part"]:
    write(t, f"SELECT * FROM {rp(t)}")

copies = "(SELECT unnest(range(%d)) AS cp)" % COPIES

write("orders", f"""
  SELECT o_orderkey + cp * 150000 AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {rp('orders')}, {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + cp * 150000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {rp('lineitem')}, {copies}""")

write("events", f"""
  SELECT event_id + cp * 100000 AS event_id, ts,
         user_id + cp * 1500 AS user_id, event_type, value, props
  FROM {rp('events')}, {copies}""")

write("documents", f"""
  SELECT doc_id + cp * 5000 AS doc_id,
         CASE WHEN cp = 0 OR text IS NULL THEN text
              ELSE 'c' || cp || '' || replace(text, ' ', ' c' || cp)
         END AS text,
         lang, source, n_chars
  FROM {rp('documents')}, {copies}""")

write("embeddings", f"""
  SELECT vec_id + cp * 2000 AS vec_id, embedding, label
  FROM {rp('embeddings')}, {copies}""")

print("done ->", DST)
