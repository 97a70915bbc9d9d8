#!/usr/bin/env python3
"""Derive an sf1-scale dataset from the driver's sf0.1 parquet for the
SURVEY §8 scaling spot-runs (the driver ships sf{0.001,0.01,0.1} only).

Method: 10 replica-shifted copies of sf0.1. Join keys shift by
replica*10^9 so the replicas are disjoint (faithful to TPC-H growth:
per-order line counts, per-customer order counts, and co-purchase
degree distributions are scale-invariant, so 10 disjoint copies grow
every graph/join workload the same ~linear way real sf1 does). Document
words get a per-replica suffix so cross-replica Jaccard is 0 — each
replica keeps exactly sf0.1's planted near-dup structure instead of
turning every doc into a 10-way exact dup (which would inflate the dedup
workload quadratically, not linearly).

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/sf1)
"""
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
K = 10**9

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

def copy(sql: str, name: str) -> None:
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

copy(f"""
  SELECT l_orderkey + k*{K} AS l_orderkey, l_partkey + k*{K} AS l_partkey,
         l_suppkey + k*{K} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{BASE}/lineitem.parquet', range(10) r(k)
""", "lineitem")

copy(f"""
  SELECT o_orderkey + k*{K} AS o_orderkey, o_custkey + k*{K} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{BASE}/orders.parquet', range(10) r(k)
""", "orders")

copy(f"""
  SELECT p_partkey + k*{K} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{BASE}/part.parquet', range(10) r(k)
""", "part")

copy(f"""
  SELECT doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM (
    SELECT doc_id + k*{K} AS doc_id,
           CASE WHEN k = 0 THEN text
                ELSE list_aggregate(
                       list_transform(string_split(text, ' '),
                                      w -> w || 'q' || k),
                       'string_agg', ' ') END AS text,
           lang, source
    FROM '{BASE}/documents.parquet', range(10) r(k))
""", "documents")

copy(f"""
  SELECT c_custkey + k*{K} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{BASE}/customer.parquet', range(10) r(k)
""", "customer")

copy(f"""
  SELECT s_suppkey + k*{K} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{BASE}/supplier.parquet', range(10) r(k)
""", "supplier")

# fixed dimensions: TPC-H does not scale them either
copy(f"SELECT * FROM '{BASE}/nation.parquet'", "nation")
copy(f"SELECT * FROM '{BASE}/region.parquet'", "region")

# embeddings replicate with shifted ids, vectors unperturbed — used only
# for plan-shape audits at sf1 (vector-workload scaling is measured on
# synthetic corpora, SURVEY §8); near-dup content is NOT sf1-faithful here
copy(f"""
  SELECT vec_id + k*{K} AS vec_id, embedding, label
  FROM '{BASE}/embeddings.parquet', range(10) r(k)
""", "embeddings")

# events.ts is parquet TIMESTAMP(NANOS), which graft reads via the
# nanosAsLong path — DuckDB would rewrite it as micros, so replicate
# through pyarrow preserving the physical type (same time range, 10x
# density: realistic sf growth holds user count x10, rate x10)
import pyarrow as pa
import pyarrow.parquet as pq

ev = pq.read_table(f"{BASE}/events.parquet")
parts = []
for k in range(10):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pa.compute.add(t["event_id"], k * K))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pa.compute.add(t["user_id"], k * K))
    parts.append(t)
big = pa.concat_tables(parts)
pq.write_table(big, f"{OUT}/events.parquet", version="2.6",
               coerce_timestamps=None)
print(f"events: {big.num_rows} rows")

print(f"wrote {OUT}")
