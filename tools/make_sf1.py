#!/usr/bin/env python3
"""Replicate the sf0.1 corpus 10x into an sf1 scale-stress directory.

Fact tables get key-shifted copies (orderkey domain shifts consistently
across orders+lineitem so joins stay valid); dimension tables copy
unscaled (realistic fact-vs-dim growth). graft.Bench picks the output
dir up automatically (tmp/sf1) and emits an "sf1" section.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [factor]
"""
import os, sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def write(table, sql):
    # small row groups so Spark's byte-range splits parallelize the scan
    # (a single-row-group file is a one-task scan at any core count)
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# one shift constant for the whole orderkey domain (orders ⊇ lineitem keys)
K = con.execute(f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]

reps = lambda: f"(SELECT unnest(range({factor})) AS rep)"

write("orders", f"""
  SELECT o_orderkey + rep * {K} AS o_orderkey,
         * EXCLUDE (o_orderkey, rep)
  FROM '{src}/orders.parquet', {reps()}""")

write("lineitem", f"""
  SELECT l_orderkey + rep * {K} AS l_orderkey,
         * EXCLUDE (l_orderkey, rep)
  FROM '{src}/lineitem.parquet', {reps()}""")

KE = con.execute(f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
write("events", f"""
  SELECT event_id + rep * {KE} AS event_id,
         CAST(ts AS TIMESTAMP_NS) AS ts,
         * EXCLUDE (event_id, ts, rep)
  FROM '{src}/events.parquet', {reps()}""")

KD = con.execute(f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
write("documents", f"""
  SELECT doc_id + rep * {KD} AS doc_id,
         * EXCLUDE (doc_id, rep)
  FROM '{src}/documents.parquet', {reps()}""")

KV = con.execute(f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
write("embeddings", f"""
  SELECT vec_id + rep * {KV} AS vec_id,
         * EXCLUDE (vec_id, rep)
  FROM '{src}/embeddings.parquet', {reps()}""")

for dim in ["region", "nation", "customer", "supplier", "part"]:
    write(dim, f"SELECT * FROM '{src}/{dim}.parquet'")

print(f"sf1 corpus at {dst} ({factor}x {src})")
