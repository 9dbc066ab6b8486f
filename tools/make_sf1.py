#!/usr/bin/env python3
"""Regenerate the sf1 replica used by the round-8/9 scale checks
(BASELINE.md): a 10x key-shifted replication of sf0.1.

Each replica i shifts every entity key by i*SHIFT so joins stay
consistent within a replica and never match across replicas.
Dimension tables that are O(1) in SF (nation, region) are copied
verbatim. Document texts get a per-replica suffix, which makes the
corpus deliberately ADVERSARIAL for the similarity family: every doc
gains 9 near-copies, so near-duplicate pair density grows ~45x while
rows grow 10x (see BASELINE.md "Round-9 FULL-census sf1 run").

Usage: python3 tools/make_sf1.py [srcDir] [outDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = 10          # replicas
SHIFT = 10_000_000  # key shift per replica; far above any sf0.1 key

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def gen(table, select_tpl):
    parts = " UNION ALL ".join(select_tpl.format(i=i, s=i * SHIFT)
                               for i in range(R))
    con.execute(
        f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

gen("customer",
    "SELECT c_custkey+{s} AS c_custkey, c_name, c_nationkey, c_acctbal, "
    f"c_mktsegment FROM '{SRC}/customer.parquet'")
gen("supplier",
    "SELECT s_suppkey+{s} AS s_suppkey, s_name, s_nationkey, s_acctbal "
    f"FROM '{SRC}/supplier.parquet'")
gen("part",
    "SELECT p_partkey+{s} AS p_partkey, p_name, p_brand, p_type, p_size, "
    f"p_retailprice FROM '{SRC}/part.parquet'")
gen("orders",
    "SELECT o_orderkey+{s} AS o_orderkey, o_custkey+{s} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM '{SRC}/orders.parquet'")
gen("lineitem",
    "SELECT l_orderkey+{s} AS l_orderkey, l_partkey+{s} AS l_partkey, "
    "l_suppkey+{s} AS l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"l_shipdate FROM '{SRC}/lineitem.parquet'")
gen("events",
    "SELECT event_id+{s} AS event_id, ts, user_id+{s} AS user_id, "
    f"event_type, value, props FROM '{SRC}/events.parquet'")
gen("documents",
    "SELECT doc_id+{s} AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END AS text, "
    "lang, source, n_chars + CASE WHEN {i} = 0 THEN 0 ELSE 3 END AS n_chars "
    f"FROM '{SRC}/documents.parquet'")
gen("embeddings",
    "SELECT vec_id+{s} AS vec_id, embedding, label "
    f"FROM '{SRC}/embeddings.parquet'")
print("done ->", OUT)
