#!/usr/bin/env python3
"""Generate the sf10 replica for the round-10 decade step (BASELINE.md):
100 key-shifted replicas of sf0.1 (lineitem 60M rows, documents 500k).

Replica i = group g*10 + j (g, j in 0..9). Keys shift by i*SHIFT as in
make_sf1.py. Document TEXTS are transformed so that near-duplicate
CLUSTER SIZE stays at 10 — the sf1 shape — while the number of clusters
grows 10x:
  - within a group, replica j gets the ' r{j}' suffix (same as sf1:
    10 mutual near-copies per base doc);
  - across groups, every token is tagged with the group id (g>0), so
    no 3-gram shingle survives across groups and inter-group pairs are
    NOT near-duplicates.
This is the realistic production decade: a bigger crawl has MORE
duplicate clusters, not bigger ones. (sf1's suffix-only scheme grows
pair density quadratically in the replica count — fine at 10 replicas,
degenerate at 100: every doc would gain 99 near-copies and the
candidate-pair term would grow 110x on top of sf1's 45x.)

Usage: python3 tools/make_sf10.py [srcDir] [outDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf10
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
R = 100         # replicas = 10 groups x 10 in-group variants
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
    print(f"{table}: {n}", flush=True)

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied", flush=True)

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

# documents: group-tag tokens (g>0) + in-group variant suffix (j>0);
# n_chars re-derived from the final text (n_chars == length(text) holds
# on the source corpus)
doc_parts = []
for i in range(R):
    g, j = i // 10, i % 10
    base = ("text" if g == 0 else
            f"array_to_string(list_transform(string_split(text, ' '), "
            f"t -> t || 'g{g}'), ' ')")
    txt = base if j == 0 else f"{base} || ' r{j}'"
    doc_parts.append(
        f"SELECT doc_id+{i*SHIFT} AS doc_id, {txt} AS text, lang, source, "
        f"length({txt}) AS n_chars FROM '{SRC}/documents.parquet'")
con.execute("COPY (" + " UNION ALL ".join(doc_parts) +
            f") TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
print("documents:", con.sql(
    f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0], flush=True)

gen("embeddings",
    "SELECT vec_id+{s} AS vec_id, embedding, label "
    f"FROM '{SRC}/embeddings.parquet'")
print("done ->", OUT)
