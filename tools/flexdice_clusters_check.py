#!/usr/bin/env python3
"""Independent value-attestation of flexdice_clusters at corpora where
the full DuckDB replay is oracle-cost (the clusters oracle inlines the
7-layer dice ~112x — >20 min over sf10's 10M events).

The clusters output is a PURE function of the terminal-cell set, and
flexdice_cells IS DuckDB-attested at the same corpus — so replaying
phase 2 (the quadtree ancestor-chain adjacency + connected components)
with a from-scratch union-find over the ATTESTED cells parquet is an
exact independent check of the engine's cluster output, sharing no
code with the Spark path (which uses an equality join + the
large-star/small-star contraction).

Usage: python3 tools/flexdice_clusters_check.py <verifyOutDir>
where <verifyOutDir> holds flexdice_cells/ (gate-verified) and
flexdice_clusters/ engine parquet. Exit 0 iff identical.
"""
import collections
import sys

import duckdb

OUT = sys.argv[1]
KEY_L, KEY_C = 1 << 40, 1 << 20

term = duckdb.sql(
    f"SELECT level, cx, cy, n_objects FROM '{OUT}/flexdice_cells/*.parquet'"
    " WHERE density = 'DENSE'").fetchall()
dense = {(l, cx, cy): n for l, cx, cy, n in term}


def key(t):
    return t[0] * KEY_L + t[1] * KEY_C + t[2]


parent = {t: t for t in dense}


def find(a):
    while parent[a] != a:
        parent[a] = parent[parent[a]]
        a = parent[a]
    return a


def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb, key=key)] = min(ra, rb, key=key)


for (l, cx, cy) in dense:
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        ncx, ncy = cx + dx, cy + dy
        if ncx < 0 or ncy < 0 or ncx >= (1 << l) or ncy >= (1 << l):
            continue
        # the unique existing cell containing the same-level neighbor
        # coordinate is the deepest dense prefix on its ancestor chain
        for k in range(0, l + 1):
            cand = (k, ncx >> (l - k), ncy >> (l - k))
            if cand in dense and cand != (l, cx, cy):
                union((l, cx, cy), cand)

clusters = collections.defaultdict(lambda: [0, 0])
for t in dense:
    r = key(find(t))
    clusters[r][0] += 1
    clusters[r][1] += dense[t]
ref = sorted((r, c[0], c[1]) for r, c in clusters.items())

engine = [tuple(map(int, r)) for r in duckdb.sql(
    f"SELECT cluster_id, n_cells, n_objects FROM"
    f" '{OUT}/flexdice_clusters/*.parquet' ORDER BY 1").fetchall()]

if ref == engine:
    print(f"PASS flexdice_clusters ({len(engine)} clusters,"
          f" {len(dense)} dense cells, union-find replay)")
    sys.exit(0)
only_ref = [r for r in ref if r not in engine][:5]
only_eng = [r for r in engine if r not in ref][:5]
print(f"FAIL flexdice_clusters: ref-only={only_ref} engine-only={only_eng}")
sys.exit(1)
