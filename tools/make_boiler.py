#!/usr/bin/env python3
"""Generate the BOILERPLATE-heavy corpus that motivates prefix
filtering (BASELINE.md "Round-10 prefix-filter crossover").

Shape: N docs, each = ~40 unique tokens + one of 50 shared boilerplate
paragraphs (~31 tokens). Every boilerplate shingle lands in N/50 docs —
far too common to be rare, far below the JaccardDfCap=1000 stop-gram
guard (with N=20000: df=400), so the inverted-index join must expand
Sigma df^2 ~= 1550 grams x 400^2 = 2.5e8 candidate rows while the TRUE
near-dup pair count is ZERO (two docs sharing boilerplate have
J ~= 30/120 << 0.6). Rarest-first prefixes consist purely of the
unique tokens, so the prefix join generates ~no candidates at all.
This is the crawl-corpus regime (navigation chrome, license headers,
cookie banners) where exact-Jaccard via postings is structurally
quadratic and AllPairs-style prefix filtering is the published fix.

Usage: python3 tools/make_boiler.py [N] [outDir]
Defaults: 20000 /tmp/boiler
"""
import os
import random
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/boiler"
os.makedirs(OUT, exist_ok=True)
rnd = random.Random(1234)

boiler = [
    " ".join(f"bp{b}t{k}" for k in range(31)) for b in range(50)
]

rows = []
for i in range(N):
    uniq = " ".join(f"u{i}w{k}" for k in range(40))
    rows.append((i, uniq + " " + boiler[rnd.randrange(50)],
                 "en", f"src{i % 4}"))

con = duckdb.connect()
con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR)")
con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?)", rows)
con.execute("ALTER TABLE documents ADD COLUMN n_chars BIGINT")
con.execute("UPDATE documents SET n_chars = length(text)")
con.execute(f"COPY documents TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
print(f"wrote {N} docs to {OUT}/documents.parquet")
