#!/usr/bin/env python3
"""Decade-step evidence for the adaptive SRP band width (round-12
verdict item 1): counts the SRP-LSH candidate-pair STREAM — the
pre-DISTINCT Σ_bands Σ_buckets C(occupancy, 2) that the (band, bucket)
equality self-join materializes, i.e. the quantity that was
Θ(n²/2⁸) with the fixed 8-bit band — for a given embeddings corpus,
under (a) the historic fixed 8-bit width and (b) the adaptive
bandBitsFor width (greatest(8, ceil-log2(ceil(n/128))), exact integer
math, same formula as AnnOps.bandBitsFor / the committed oracle).

The bucket construction below is the committed lshOracle fragment
verbatim (md5-derived integer hyperplanes, ascending-index dot,
shiftleft fold) so the counts describe the engine's actual join.

Usage: python3 tools/lsh_candidates.py <embeddings.parquet> [bits|auto] ...
Prints one JSON line per requested width.
"""
import json
import sys

import duckdb

PATH = sys.argv[1]
WIDTHS = sys.argv[2:] or ["8", "auto"]

MD5K = ("CAST(list_sum(list_transform(range(1,16), k -> "
        "strpos('123456789abcdef', substr(md5('rp|'||j||'|'||i), k, 1))::BIGINT"
        " << (4*(15-k)))) AS BIGINT)")

con = duckdb.connect()
n = con.sql(f"SELECT count(*) FROM '{PATH}'").fetchone()[0]
auto_bits = con.sql(
    "SELECT greatest(8, CASE WHEN (greatest(CAST(? AS BIGINT),1)+127)//128 <= 1 THEN 0 "
    "ELSE length(bin((greatest(CAST(? AS BIGINT),1)+127)//128 - 1)) END)",
    params=[n, n]).fetchone()[0]

for w in WIDTHS:
    nb = auto_bits if w == "auto" else int(w)
    row = con.sql(f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM '{PATH}'),
        planes AS (SELECT j, list_transform(range(0,64), i ->
            CAST({MD5K} % 2001 - 1000 AS DOUBLE)) AS p
          FROM range(0, 8*{nb}) t(j)),
        bits AS (SELECT v.vec_id, p.j,
            CASE WHEN list_dot_product(v.e, p.p) >= 0 THEN 1 ELSE 0 END AS bit
          FROM v, planes p),
        buckets AS (SELECT vec_id, j//{nb} AS band,
            CAST(sum(CAST(bit AS BIGINT) << (j%{nb})) AS BIGINT) AS bk
          FROM bits GROUP BY vec_id, j//{nb}),
        occ AS (SELECT band, bk, count(*) AS c FROM buckets GROUP BY band, bk)
        SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS cand_pairs,
               CAST(max(c) AS BIGINT) AS max_bucket,
               CAST(count(*) AS BIGINT) AS nonempty_buckets
        FROM occ""").fetchone()
    print(json.dumps({"path": PATH, "n": n, "bits": nb,
                      "mode": w, "cand_pairs": row[0],
                      "max_bucket": row[1],
                      "nonempty_buckets": row[2]}), flush=True)
