#!/usr/bin/env python3
"""Decade-step evidence for the adaptive SimHash banding (the r12
verdict's "noted, not marked" fixed-width cousin of the SRP finding):
counts the candidate-pair STREAM — the pre-DISTINCT
Σ_keys C(occupancy, 2) that the banding equality self-join
materializes — for a given documents corpus, under

  (a) the historic 4 bands × 15 bits (key space 2^15 per band), and
  (b) the 6-block / choose-3 combination scheme (20 keys × 30 bits)
      that Dedup.simhashPairsFromSigs switches to past
      SimComboThreshold = 32768 docs.

Both schemes are exact-recall candidate generators for hamming <= 3
(pigeonhole: 3 flipped bits leave >= 1 of 4 disjoint 15-bit bands —
resp. >= 3 of 6 disjoint 10-bit blocks, hence >= 1 of the C(6,3)
triples — untouched), so the gate's FINAL rows are identical; what
changes with the corpus is the verification work this count measures.

The signature pipeline below is the committed dedup_simhash oracle
verbatim (normalize -> whitespace tokens -> md5-prefix hash -> 60
sign-of-votes bits), so the counts describe the engine's actual join.

Usage: python3 tools/simhash_candidates.py <documents.parquet> [mode ...]
  mode in {4x15, combo, auto}; default: 4x15 combo
Prints one JSON line per requested mode.
"""
import json
import sys

import duckdb

PATH = sys.argv[1]
MODES = sys.argv[2:] or ["4x15", "combo"]
THRESHOLD = 32768  # Dedup.SimComboThreshold

MD5L = ("CAST(list_sum(list_transform(range(1, 16), i -> "
        "(strpos('123456789abcdef', substr(md5(t), i, 1))::BIGINT"
        " << (4*(15-i))))) AS BIGINT)")

con = duckdb.connect()
n = con.sql(f"SELECT count(*) FROM '{PATH}'").fetchone()[0]

con.execute(f"""
    CREATE TEMP TABLE sims AS
    WITH toks AS (SELECT doc_id,
        string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS w
      FROM '{PATH}'),
    th AS (SELECT doc_id, {MD5L} AS h
      FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
    votes AS (SELECT doc_id, k,
        sum(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th, (SELECT unnest(range(0, 60)) AS k) ks GROUP BY 1, 2)
    SELECT doc_id,
        CAST(sum(CASE WHEN v >= 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS sim
    FROM votes GROUP BY 1""")

# the 20 lexicographic 3-of-6 block triples, same order as the Scala
# (0 until 6).combinations(3)
COMBOS = [(a, b, c) for a in range(6) for b in range(a + 1, 6)
          for c in range(b + 1, 6)]

for mode in MODES:
    m = ("combo" if n > THRESHOLD else "4x15") if mode == "auto" else mode
    if m == "4x15":
        keys = ("SELECT doc_id, bd AS band, (sim >> (bd*15)) & 32767 AS bits "
                "FROM sims, (SELECT unnest(range(0, 4)) AS bd) bs")
        nkeys = 4
    else:
        parts = " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band, "
            f"(((sim >> {a*10}) & 1023) << 20) + (((sim >> {b*10}) & 1023) << 10)"
            f" + ((sim >> {c*10}) & 1023) AS bits FROM sims"
            for i, (a, b, c) in enumerate(COMBOS))
        keys = parts
        nkeys = 20
    row = con.sql(f"""
        WITH keys AS ({keys}),
        occ AS (SELECT band, bits, count(*) AS c FROM keys GROUP BY 1, 2)
        SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS cand_pairs,
               CAST(max(c) AS BIGINT) AS max_bucket,
               CAST(count(*) AS BIGINT) AS nonempty_buckets
        FROM occ""").fetchone()
    print(json.dumps({"path": PATH, "n": n, "mode": mode, "scheme": m,
                      "keys_per_doc": nkeys, "cand_pairs": row[0],
                      "max_bucket": row[1], "nonempty_buckets": row[2]}),
          flush=True)
