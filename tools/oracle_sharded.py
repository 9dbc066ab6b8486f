#!/usr/bin/env python3
"""Sharded DuckDB replays for the four gates whose MONOLITHIC oracles
exhaust DuckDB at sf10 (BASELINE.md round-11 ORACLE census):

  dedup_indexed / dedup_delta          — the 64-permutation minhash
      chain materializes grams x 64 rows (~6.4G at sf10) inside one
      aggregation and OOMs. Sharded: the permutation minima are
      computed in 16 independent 4-permutation passes (each streams
      grams x 4), spilled to parquet, and the signature/band/candidate
      tail runs over the 32M-row (doc, j, min) table instead.

  dedup_jaccard_indexed / dedup_containment_indexed — the shingle
      posting self-join spills >46 GiB of temp in one query. Sharded:
      grams partition by hash(gram) % 16; per-shard pair intersections
      (a gram lives in exactly one shard, so partial `inter` counts
      SUM to the exact global intersection) spill to parquet; the
      final pass aggregates pair partials and applies the identical
      size join + threshold. Both gates share one partial set.

Every sharded query is assembled from the SAME text fragments as the
committed monolithic oracles (normalization, md5->60-bit fold, the
permutation family, band slicing, thresholds), and the result is
value-compared with check_correctness.compare_frames — the driver's
rule. Equivalence of sharded vs monolithic is additionally asserted
directly at small SFs via --selfcheck (both forms computed, frames
compared), so the sharded form cannot silently drift.

Usage:
  python3 tools/oracle_sharded.py <sfDir> <verifyOutDir> --one <query>
  python3 tools/oracle_sharded.py <sfDir> <verifyOutDir> --selfcheck <query>

<verifyOutDir> must hold graft.Verify's parquet for the query
(--one mode). Exit 0 on PASS, 1 on FAIL.
"""
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_correctness import compare_frames  # noqa: E402

MEM_LIMIT = os.environ.get("GRAFT_ORACLE_MEM", "4GB")
TMP_QUOTA = os.environ.get("GRAFT_ORACLE_TMP", "8GB")
SHARDS = int(os.environ.get("GRAFT_ORACLE_SHARDS", "16"))

# ---- the committed oracle fragments (Dedup.scala mirrors) ----------
NORM = "string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ')"


def md5long(e):
    return ("CAST(list_sum(list_transform(range(1, 16), i -> "
            f"(strpos('123456789abcdef', substr(md5({e}), i, 1))::BIGINT"
            " << (4*(15-i))))) AS BIGINT)")


SHINGLES = f"""toks AS (SELECT doc_id, {NORM} AS w FROM documents),
  grams AS (SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, len(w)-1),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
    FROM toks WHERE len(w) >= 3)"""

GH = f"""gh AS (SELECT doc_id,
    {md5long('gram')} % 2147483647 AS h1,
    {md5long("gram || '!'")} % 2147483646 + 1 AS h2 FROM grams)"""

JACCARD_DF_CAP = 1000

KEPT = f"""dfk AS (SELECT gram FROM grams GROUP BY gram
    HAVING count(*) <= {JACCARD_DF_CAP}),
  kept AS (SELECT g.doc_id, g.gram FROM grams g JOIN dfk USING (gram))"""

# candidate tail over externally-supplied sigs + per-band pair shards.
# Equivalent to the monolithic `cand`: n_match is a FUNCTION of the
# pair, so DISTINCT over (id1, id2) from the per-band joins followed by
# one signature re-join computes the identical (id1, id2, n_match) set
# the monolithic DISTINCT over all 16 bands produces.
MINHASH_TAIL = """cand0 AS (SELECT DISTINCT id1, id2 FROM candparts),
  cand AS (SELECT c.id1, c.id2,
    CAST(list_sum(list_transform(range(1, 65),
      i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS BIGINT) AS n_match
    FROM cand0 c JOIN sigs a ON a.doc_id = c.id1
    JOIN sigs b ON b.doc_id = c.id2)"""

# recursive transitive closure over the minhash candidates — the
# committed clusterClosureSql tail (Dedup.scala), verbatim, applied
# after the sharded `cand`. minhash_result prefixes WITH RECURSIVE.
CLOSURE = """, cpairs AS (SELECT id1, id2 FROM cand WHERE n_match >= 32),
  edges AS (SELECT id1 AS src, id2 AS dst FROM cpairs
            UNION SELECT id2, id1 FROM cpairs),
  nodes AS (SELECT DISTINCT src AS id FROM edges),
  reach(id, comp) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
  comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)"""

MINHASH_FINAL = {
    "dedup_indexed":
        " SELECT id1, id2, n_match FROM cand WHERE n_match >= 32"
        " ORDER BY id1, id2",
    # r13 full-census follow-up: the INLINE minhash gate shares
    # dedup_indexed's oracle text byte-for-byte (one replay, two engine
    # paths — same pattern as the jaccard/containment inline aliases),
    # so the same sharded replay attests it; only the engine parquet
    # compared against differs.
    "dedup_minhash":
        " SELECT id1, id2, n_match FROM cand WHERE n_match >= 32"
        " ORDER BY id1, id2",
    # r13: the two closure gates (attested only to sf1 before) — the
    # committed Dedup.scala / Curate.scala final passes verbatim over
    # the sharded candidate set.
    "dedup_clusters": CLOSURE + """
  SELECT comp AS keep_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comps GROUP BY comp HAVING count(*) > 1 ORDER BY keep_id""",
    "dedup_keep_best": CLOSURE + """,
  stats AS (SELECT doc_id, CASE WHEN text IS NULL
      OR trim(regexp_replace(lower(text),'\\s+',' ','g')) = '' THEN 0
      ELSE CAST(len(string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ')) AS BIGINT)
      END AS n_toks FROM documents),
  members AS (SELECT c.comp, c.id AS doc_id, s.n_toks
    FROM comps c JOIN stats s ON s.doc_id = c.id),
  best AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size,
      max(n_toks) AS kept_toks
    FROM members GROUP BY comp HAVING count(*) > 1)
  SELECT m.comp AS comp, min(m.doc_id) AS keep_id, b.cluster_size, b.kept_toks
  FROM members m JOIN best b ON m.comp = b.comp AND m.n_toks = b.kept_toks
  GROUP BY m.comp, b.cluster_size, b.kept_toks ORDER BY m.comp""",
    # The committed oracle's srcs-join form makes DuckDB treat
    # (s1.source='src0') <> (s2.source='src0') as a join predicate
    # BETWEEN the two documents scans and plan a 500k x 500k
    # NESTED_LOOP_JOIN at sf10 (51 GiB of spill before dying). The
    # equivalent IN-membership form keeps both lookups as semi-joins
    # hanging off cand; --selfcheck proves value equality.
    "dedup_delta": """, src0 AS (
    SELECT doc_id FROM documents WHERE source = 'src0'),
  flags AS (SELECT id1, id2,
      id1 IN (SELECT doc_id FROM src0) AS a0,
      id2 IN (SELECT doc_id FROM src0) AS b0
    FROM cand WHERE n_match >= 32),
  split AS (SELECT CASE WHEN a0 THEN id2 ELSE id1 END AS delta_id,
                   CASE WHEN a0 THEN id1 ELSE id2 END AS corpus_id
            FROM flags WHERE a0 <> b0)
  SELECT delta_id, CAST(count(DISTINCT corpus_id) AS BIGINT) AS n_near,
    min(corpus_id) AS nearest_id
  FROM split GROUP BY delta_id ORDER BY delta_id""",
}

# final passes over externally-supplied `pairs(id1, id2, inter)` and
# `sizes(doc_id, n)` — both materialized to scratch parquet by
# shard_postings (r13): computing the ~10⁹-row pair-partial
# re-aggregation AND the full-corpus gram sizes inside ONE final query
# exceeded 42 GiB of temp at sf10; each alone is bounded.
POSTING_FINAL = {
    "dedup_jaccard_indexed": """
  SELECT id1, id2,
    round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) AS jaccard
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = pairs.id1
  JOIN sizes s2 ON s2.doc_id = pairs.id2
  WHERE round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) >= 0.6
  ORDER BY id1, id2""",
    "dedup_containment": None,  # alias — filled below
    "dedup_jaccard": None,  # alias — filled below
    "dedup_containment_indexed": """
  SELECT id1, id2, CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
    (1000 * inter) // least(CAST(s1.n AS BIGINT), CAST(s2.n AS BIGINT)) AS c_milli
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = pairs.id1
  JOIN sizes s2 ON s2.doc_id = pairs.id2
  WHERE (1000 * inter) // least(CAST(s1.n AS BIGINT), CAST(s2.n AS BIGINT)) >= 800
  ORDER BY id1, id2""",
}

# r13: the INLINE jaccard/containment gates share their committed
# oracle text with the indexed twins BYTE-FOR-BYTE (one replay, two
# engine paths), so the sharded posting replay attests both — only the
# engine parquet compared against differs.
POSTING_FINAL["dedup_jaccard"] = POSTING_FINAL["dedup_jaccard_indexed"]
POSTING_FINAL["dedup_containment"] = POSTING_FINAL["dedup_containment_indexed"]
# r13 full-census follow-up: the PPJoin prefix-filtered production path
# also shares the jaccard oracle text byte-for-byte — third engine path
# against the same replay.
POSTING_FINAL["dedup_jaccard_prefix"] = POSTING_FINAL["dedup_jaccard_indexed"]

MINHASH_QUERIES = set(MINHASH_FINAL)
POSTING_QUERIES = set(POSTING_FINAL)

# r13: supplier co-occurrence family (triangle_count). The monolithic
# oracle's lineitem x lineitem self-join on l_orderkey spills >23 GiB
# at sf10 (60M rows). Sharded by hash(l_orderkey) % SHARDS: a pair's
# co-occurrences within one ORDER live in exactly one shard, so the
# per-shard (u, v, support) partials SUM to the exact global support;
# the top-2000/deg/orientation/wedge tail below is the committed
# Graph.scala oracle verbatim over the re-aggregated `co`.
COPAIRS_FINAL = {
    "triangle_count": """,
  deg AS (SELECT id, count(*) AS deg FROM
    (SELECT u AS id FROM pairs UNION ALL SELECT v AS id FROM pairs) GROUP BY id),
  o AS (SELECT CASE WHEN du.deg <= dv.deg THEN p.u ELSE p.v END AS src,
      CASE WHEN du.deg <= dv.deg THEN p.v ELSE p.u END AS dst
    FROM pairs p JOIN deg du ON p.u = du.id JOIN deg dv ON p.v = dv.id),
  w AS (SELECT e1.dst AS w1, e2.dst AS w2 FROM o e1 JOIN o e2
    ON e1.src = e2.src AND e1.dst < e2.dst)
  SELECT CAST(count(*) AS BIGINT) AS n_wedges,
    CAST(sum(CASE WHEN p.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_triangles
  FROM w LEFT JOIN pairs p ON w.w1 = p.u AND w.w2 = p.v""",
    # r14 (verdict item 3): link_predict and clustering_coeff both
    # start from the SAME sparsified top-2000 edge set — everything
    # past `pairs` is a trivially-small wedge/degree tail, so the
    # already-attested copairs scratch converts both. Tails are the
    # committed Graph.scala oracles verbatim.
    "link_predict": """,
  e AS (SELECT u AS src, v AS dst FROM pairs UNION ALL SELECT v, u FROM pairs),
  deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
  cn AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS common FROM e e1 JOIN e e2
    ON e1.src = e2.src AND e1.dst < e2.dst GROUP BY 1, 2),
  cand AS (SELECT cn.a, cn.b, cn.common FROM cn WHERE NOT EXISTS
    (SELECT 1 FROM pairs p WHERE p.u = cn.a AND p.v = cn.b))
  SELECT c.a, c.b, c.common,
    (1000000 * c.common) // (da.deg + db.deg - c.common) AS jaccard_ppm
  FROM cand c JOIN deg da ON c.a = da.id JOIN deg db ON c.b = db.id
  ORDER BY c.common DESC, jaccard_ppm DESC, c.a, c.b LIMIT 100""",
    "clustering_coeff": """,
  deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM
    (SELECT u AS id FROM pairs UNION ALL SELECT v AS id FROM pairs) GROUP BY id),
  o AS (SELECT CASE WHEN du.deg <= dv.deg THEN p.u ELSE p.v END AS src,
    CASE WHEN du.deg <= dv.deg THEN p.v ELSE p.u END AS dst
    FROM pairs p JOIN deg du ON p.u = du.id JOIN deg dv ON p.v = dv.id),
  w AS (SELECT e1.src AS src, e1.dst AS w1, e2.dst AS w2 FROM o e1 JOIN o e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
  tri AS (SELECT src, w1, w2 FROM w JOIN pairs p ON w.w1 = p.u AND w.w2 = p.v),
  tv AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM
    (SELECT src AS id FROM tri UNION ALL SELECT w1 FROM tri
     UNION ALL SELECT w2 FROM tri) GROUP BY id)
  SELECT d.id, d.deg, COALESCE(tv.n_tri, 0) AS n_tri,
    (2000 * COALESCE(tv.n_tri, 0)) // nullif(d.deg * (d.deg - 1), 0) AS coeff_milli
  FROM deg d LEFT JOIN tv USING (id) ORDER BY d.id""",
}
COPAIRS_QUERIES = set(COPAIRS_FINAL)

# r14 (verdict item 3): pagerank_exact. The monolithic oracle's
# orders x lineitem edge derivation + five superstep CTEs exhaust the
# solo budget at sf10. Sharded: (1) the DISTINCT edge set is derived in
# SHARDS order-partitioned passes (both sides filter the SAME
# hash(orderkey) residue, so each pass is a bounded co-partitioned
# join; an edge arising under several orderkeys recurs across shards
# and the global DISTINCT collapses it); (2) nodes / out-degree-
# weighted edges / each femto-fixed-point rank vector r0..r5
# materialize as separate bounded passes — the committed
# pagerankOracleSql superstep formula verbatim, integer-exact, so the
# unrolled replay is bit-identical to the monolithic CTE chain.
PR_S = "1000000000000000"
PR_FINAL = {
    "pagerank_exact": None,  # assembled in pr_result (reads r5 scratch)
}
PR_QUERIES = set(PR_FINAL)

# r14 (verdict items 1+5): the SRP-LSH pair family. The monolithic
# lshOracle replays planes -> sign bits -> capped buckets -> candidate
# self-join -> exact-cosine re-rank in ONE query — resource-exhausted
# at sf10 (the 183.8M-pair candidate stream). Sharded: the keyed
# vector table and the occupancy-capped bucket rows (bit width
# re-derived from count(*), the LshBucketCap window filter — both the
# committed oracle text verbatim) materialize once; per-shard passes
# self-join only the (band, bk) buckets with hash(band, bk) % SHARDS
# = k (a bucket lives in exactly one shard) and re-rank in-shard, so
# only thresholded (id1, id2, cos_sim) triples reach scratch. cos is
# functionally pair-determined, so the final global DISTINCT
# reproduces the monolithic DISTINCT-then-re-rank rows exactly.
# Precomputed norms: nullif(a.nrm*b.nrm, 0) is the same float ops in
# the same order as the monolithic sqrt(dot)*sqrt(dot) (the emb-family
# precedent); --selfcheck proves value equality at small SFs.
LSH_MD5K = ("CAST(list_sum(list_transform(range(1,16), k -> "
            "strpos('123456789abcdef', substr(md5('rp|'||j||'|'||i), k, 1))"
            "::BIGINT << (4*(15-k)))) AS BIGINT)")
LSH_BUCKET_CAP = 8192
LSH_FINAL = {
    "dedup_embedding_lsh":
        " SELECT DISTINCT id1, id2, cos_sim FROM lparts"
        " ORDER BY id1, id2",
    "dedup_embedding_lsh_indexed": None,  # alias — same oracle text
}
LSH_FINAL["dedup_embedding_lsh_indexed"] = LSH_FINAL["dedup_embedding_lsh"]
LSH_QUERIES = set(LSH_FINAL)

# r13: SimHash family (dedup_simhash). The monolithic oracle's 4-band
# self-join materializes a ~460M-pair candidate stream at sf10 (the
# fixed-width 4x15 banding the ENGINE stops using past 32768 docs —
# Dedup.simhashPairsFromSigs switches to 20x30-bit block combos — but
# the ORACLE keeps: both schemes are exact-recall for hamming<=3, so
# the oracle replay doubles as proof the adaptive path changes nothing).
# Sharded: signatures materialize once (the 60-vote aggregate is linear
# and cheap), then each pass k self-joins only the (band, bits) buckets
# with hash(bits*4 + bd) % SHARDS = k and applies the exact hamming
# filter IN-SHARD, so only true hamming<=3 pairs ever hit scratch. A
# bucket lives in exactly one shard; a pair matching in several bands
# recurs across shards, and hamming is a function of the pair, so the
# global DISTINCT of the final pass reproduces the monolithic DISTINCT.
SIMHASH_FINAL = {
    "dedup_simhash":
        " SELECT DISTINCT id1, id2, hamming FROM candparts"
        " ORDER BY id1, id2",
}
SIMHASH_QUERIES = set(SIMHASH_FINAL)

# r13 census follow-up: winnowing family (dedup_substring +
# dedup_substring_indexed — one oracle text, two engine paths). The
# monolithic oracle computes per-doc winnow fingerprints (31-char-gram
# md5 minima over window 15), a df<=50 cap, and a posting self-join in
# ONE query — resource-exhausted at sf10. Sharded exactly like the
# shingle posting family: the capped (doc_id, fp) posting list
# materializes once (the df cap is computed globally IN that pass),
# then per-shard pair partials over hash(fp) % SHARDS (an fp lives in
# exactly one shard, so partial counts SUM to the exact n_shared).
WINNOW_POSTINGS = """
  WITH h AS (SELECT doc_id,
      list_transform(range(1, greatest(length(text) - 30, 2)),
        i -> CAST(concat('0x', substr(md5(text[i:i+31]), 1, 15)) AS BIGINT)) AS hs
    FROM documents WHERE length(text) >= 47),
  f AS (SELECT doc_id,
      list_distinct(list_transform(range(1, greatest(len(hs) - 14, 2)),
        j -> list_min(hs[j:j+15]))) AS fps
    FROM h),
  g AS (SELECT doc_id, unnest(fps) AS fp FROM f),
  dfk AS (SELECT fp FROM g GROUP BY fp HAVING count(*) <= 50)
  SELECT g.doc_id, g.fp FROM g JOIN dfk USING (fp)"""

WINNOW_FINAL = {
    "dedup_substring": """
  SELECT id1, id2, CAST(sum(c) AS BIGINT) AS n_shared
  FROM wparts GROUP BY 1, 2 ORDER BY 1, 2""",
    "dedup_substring_indexed": None,  # alias — same oracle text
}
WINNOW_FINAL["dedup_substring_indexed"] = WINNOW_FINAL["dedup_substring"]
WINNOW_QUERIES = set(WINNOW_FINAL)

# r16 (verdict item 2): dedup_jaccard_delta — the delta-ingest gate
# whose monolithic sf10 replay was the attestation chain's single
# heaviest link (GRAFT_ORACLE_MEM=40GB). Sharded like the posting
# family, but the pair join is DELTA-vs-BASE and the df cap is
# BASE-side only (the committed oracle text verbatim): the base
# df-capped postings, the delta postings, and both size tables
# materialize once (the base df cap is GLOBAL, computed inside the
# base pass); per-shard passes join only grams with hash(gram) %
# SHARDS = k (a gram lives in exactly one shard, so partial `inter`
# counts SUM exactly); the pair re-aggregation is itself sharded by
# pair hash (the pairs2_ lesson); the final pass applies the identical
# n1/n2 join + rounding + threshold.
JDELTA_FINAL = {
    "dedup_jaccard_delta": """
  SELECT delta_id, base_id,
    round(CAST(inter AS DOUBLE)/(n1 + n2 - inter), 6) AS jaccard
  FROM pairs JOIN n1s USING (delta_id) JOIN n2s USING (base_id)
  WHERE round(CAST(inter AS DOUBLE)/(n1 + n2 - inter), 6) >= 0.6
  ORDER BY delta_id, base_id""",
}
JDELTA_QUERIES = set(JDELTA_FINAL)

# r13 census follow-up: fuzzy_pairs. The monolithic oracle's
# block-keyed self-join + in-join levenshtein exhausts the solo budget
# at sf10. A pair lives in exactly ONE first-token block, so sharding
# the (already globally block-capped) keyed table by hash(blk) % SHARDS
# partitions the PAIR set exactly: per-shard results (edit distance
# filtered in-shard) union to the monolithic result with no re-agg.
FUZZY_KEYED = """
  WITH t AS (SELECT doc_id,
      substring(trim(regexp_replace(lower(text),'\\s+',' ','g')), 1, 32) AS prefix,
      (string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' '))[1] AS blk
    FROM documents),
  keep AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 10000)
  SELECT t.* FROM t JOIN keep USING (blk)"""

FUZZY_FINAL = {
    "fuzzy_pairs":
        " SELECT id1, id2, edit_dist FROM fparts ORDER BY id1, id2",
}
FUZZY_QUERIES = set(FUZZY_FINAL)

# r13 census follow-up: dedup_eval — precision/recall of the minhash
# candidate set against exact-Jaccard >= 0.5 truth. Its monolithic
# oracle recomputes BOTH pipelines in one query; the sharded form
# reuses the minhash scratch (sigs + band candidates) and the posting
# scratch (exact pair intersections + gram sizes) — the same attested
# partials that already judge dedup_indexed and dedup_jaccard — and
# only the small compose tail below is new. The committed monolithic
# tail, verbatim: truth join, candidate threshold, FULL OUTER JOIN,
# ppm ratios.
EVAL_QUERIES = {"dedup_eval"}

# r13 census follow-up: dedup_embedding (label-blocked exact cosine,
# EmbBlockCap HAVING guard). A pair lives in exactly ONE label block,
# so sharding the capped keyed table by hash(label) % SHARDS partitions
# the pair set exactly — per-shard thresholded results union to the
# monolithic rows with no re-agg. Norms are precomputed per vector in
# the keyed pass: nullif(a.nrm * b.nrm, 0) is the same float ops in the
# same order as the monolithic nullif(sqrt(dot(a,a))*sqrt(dot(b,b)),0),
# so values stay bit-identical.
EMB_KEYED = """
  WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
             FROM embeddings),
  ok AS (SELECT label FROM v GROUP BY label HAVING count(*) <= 100000)
  SELECT v.vec_id, v.label, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm
  FROM v JOIN ok USING (label)"""

EMB_FINAL = {
    "dedup_embedding":
        " SELECT label, id1, id2, cos_sim FROM eparts ORDER BY id1, id2",
}
EMB_QUERIES = set(EMB_FINAL)


def connect(sf_dir, tmp):
    import duckdb
    con = duckdb.connect()
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    con.execute("SET threads=4")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET max_temp_directory_size='{TMP_QUOTA}'")
    con.execute("CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    for t in ("lineitem", "orders", "embeddings"):
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def copy_to(con, select_sql, dest):
    """COPY ... TO with crash-atomicity and resume: skip if dest exists
    (a prior run finished it), write to a .tmp sibling and rename so a
    killed run can never leave a torn parquet behind."""
    if os.path.exists(dest):
        return False
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con.execute(f"COPY ({select_sql}) TO '{tmp}' (FORMAT PARQUET)")
    os.rename(tmp, dest)
    return True


def shard_minhash(con, scratch):
    """Three sharded phases. (1) 16 independent 4-permutation passes:
    each computes the per-(doc, permutation) minimum over all grams for
    its j-range only — grams x 4 intermediate rows instead of grams x
    64. (2) one signature assembly over the (doc, j, min) spill. (3) 16
    per-band candidate joins over slim (doc_id, band-key) projections —
    the monolithic 16-band self-join carried the full 64-long signature
    through the join and its DISTINCT, which is what blew the temp
    quota for the delta tail at sf10."""
    per = 64 // SHARDS
    for c in range(SHARDS):
        lo, hi = c * per, (c + 1) * per
        if copy_to(con, f"""
          WITH {SHINGLES}, {GH},
          perm AS (SELECT doc_id, j, min((h1 + j*h2) % 2147483647) AS m
            FROM gh, (SELECT unnest(range({lo}, {hi})) AS j) js GROUP BY 1, 2)
          SELECT * FROM perm""", f"{scratch}/perm_{c:02d}.parquet"):
            print(f"  perm shard {c + 1}/{SHARDS} (j in [{lo},{hi}))",
                  flush=True)
    if copy_to(con, f"""
      SELECT doc_id, list(m ORDER BY j) AS sig
      FROM '{scratch}/perm_*.parquet' GROUP BY 1""",
               f"{scratch}/sigs.parquet"):
        print("  signatures assembled", flush=True)
    for bd in range(16):
        if copy_to(con, f"""
          WITH s AS (SELECT doc_id, sig[{bd}*4+1 : {bd}*4+4] AS bk
                     FROM '{scratch}/sigs.parquet')
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM s a JOIN s b ON a.bk = b.bk AND a.doc_id < b.doc_id""",
                   f"{scratch}/cand_{bd:02d}.parquet"):
            print(f"  band shard {bd + 1}/16", flush=True)


def minhash_result(con, scratch, name):
    # WITH RECURSIVE unconditionally: legal with zero recursive CTEs,
    # required by the closure gates' `reach`.
    sql = (f"WITH RECURSIVE sigs AS (SELECT * FROM '{scratch}/sigs.parquet'),\n"
           f"  candparts AS (SELECT * FROM '{scratch}/cand_*.parquet'),\n"
           f"  {MINHASH_TAIL}\n{MINHASH_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_postings(con, scratch):
    """Partition the df-capped posting list by hash(gram) % SHARDS: a
    gram lives in exactly one shard, so per-shard pair intersection
    counts sum to the exact global `inter`."""
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH {SHINGLES}, {KEPT},
          sh AS (SELECT doc_id, gram FROM kept
                 WHERE hash(gram) % {SHARDS} = {k})
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2""", f"{scratch}/jp_{k:02d}.parquet"):
            print(f"  posting shard {k + 1}/{SHARDS}", flush=True)
    # materialize the two final-pass inputs separately (r13): the
    # pair-partial re-aggregation and the full-corpus gram sizes each
    # get the whole temp quota to themselves — together in one query
    # they exceeded 42 GiB at sf10. The re-aggregation is itself
    # sharded by pair hash (the ~10⁹ partial rows aggregate to ~10⁹
    # distinct pairs — most pairs share exactly one gram — which still
    # blew the quota as ONE aggregate): pass m touches only its pairs,
    # and a pair's partials land wholly in one pass, so the union is
    # the exact global aggregation.
    # ADVICE r13: the pairs_ -> pairs2_ rename orphaned any partials a
    # pre-rename run left behind — multi-GB dead parquet that nothing
    # would ever read again. Sweep them (and their .tmp siblings).
    for stale in glob.glob(f"{scratch}/pairs_*.parquet*"):
        os.unlink(stale)
    for m in range(SHARDS):
        if copy_to(con, f"""
          SELECT id1, id2, CAST(sum(inter) AS BIGINT) AS inter
          FROM '{scratch}/jp_*.parquet'
          WHERE hash(id1, id2) % {SHARDS} = {m}
          GROUP BY 1, 2""", f"{scratch}/pairs2_{m:02d}.parquet"):
            # pairs2_: the re-agg key changed from hash(id1*c + id2)
            # (INT64 overflow at sf10 doc_ids ~9.9e9) to hash(id1, id2);
            # the new artifact name keeps a resumable scratch from
            # unioning partials produced under the old key.
            print(f"  pair re-agg shard {m + 1}/{SHARDS}", flush=True)
    if copy_to(con, f"""
      WITH {SHINGLES}
      SELECT doc_id, count(*) AS n FROM grams GROUP BY 1""",
               f"{scratch}/sizes.parquet"):
        print("  gram sizes assembled", flush=True)


def posting_result(con, scratch, name):
    sql = (f"WITH pairs AS (SELECT * FROM '{scratch}/pairs2_*.parquet'),\n"
           f"  sizes AS (SELECT * FROM '{scratch}/sizes.parquet')\n"
           f"{POSTING_FINAL[name]}")
    return con.execute(sql).fetchdf()


def scratch_manifest(sf_dir, table="documents.parquet", extra_tables=()):
    """Identity of the partials in a scratch dir: shard count + corpus
    file size/mtime. ADVICE r12: resumable scratch keyed by neither
    SHARDS nor the corpus silently mixes shard layouts (overlapping
    j-ranges → >64-element signatures) or serves a regenerated corpus
    stale partials — refuse instead. Multi-table families (pagerank:
    orders AND lineitem) append extra stamps; single-table manifests
    keep the historic format so attested scratches stay reusable."""
    st = os.stat(os.path.join(sf_dir, table))
    base = f"shards={SHARDS} corpus={st.st_size}:{int(st.st_mtime)}"
    for t in extra_tables:
        st2 = os.stat(os.path.join(sf_dir, t))
        base += f" {t}={st2.st_size}:{int(st2.st_mtime)}"
    return base


def shard_copairs(con, scratch):
    """Order-partitioned supplier co-occurrence partials: shard k joins
    only lineitems whose hash(l_orderkey) % SHARDS = k, so each pass is
    bounded at ~1/SHARDS of the join's hash table; (u, v, support)
    partials from different shards cover disjoint ORDER sets and sum to
    the exact global support."""
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem
                      WHERE hash(l_orderkey) % {SHARDS} = {k})
          SELECT l1.l_suppkey AS u, l2.l_suppkey AS v, count(*) AS support
          FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
          GROUP BY 1, 2""", f"{scratch}/co_{k:02d}.parquet"):
            print(f"  copair shard {k + 1}/{SHARDS}", flush=True)
    # materialize the top-2000 ONCE: the tail references `pairs` four
    # times, and DuckDB's CTE inlining would re-run the 110M-row partial
    # re-aggregation per reference — measured 37+ GiB of CONCURRENT
    # aggregate spill at sf10 vs 15 s for the single materialized pass
    if copy_to(con, f"""
      WITH co AS (SELECT u, v, CAST(sum(support) AS BIGINT) AS support
        FROM '{scratch}/co_*.parquet' GROUP BY 1, 2)
      SELECT u, v FROM co ORDER BY support DESC, u, v LIMIT 2000""",
               f"{scratch}/pairs.parquet"):
        print("  top-2000 pair set assembled", flush=True)


def copairs_result(con, scratch, name):
    sql = (f"WITH pairs AS (SELECT * FROM '{scratch}/pairs.parquet')"
           f"{COPAIRS_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_pr(con, scratch):
    """Order-partitioned edge derivation, then bounded superstep
    passes — see the PR_FINAL comment."""
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH o AS (SELECT o_orderkey, o_custkey FROM orders
                     WHERE hash(o_orderkey) % {SHARDS} = {k}),
          li AS (SELECT l_orderkey, l_suppkey FROM lineitem
                 WHERE hash(l_orderkey) % {SHARDS} = {k})
          SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
          FROM o JOIN li ON o_orderkey = l_orderkey""",
                   f"{scratch}/e_{k:02d}.parquet"):
            print(f"  edge shard {k + 1}/{SHARDS}", flush=True)
    if copy_to(con, f"SELECT DISTINCT src, dst FROM '{scratch}/e_*.parquet'",
               f"{scratch}/edges.parquet"):
        print("  edge set assembled", flush=True)
    if copy_to(con, f"""
      SELECT src AS id FROM '{scratch}/edges.parquet'
      UNION SELECT dst FROM '{scratch}/edges.parquet'""",
               f"{scratch}/nodes.parquet"):
        print("  node set assembled", flush=True)
    if copy_to(con, f"""
      WITH e AS (SELECT * FROM '{scratch}/edges.parquet'),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
      SELECT e.src, e.dst, d.deg FROM e JOIN deg d ON e.src = d.src""",
               f"{scratch}/ew.parquet"):
        print("  degree-weighted edges assembled", flush=True)
    if copy_to(con, f"""
      SELECT id, CAST({PR_S} // (SELECT count(*)
        FROM '{scratch}/nodes.parquet') AS BIGINT) AS r
      FROM '{scratch}/nodes.parquet'""", f"{scratch}/r0.parquet"):
        print("  r0 assembled", flush=True)
    for i in range(1, 6):
        if copy_to(con, f"""
          WITH ew AS (SELECT * FROM '{scratch}/ew.parquet'),
          r AS (SELECT * FROM '{scratch}/r{i - 1}.parquet'),
          nodes AS (SELECT * FROM '{scratch}/nodes.parquet'),
          c AS (SELECT ew.dst AS id, CAST(sum(r.r // ew.deg) AS BIGINT) AS m
            FROM ew JOIN r ON ew.src = r.id GROUP BY ew.dst)
          SELECT n.id, CAST((SELECT (15 * {PR_S}) // (100 * count(*)) FROM nodes)
            + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN c ON n.id = c.id""",
                   f"{scratch}/r{i}.parquet"):
            print(f"  superstep {i}/5", flush=True)


def pr_result(con, scratch, name):
    assert name == "pagerank_exact", name
    return con.execute(
        f"SELECT id, r AS rank_fp FROM '{scratch}/r5.parquet' "
        "ORDER BY rank_fp DESC, id LIMIT 100").fetchdf()


def shard_srplsh(con, scratch):
    """Keyed vectors + capped bucket rows once, then bucket-hash-
    sharded candidate self-joins with the exact-cosine re-rank
    in-shard — see the LSH_FINAL comment."""
    if copy_to(con, """
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings""", f"{scratch}/vkeyed.parquet"):
        print("  keyed vectors assembled", flush=True)
    if copy_to(con, f"""
      WITH v AS (SELECT vec_id, e FROM '{scratch}/vkeyed.parquet'),
      bw AS (SELECT greatest(8, CASE
          WHEN (greatest(count(*),1) + 127)//128 <= 1 THEN 0
          ELSE length(bin((greatest(count(*),1) + 127)//128 - 1)) END) AS nb
        FROM v),
      planes AS (SELECT j, list_transform(range(0,64), i ->
          CAST({LSH_MD5K} % 2001 - 1000 AS DOUBLE)) AS p
        FROM (SELECT unnest(range(0, 8 * nb)) AS j FROM bw) t),
      bits AS (SELECT v.vec_id, p.j,
          CASE WHEN list_dot_product(v.e, p.p) >= 0 THEN 1 ELSE 0 END AS bit
        FROM v, planes p),
      buckets0 AS (SELECT vec_id, j//bw.nb AS band,
          CAST(sum(CAST(bit AS BIGINT) << (j%bw.nb)) AS BIGINT) AS bk
        FROM bits, bw GROUP BY vec_id, j//bw.nb)
      SELECT vec_id, band, bk FROM (
          SELECT vec_id, band, bk,
            count(*) OVER (PARTITION BY band, bk) AS occ
          FROM buckets0) t
      WHERE occ <= {LSH_BUCKET_CAP}""", f"{scratch}/buckets.parquet"):
        print("  capped bucket rows assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH b AS (SELECT * FROM '{scratch}/buckets.parquet'
                     WHERE hash(band, bk) % {SHARDS} = {k}),
          v AS (SELECT * FROM '{scratch}/vkeyed.parquet'),
          cand AS (SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2
            FROM b a JOIN b b2
            ON a.band = b2.band AND a.bk = b2.bk AND a.vec_id < b2.vec_id),
          pairs AS (SELECT id1, id2,
              list_dot_product(va.e, vb.e) / nullif(va.nrm * vb.nrm, 0) AS cos
            FROM cand JOIN v va ON va.vec_id = id1
                      JOIN v vb ON vb.vec_id = id2)
          SELECT id1, id2, round(cos, 6) AS cos_sim
          FROM pairs WHERE cos >= 0.4""",
                   f"{scratch}/lp_{k:02d}.parquet"):
            print(f"  lsh shard {k + 1}/{SHARDS}", flush=True)


def srplsh_result(con, scratch, name):
    sql = (f"WITH lparts AS (SELECT * FROM '{scratch}/lp_*.parquet')"
           f"{LSH_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_simhash(con, scratch):
    """Signatures once (committed dedup_simhash oracle text verbatim:
    normalize -> tokens -> md5 fold -> 60 sign-of-votes bits), then 16
    bucket-hash-sharded band self-joins with the exact hamming filter
    applied in-shard."""
    if copy_to(con, f"""
      WITH toks AS (SELECT doc_id, {NORM} AS w FROM documents),
      th AS (SELECT doc_id, {md5long('t')} AS h
        FROM (SELECT doc_id, unnest(w) AS t FROM toks) u),
      votes AS (SELECT doc_id, k,
        sum(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, (SELECT unnest(range(0, 60)) AS k) ks GROUP BY 1, 2)
      SELECT doc_id,
        CAST(sum(CASE WHEN v >= 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS sim
      FROM votes GROUP BY 1""", f"{scratch}/sims.parquet"):
        print("  simhash signatures assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH keys AS (SELECT doc_id, sim, bd,
              (sim >> (bd*15)) & 32767 AS bits
            FROM '{scratch}/sims.parquet',
                 (SELECT unnest(range(0, 4)) AS bd) bs
            WHERE hash(((sim >> (bd*15)) & 32767) * 4 + bd) % {SHARDS} = {k})
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
          FROM keys a JOIN keys b
          ON a.bd = b.bd AND a.bits = b.bits AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sim, b.sim)) <= 3""",
                   f"{scratch}/sh_{k:02d}.parquet"):
            print(f"  simhash band shard {k + 1}/{SHARDS}", flush=True)


def simhash_result(con, scratch, name):
    sql = (f"WITH candparts AS (SELECT * FROM '{scratch}/sh_*.parquet')"
           f"{SIMHASH_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_winnow(con, scratch):
    """Capped winnow posting list once (the committed dedup_substring
    oracle's h/f/g/dfk chain verbatim — the df cap is GLOBAL, computed
    inside this one pass), then hash(fp)-sharded pair partials."""
    if copy_to(con, WINNOW_POSTINGS, f"{scratch}/wkept.parquet"):
        print("  winnow postings assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH sh AS (SELECT doc_id, fp FROM '{scratch}/wkept.parquet'
                      WHERE hash(fp) % {SHARDS} = {k})
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
          FROM sh a JOIN sh b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2""", f"{scratch}/wp_{k:02d}.parquet"):
            print(f"  winnow shard {k + 1}/{SHARDS}", flush=True)


def winnow_result(con, scratch, name):
    sql = (f"WITH wparts AS (SELECT * FROM '{scratch}/wp_*.parquet')"
           f"{WINNOW_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_jdelta(con, scratch):
    """Base/delta split postings once (the committed dedup_jaccard_delta
    oracle's srcs/base/delta/dfk/kept chain verbatim — the BASE-side df
    cap is GLOBAL, computed inside the base pass), then hash(gram)-
    sharded delta-vs-base pair partials and a pair-hash-sharded
    re-aggregation."""
    if copy_to(con, f"""
      WITH {SHINGLES},
      srcs AS (SELECT doc_id, source FROM documents),
      base AS (SELECT g.doc_id AS base_id, g.gram FROM grams g
               JOIN srcs USING (doc_id) WHERE source = 'src0'),
      dfk AS (SELECT gram FROM base GROUP BY gram
              HAVING count(*) <= {JACCARD_DF_CAP})
      SELECT base_id, gram FROM base JOIN dfk USING (gram)""",
               f"{scratch}/bkept.parquet"):
        print("  base kept postings assembled", flush=True)
    if copy_to(con, f"""
      WITH {SHINGLES},
      srcs AS (SELECT doc_id, source FROM documents)
      SELECT g.doc_id AS delta_id, g.gram FROM grams g
      JOIN srcs USING (doc_id) WHERE source <> 'src0'""",
               f"{scratch}/dgrams.parquet"):
        print("  delta postings assembled", flush=True)
    if copy_to(con, f"""
      SELECT delta_id, count(*) AS n1 FROM '{scratch}/dgrams.parquet'
      GROUP BY 1""", f"{scratch}/n1.parquet"):
        print("  delta sizes assembled", flush=True)
    # n2 is over ALL base grams (not the df-capped kept set) — the
    # denominator always uses full shingle sets, mirroring the oracle
    if copy_to(con, f"""
      WITH {SHINGLES},
      srcs AS (SELECT doc_id, source FROM documents)
      SELECT g.doc_id AS base_id, count(*) AS n2 FROM grams g
      JOIN srcs USING (doc_id) WHERE source = 'src0' GROUP BY 1""",
               f"{scratch}/n2.parquet"):
        print("  base sizes assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH d AS (SELECT delta_id, gram FROM '{scratch}/dgrams.parquet'
                     WHERE hash(gram) % {SHARDS} = {k}),
          b AS (SELECT base_id, gram FROM '{scratch}/bkept.parquet'
                WHERE hash(gram) % {SHARDS} = {k})
          SELECT delta_id, base_id, count(*) AS inter
          FROM d JOIN b USING (gram) GROUP BY 1, 2""",
                   f"{scratch}/jd_{k:02d}.parquet"):
            print(f"  jdelta shard {k + 1}/{SHARDS}", flush=True)
    for m in range(SHARDS):
        if copy_to(con, f"""
          SELECT delta_id, base_id, CAST(sum(inter) AS BIGINT) AS inter
          FROM '{scratch}/jd_*.parquet'
          WHERE hash(delta_id, base_id) % {SHARDS} = {m}
          GROUP BY 1, 2""", f"{scratch}/jdpairs_{m:02d}.parquet"):
            print(f"  jdelta pair re-agg shard {m + 1}/{SHARDS}", flush=True)


def jdelta_result(con, scratch, name):
    sql = (f"WITH pairs AS (SELECT * FROM '{scratch}/jdpairs_*.parquet'),\n"
           f"  n1s AS (SELECT * FROM '{scratch}/n1.parquet'),\n"
           f"  n2s AS (SELECT * FROM '{scratch}/n2.parquet')"
           f"{JDELTA_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_fuzzy(con, scratch):
    """Globally block-capped keyed table once (committed fuzzy_pairs
    oracle text verbatim), then hash(blk)-sharded block self-joins with
    the threshold levenshtein applied in-shard."""
    if copy_to(con, FUZZY_KEYED, f"{scratch}/fkeyed.parquet"):
        print("  fuzzy keyed table assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH sh AS (SELECT doc_id, prefix, blk
                      FROM '{scratch}/fkeyed.parquet'
                      WHERE hash(blk) % {SHARDS} = {k})
          SELECT a.doc_id AS id1, b.doc_id AS id2,
            CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
          FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE levenshtein(a.prefix, b.prefix) <= 8""",
                   f"{scratch}/fz_{k:02d}.parquet"):
            print(f"  fuzzy shard {k + 1}/{SHARDS}", flush=True)


def fuzzy_result(con, scratch, name):
    sql = (f"WITH fparts AS (SELECT * FROM '{scratch}/fz_*.parquet')"
           f"{FUZZY_FINAL[name]}")
    return con.execute(sql).fetchdf()


def shard_emb(con, scratch):
    """Capped keyed vector table once (committed dedup_embedding oracle
    text + precomputed norms), then hash(label)-sharded block
    self-joins with the cosine threshold applied in-shard."""
    if copy_to(con, EMB_KEYED, f"{scratch}/ekeyed.parquet"):
        print("  embedding keyed table assembled", flush=True)
    for k in range(SHARDS):
        if copy_to(con, f"""
          WITH sh AS (SELECT * FROM '{scratch}/ekeyed.parquet'
                      WHERE hash(label) % {SHARDS} = {k}),
          pairs AS (SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
              list_dot_product(a.e, b.e) / nullif(a.nrm * b.nrm, 0) AS cos
            FROM sh a JOIN sh b
            ON a.label = b.label AND a.vec_id < b.vec_id)
          SELECT CAST(label AS BIGINT) AS label, id1, id2,
                 round(cos, 6) AS cos_sim
          FROM pairs WHERE cos >= 0.4""",
                   f"{scratch}/eb_{k:02d}.parquet"):
            print(f"  embedding shard {k + 1}/{SHARDS}", flush=True)


def emb_result(con, scratch, name):
    sql = (f"WITH eparts AS (SELECT * FROM '{scratch}/eb_*.parquet')"
           f"{EMB_FINAL[name]}")
    return con.execute(sql).fetchdf()


def eval_result(con, mh_scratch, po_scratch):
    sql = (
        f"WITH RECURSIVE sigs AS (SELECT * FROM '{mh_scratch}/sigs.parquet'),\n"
        f"  candparts AS (SELECT * FROM '{mh_scratch}/cand_*.parquet'),\n"
        f"  {MINHASH_TAIL},\n"
        f"  jpair AS (SELECT * FROM '{po_scratch}/pairs2_*.parquet'),\n"
        f"  sizes AS (SELECT * FROM '{po_scratch}/sizes.parquet'),\n"
        """truth AS (SELECT id1, id2, 1 AS t FROM jpair
           JOIN sizes s1 ON s1.doc_id = jpair.id1
           JOIN sizes s2 ON s2.doc_id = jpair.id2
           WHERE round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) >= 0.5),
         cands AS (SELECT id1, id2, 1 AS c FROM cand WHERE n_match >= 32),
         m AS (SELECT coalesce(truth.t, 0) AS t, coalesce(cands.c, 0) AS c
           FROM truth FULL OUTER JOIN cands USING (id1, id2))
       SELECT CAST(sum(t) AS BIGINT) AS n_truth,
         CAST(sum(c) AS BIGINT) AS n_cand,
         CAST(sum(t*c) AS BIGINT) AS n_hits,
         (1000000 * CAST(sum(t*c) AS BIGINT)) // nullif(CAST(sum(c) AS BIGINT), 0) AS precision_ppm,
         (1000000 * CAST(sum(t*c) AS BIGINT)) // nullif(CAST(sum(t) AS BIGINT), 0) AS recall_ppm
       FROM m""")
    return con.execute(sql).fetchdf()


def family_scratch(sf_dir, scratch_root, fam):
    """Manifest-guarded per-family scratch dir (shards + corpus
    fingerprint): stale layouts are deleted and rebuilt, never mixed."""
    scratch = os.path.join(scratch_root, f".shard_{fam}")
    manifest = scratch_manifest(
        sf_dir,
        "lineitem.parquet" if fam in ("copairs", "pr")
        else "embeddings.parquet" if fam in ("emb", "srplsh")
        else "documents.parquet",
        extra_tables=("orders.parquet",) if fam == "pr" else ())
    mpath = os.path.join(scratch, "MANIFEST")
    if os.path.isdir(scratch):
        on_disk = (open(mpath).read().strip()
                   if os.path.exists(mpath) else "<missing>")
        if on_disk != manifest:
            print(f"  scratch manifest mismatch ({on_disk!r} != "
                  f"{manifest!r}) — rebuilding {scratch}", flush=True)
            shutil.rmtree(scratch)
    os.makedirs(scratch, exist_ok=True)
    if not os.path.exists(mpath):
        with open(mpath, "w") as f:
            f.write(manifest + "\n")
    return scratch


def sharded_oracle(sf_dir, scratch_root, name):
    # Scratch is keyed by FAMILY and kept between runs: the two minhash
    # gates share identical partials (and so do the two posting gates),
    # and a failed/tuned final pass must not recompute 20+ minutes of
    # shards. A manifest (shard count + corpus fingerprint) guards the
    # reuse: on mismatch the stale scratch is DELETED and rebuilt.
    fam = ("minhash" if name in MINHASH_QUERIES
           else "copairs" if name in COPAIRS_QUERIES
           else "pr" if name in PR_QUERIES
           else "srplsh" if name in LSH_QUERIES
           else "simhash" if name in SIMHASH_QUERIES
           else "winnow" if name in WINNOW_QUERIES
           else "jdelta" if name in JDELTA_QUERIES
           else "fuzzy" if name in FUZZY_QUERIES
           else "eval" if name in EVAL_QUERIES
           else "emb" if name in EMB_QUERIES else "posting")
    scratch = family_scratch(sf_dir, scratch_root, fam)
    con = connect(sf_dir, os.path.join(scratch, "duck_tmp"))
    try:
        if name in MINHASH_QUERIES:
            shard_minhash(con, scratch)  # per-artifact skip inside
            return minhash_result(con, scratch, name)
        elif name in COPAIRS_QUERIES:
            shard_copairs(con, scratch)
            return copairs_result(con, scratch, name)
        elif name in PR_QUERIES:
            shard_pr(con, scratch)
            return pr_result(con, scratch, name)
        elif name in LSH_QUERIES:
            shard_srplsh(con, scratch)
            return srplsh_result(con, scratch, name)
        elif name in SIMHASH_QUERIES:
            shard_simhash(con, scratch)
            return simhash_result(con, scratch, name)
        elif name in WINNOW_QUERIES:
            shard_winnow(con, scratch)
            return winnow_result(con, scratch, name)
        elif name in JDELTA_QUERIES:
            shard_jdelta(con, scratch)
            return jdelta_result(con, scratch, name)
        elif name in FUZZY_QUERIES:
            shard_fuzzy(con, scratch)
            return fuzzy_result(con, scratch, name)
        elif name in EVAL_QUERIES:
            # dedup_eval composes two attested families: minhash
            # candidates (n_match >= 32) vs exact-Jaccard truth
            # (inter / union >= 0.5 over the SAME posting partials).
            # Build/serve both ingredient scratches — each resumable,
            # each a no-op when its artifacts already exist.
            mh = family_scratch(sf_dir, scratch_root, "minhash")
            po = family_scratch(sf_dir, scratch_root, "posting")
            shard_minhash(con, mh)
            shard_postings(con, po)
            return eval_result(con, mh, po)
        elif name in EMB_QUERIES:
            shard_emb(con, scratch)
            return emb_result(con, scratch, name)
        elif name in POSTING_QUERIES:
            shard_postings(con, scratch)
            return posting_result(con, scratch, name)
        raise SystemExit(f"unknown sharded query: {name}")
    finally:
        con.close()
        shutil.rmtree(os.path.join(scratch, "duck_tmp"), ignore_errors=True)


def engine_frame(con_sf_dir, out_dir, name):
    import duckdb
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        return None
    return duckdb.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()


def selfcheck(sf_dir, scratch_root, name):
    """Sharded form vs the committed MONOLITHIC oracle at a small SF —
    proves the decomposition is exact before it is trusted at sf10."""
    import json
    sharded = sharded_oracle(sf_dir, scratch_root, name)
    oracle_sql = json.load(open(f"{scratch_root}/oracle_sql.json"))[name]
    con = connect(sf_dir, os.path.join(scratch_root, ".selfcheck_tmp"))
    try:
        # documents and lineitem are already views (connect)
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "events", "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM '{p}'")
        mono = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    rc = compare_frames(f"selfcheck:{name}", mono, sharded)
    return rc


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    mode = sys.argv[3]
    name = sys.argv[4]
    if mode == "--selfcheck":
        sys.exit(selfcheck(sf_dir, out_dir, name))
    assert mode == "--one", mode
    import io
    import time
    t0 = time.time()
    spark_df = engine_frame(sf_dir, out_dir, name)
    if spark_df is None:
        sys.exit(1)
    oracle_df = sharded_oracle(sf_dir, out_dir, name)
    # tee the PASS/FAIL line into the in-repo attestation record (r13
    # verdict item 2) while still printing it
    buf = io.StringIO()
    _stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = compare_frames(name, spark_df, oracle_df)
    finally:
        sys.stdout = _stdout
    out = buf.getvalue()
    print(out, end="")
    try:
        from attest import merge_attest
        line = next((l for l in out.splitlines()
                     if l.startswith(("PASS", "FAIL"))), f"rc={rc}")
        merge_attest("sharded", sf_dir, name, line, time.time() - t0)
    except Exception as e:
        print(f"WARN attest record not written: {e}", file=sys.stderr)
    sys.exit(rc)


if __name__ == "__main__":
    main()
