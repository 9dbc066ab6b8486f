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

MINHASH_FINAL = {
    "dedup_indexed":
        " SELECT id1, id2, n_match FROM cand WHERE n_match >= 32"
        " ORDER BY id1, id2",
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

# final passes over an externally-supplied `pairs(id1, id2, inter)`
POSTING_FINAL = {
    "dedup_jaccard_indexed": """, sizes AS (
    SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
  SELECT id1, id2,
    round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) AS jaccard
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = pairs.id1
  JOIN sizes s2 ON s2.doc_id = pairs.id2
  WHERE round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) >= 0.6
  ORDER BY id1, id2""",
    "dedup_containment_indexed": """, sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY 1)
  SELECT id1, id2, s1.n AS n1, s2.n AS n2,
    (1000 * inter) // least(s1.n, s2.n) AS c_milli
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = pairs.id1
  JOIN sizes s2 ON s2.doc_id = pairs.id2
  WHERE (1000 * inter) // least(s1.n, s2.n) >= 800
  ORDER BY id1, id2""",
}

MINHASH_QUERIES = set(MINHASH_FINAL)
POSTING_QUERIES = set(POSTING_FINAL)


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
    sql = (f"WITH sigs AS (SELECT * FROM '{scratch}/sigs.parquet'),\n"
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


def posting_result(con, scratch, name):
    sql = (f"WITH {SHINGLES},\n"
           f"  pairs AS (SELECT id1, id2, CAST(sum(inter) AS BIGINT) AS inter"
           f" FROM '{scratch}/jp_*.parquet' GROUP BY 1, 2)\n"
           f"{POSTING_FINAL[name]}")
    return con.execute(sql).fetchdf()


def scratch_manifest(sf_dir):
    """Identity of the partials in a scratch dir: shard count + corpus
    file size/mtime. ADVICE r12: resumable scratch keyed by neither
    SHARDS nor the corpus silently mixes shard layouts (overlapping
    j-ranges → >64-element signatures) or serves a regenerated corpus
    stale partials — refuse instead."""
    doc = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc)
    return f"shards={SHARDS} corpus={st.st_size}:{int(st.st_mtime)}"


def sharded_oracle(sf_dir, scratch_root, name):
    # Scratch is keyed by FAMILY and kept between runs: the two minhash
    # gates share identical partials (and so do the two posting gates),
    # and a failed/tuned final pass must not recompute 20+ minutes of
    # shards. A manifest (shard count + corpus fingerprint) guards the
    # reuse: on mismatch the stale scratch is DELETED and rebuilt.
    fam = "minhash" if name in MINHASH_QUERIES else "posting"
    scratch = os.path.join(scratch_root, f".shard_{fam}")
    manifest = scratch_manifest(sf_dir)
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
    con = connect(sf_dir, os.path.join(scratch, "duck_tmp"))
    try:
        if name in MINHASH_QUERIES:
            shard_minhash(con, scratch)  # per-artifact skip inside
            return minhash_result(con, scratch, name)
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
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
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
    spark_df = engine_frame(sf_dir, out_dir, name)
    if spark_df is None:
        sys.exit(1)
    oracle_df = sharded_oracle(sf_dir, out_dir, name)
    sys.exit(compare_frames(name, spark_df, oracle_df))


if __name__ == "__main__":
    main()
