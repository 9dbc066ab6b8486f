#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare rows/schema/
values (columns sorted by name, like the driver's hash compare).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1; continue
        sd, od = [str(t) for t in s.dtypes], [str(t) for t in o.dtypes]
        if sd != od:
            print(f"FAIL {name}: dtypes {list(zip(s.columns, sd, od))}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        mismatch = None
        for c in s.columns:
            sv, ov = list(s[c]), list(o[c])
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a != b:
                        mismatch = (c, i, a, b); break
                elif str(a) != str(b):
                    mismatch = (c, i, a, b); break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} oracled")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
