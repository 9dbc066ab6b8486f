#!/usr/bin/env python3
"""PySpark parity smoke: drive SparkEntry queries from PYTHON via py4j —
the surface a PySpark user actually touches (the reference's second
binding is Python, kmr4py; Spark subsumes it, and this demonstrates it
rather than claiming it).

Each selected query is invoked through graft.SparkEntry.queries (the
same Scala entry points the driver gate runs), collected in Python, and
asserted row-identical against the DuckDB oracle for that query — a
real correctness check of the Python-driven path, not a smoke-print.

Usage:
  /opt/spark/bin/spark-submit --master 'local[8]' \
    --driver-class-path target/scala-2.13/classes \
    tools/pysmoke.py [sfDir] [--quick]

Default sweeps EVERY oracled query in the census (round-9 verdict item
8); --quick restricts to one query per major family, including a KVS
verb chain (kvs_reduce = create/add/shuffle/reduce, SURVEY §2.1).
"""
import math
import sys

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql.dataframe import DataFrame

QUICK_QUERIES = [
    "q1_pricing",      # TPC-H relational surface
    "kvs_reduce",      # KVS verb chain (create/add/shuffle/reduce)
    "wordcount",       # the canonical KMR map/reduce example
    "dedup_exact",     # LLM dedup family
    "events_window",   # event-time windowed aggregate
    "dedup_indexed",   # persisted-index serve path (builds or reads the
                       # bucketed band index from Python — the 100 TB shape)
    "q2_mincost",      # round-9 TPC-H addition (window-min decorrelation)
]

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            # DuckDB's fetchdf() surfaces SQL NULL as pandas NaN/NaT in
            # numeric columns while Spark collect() gives None — treat
            # any null-ish pair as equal, any null/non-null pair as not
            def _null(v):
                return v is None or (isinstance(v, float) and math.isnan(v))
            if _null(va) or _null(vb):
                if _null(va) and _null(vb):
                    continue
                return False
            if isinstance(va, float) or isinstance(vb, float):
                fa, fb = float(va), float(vb)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif str(va) != str(vb):
                return False
    return True


def main(sf_dir, quick):
    spark = (SparkSession.builder
             .appName("graft-pysmoke")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    entry = jvm.graft.SparkEntry
    queries = entry.queries()
    oracles = entry.oracleSql()
    names = QUICK_QUERIES if quick else list(entry.oracleNames())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        fn = queries.apply(name)
        jdf = fn.apply(spark._jsparkSession, sf_dir)
        df = DataFrame(jdf, spark)
        cols = sorted(df.columns)
        got = [tuple(r[c] for c in cols) for r in df.collect()]
        got.sort(key=lambda r: tuple(str(v) for v in r))
        odf = con.execute(oracles.apply(name)).fetchdf()
        odf = odf[sorted(odf.columns)]
        want = [tuple(row) for row in odf.itertuples(index=False)]
        want.sort(key=lambda r: tuple(str(v) for v in r))
        if sorted(cols) != sorted(odf.columns):
            failures.append(f"{name}: columns {cols} vs {sorted(odf.columns)}")
            print(f"FAIL {name}: column mismatch")
        elif not rows_equal(got, want):
            failures.append(f"{name}: {len(got)} rows vs {len(want)} oracle rows")
            print(f"FAIL {name}")
        else:
            print(f"PASS {name} ({len(got)} rows, python-driven)")
    spark.stop()
    if failures:
        print("\n".join(failures))
        sys.exit(1)
    print(f"pysmoke: {len(names)}/{len(names)} python-driven queries "
          "row-identical to the DuckDB oracle")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--quick"]
    main(args[0] if args else "/root/testdata/sf0.001",
         quick="--quick" in sys.argv)
