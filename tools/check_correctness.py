#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare rows/schema/
values (columns sorted by name, like the driver's hash compare).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [capSec]

Hardened after round 10 zeroed the driver's artifact (the compare ran
concurrently with the bench, DuckDB sized its memory limit off a host
whose RAM the bench JVM held, spilled ~44 GB of temp and died, leaving
`{}`):

- every query's compare runs in its OWN subprocess under a wall-clock
  cap (default 300 s) — one pathological oracle can no longer take the
  whole census down;
- each subprocess runs DuckDB with an explicit memory_limit (4 GB,
  GRAFT_ORACLE_MEM overrides), bounded temp_directory (8 GB quota via
  GRAFT_ORACLE_TMP, inside the verify dir, cleaned up afterwards),
  threads=4 and preserve_insertion_order=false (row order is pinned by
  each oracle's top-level ORDER BY; streaming the intermediates keeps
  the big index replays inside the quota) — co-tenant JVMs can no
  longer starve it into unbounded spill;
- oracle RESOURCE EXHAUSTION (DuckDB OOM / temp-quota / ENOSPC) is
  classified as oracle cost — the ORACLE_TIMEOUT tally, exit 2 — not
  an engine FAIL: the Spark output exists and is merely untested;
- results append to <verifyOutDir>/correctness_partial.jsonl AS THEY
  LAND, so a dying process leaves a partial per-query record, never an
  empty file;
- a cross-tool mutex (.graft_gate.lock next to this script's repo
  root) serializes the compare against a concurrently-launched
  graft.Bench (which honors the same lock) — the round-10 collision;
- exit code: 0 all pass, 1 any FAIL, 2 no FAIL but oracle timeouts
  (an oracle-COST statement, not an engine mismatch — callers must
  explicitly accept it).
"""
import json, math, os, subprocess, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

MEM_LIMIT = os.environ.get("GRAFT_ORACLE_MEM", "4GB")
TMP_QUOTA = os.environ.get("GRAFT_ORACLE_TMP", "8GB")
LOCK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".graft_gate.lock")


def compare_one(sf_dir, out_dir, name):
    """Compare ONE query inside this process (invoked as a capped
    subprocess by main). Prints PASS/FAIL line; exit 0/1."""
    import duckdb, glob
    # Eager pandas/numpy import: fetchdf() would otherwise import them
    # LAZILY — after the oracle ran, while DuckDB holds its working set
    # near memory_limit — and numpy's BLAS .so can then fail to mmap on
    # a host whose commit limit is already saturated ("failed to map
    # segment from shared object", observed at sf1). Map it while
    # memory is free.
    import pandas as _pandas  # noqa: F401
    con = duckdb.connect()
    tmp = os.path.join(out_dir, f".duckdb_tmp_{name}")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    con.execute("SET threads=4")
    # Row order is pinned by each oracle's top-level ORDER BY; dropping
    # insertion-order preservation lets DuckDB stream/parallelize the
    # big intermediate joins (the sf10 inverted-index replays otherwise
    # buffer the whole pair stream and blow the temp quota).
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET max_temp_directory_size='{TMP_QUOTA}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); return 1
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); return 1
    try:
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        # Resource exhaustion while computing the ORACLE is a cost
        # statement about DuckDB on this host, not an engine mismatch —
        # the same class as a timeout (the Spark output exists and is
        # untested). Distinct line + exit so main() tallies it with the
        # timeouts instead of the failures.
        msg = str(e)
        if ("Out of Memory" in msg or "No space left" in msg
                or "max_temp_directory_size" in msg):
            print(f"ORACLE_COST {name}: {msg.splitlines()[0][:200]}")
            return 3
        print(f"FAIL {name}: oracle error: {e}"); return 1
    return compare_frames(name, spark_df, oracle_df)


def compare_frames(name, spark_df, oracle_df):
    """Value-compare two dataframes the driver's way (columns sorted by
    name, exact values). Shared with tools/oracle_sharded.py so the
    sharded sf10 replays judge with the identical rule."""
    s = spark_df[sorted(spark_df.columns)]
    o = oracle_df[sorted(oracle_df.columns)]
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
        return 1
    sd, od = [str(t) for t in s.dtypes], [str(t) for t in o.dtypes]
    if sd != od:
        print(f"FAIL {name}: dtypes {list(zip(s.columns, sd, od))}")
        return 1
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); return 1
    # POSITIONAL compare first (ADVICE r13): every engine query ends in
    # .orderBy() and every oracle carries a top-level ORDER BY, so row
    # order IS part of the contract and an engine that drops a sort must
    # not pass silently. Only when the positional compare fails do we
    # fall back to a row-sorted compare — DuckDB under
    # preserve_insertion_order=false + threads>1 does not reliably honor
    # its own ORDER BY at ~10M rows (the ROUND13 runbook's measured
    # drop: sessionize_batch / window_analytics emitted identical row
    # sets differently ordered) — and a pass via the fallback is
    # reported distinctly as order-insensitive so it stays visible.
    first = _mismatch(s, o)
    if first is None:
        print(f"PASS {name} ({len(s)} rows)")
        return 0
    import numpy as np

    def _order(df):
        # Sort keys: NUMERIC columns sort numerically (ADVICE r13: a
        # string sort misaligns values that are == but stringify
        # differently, e.g. -0.0 vs 0.0); everything else by str.
        keys = []
        for c in reversed(list(df.columns)):
            v = df[c]
            keys.append(v.values if v.dtype.kind in "fiu"
                        else v.astype(str).values)
        return np.lexsort(keys)
    s2 = s.iloc[_order(s)].reset_index(drop=True)
    o2 = o.iloc[_order(o)].reset_index(drop=True)
    second = _mismatch(s2, o2)
    if second is None:
        # identical row SETS, divergent order: almost always the DuckDB
        # ORDER BY instability — passes, but says so
        c, i, a, b = first
        print(f"PASS {name} ({len(s)} rows, order-insensitive: positional "
              f"first-diff col={c} row={i} spark={a!r} oracle={b!r})")
        return 0
    c, i, a, b = second
    print(f"FAIL {name}: value mismatch col={c} row={i}: "
          f"spark={a!r} oracle={b!r}")
    return 1


def _mismatch(s, o):
    """First differing cell between two same-shape frames, or None.
    Exact compare: floats by ==, NaN==NaN, everything else by str."""
    for c in s.columns:
        for i, (a, b) in enumerate(zip(list(s[c]), list(o[c]))):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return (c, i, a, b)
            elif str(a) != str(b):
                return (c, i, a, b)
    return None


def acquire_lock():
    """Best-effort cross-tool mutex vs graft.Bench: wait (bounded) for a
    live holder, steal stale locks (>30 min old). Never blocks forever —
    a partial-contention compare beats an empty artifact."""
    deadline = time.time() + 15 * 60
    while time.time() < deadline:
        try:
            fd = os.open(LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"check_correctness {os.getpid()}".encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(LOCK) > 30 * 60:
                    # steal via atomic rename: exactly one waiter wins the
                    # rename; a fresh lock another waiter just created
                    # can't be deleted by mistake (ADVICE r11 TOCTOU)
                    stolen = LOCK + f".steal.{os.getpid()}"
                    os.rename(LOCK, stolen)
                    # ADVICE r12 (mirror GateLock.scala): a holder that
                    # heartbeat-touched between getmtime and rename is
                    # LIVE — put its lock back instead of unlinking it.
                    if time.time() - os.path.getmtime(stolen) <= 30 * 60:
                        try:
                            os.rename(stolen, LOCK)
                        except OSError:
                            os.unlink(stolen)  # lock re-created meanwhile
                        time.sleep(5)
                        continue
                    os.unlink(stolen)
                    continue
            except OSError:
                continue
            time.sleep(5)
    print(f"WARN proceeding despite busy {LOCK}", file=sys.stderr)
    return False


def release_lock():
    try:
        os.unlink(LOCK)
    except OSError:
        pass


def main(sf_dir, out_dir, cap):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    partial = os.path.join(out_dir, "correctness_partial.jsonl")
    open(partial, "w").close()  # truncate: this run's incremental record
    n_pass = n_fail = n_to = 0
    failed, timed_out = [], []
    statuses = {}
    t_run = time.time()
    got_lock = acquire_lock()
    try:
        for name in sorted(oracles):
            status, detail = "FAIL", ""
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     sf_dir, out_dir, "--one", name],
                    capture_output=True, text=True, timeout=cap)
                lines = [l for l in r.stdout.splitlines()
                         if l.startswith(("PASS", "FAIL", "ORACLE_COST"))]
                # ADVICE r12: only RESOURCE deaths are oracle cost.
                # SIGKILL is the kernel OOM killer (the only way a
                # process dies with -9 on this host); any OTHER signal
                # (SIGSEGV/SIGABRT/SIGBUS — a duckdb/pyarrow crash,
                # possibly on a torn ENGINE parquet) must keep counting
                # as FAIL unless stderr shows resource exhaustion, or
                # the gate's failure detection silently weakens.
                resource = r.returncode == -9 or any(
                    pat in (r.stderr or "")
                    for pat in ("MemoryError", "Cannot allocate memory",
                                "No space left on device",
                                "Out of Memory", "bad_alloc"))
                if lines:
                    line = lines[0]
                elif resource:
                    # ADVICE r11: a child killed by the OOM killer or
                    # dying on resource exhaustion without printing a
                    # status line is ORACLE cost, not an engine failure —
                    # the engine parquet exists and was never compared.
                    line = (f"ORACLE_COST {name}: child rc={r.returncode} "
                            f"{(r.stderr or '')[-200:]}")
                else:
                    line = f"FAIL {name}: <no output> {r.stderr[-300:]}"
                if line.startswith("PASS"):
                    status = "PASS"; n_pass += 1
                elif line.startswith("ORACLE_COST"):
                    # oracle resource exhaustion == oracle cost, the
                    # timeout class (engine output exists, untested)
                    status = "ORACLE_TIMEOUT"
                    n_to += 1; timed_out.append(name)
                else:
                    n_fail += 1; failed.append(name)
                detail = line
            except subprocess.TimeoutExpired:
                status = "ORACLE_TIMEOUT"
                detail = f"ORACLE_TIMEOUT {name} (> {cap} s of DuckDB)"
                n_to += 1; timed_out.append(name)
            print(detail)
            sys.stdout.flush()
            if got_lock:  # liveness heartbeat: a long census is live, not stale
                try:
                    os.utime(LOCK)
                except OSError:
                    pass
            statuses[name] = detail.splitlines()[0][:200] if detail else status
            with open(partial, "a") as f:
                f.write(json.dumps({"query": name, "status": status,
                                    "detail": detail,
                                    "sec": round(time.time() - t0, 2)}) + "\n")
            # per-query scratch (ADVICE r10: don't let these accumulate)
            tmp = os.path.join(out_dir, f".duckdb_tmp_{name}")
            if os.path.isdir(tmp):
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        if got_lock:
            release_lock()
    # durable in-repo attestation (r13 verdict item 2): the /tmp census
    # logs of heavy runs did not survive for the judge — leave a tiny
    # committed record instead. GRAFT_ATTEST_KIND distinguishes e.g. a
    # local-cluster census from a plain one.
    # GRAFT_ATTEST=0 skips the record — for LOCAL iteration against a
    # SPARK_GRAFT_VERIFY_ONLY subset dump, where the missing dumps
    # would be recorded as fails and shadow the last genuine census.
    if os.environ.get("GRAFT_ATTEST", "1") != "0":
        try:
            from attest import write_attest
            write_attest(os.environ.get("GRAFT_ATTEST_KIND", "gate"),
                         sf_dir, statuses, time.time() - t_run,
                         extra={"cap_sec": cap,
                                "no_dump": sum(1 for v in statuses.values()
                                               if "no spark output" in v)})
        except Exception as e:
            print(f"WARN attest record not written: {e}", file=sys.stderr)
    print(f"\n{n_pass} pass / {n_fail} fail / {n_to} oracle-timeout "
          f"/ {len(oracles)} oracled (cap {cap} s)")
    if failed:
        print("failed:", ", ".join(failed))
    if timed_out:
        print("timed out:", ", ".join(timed_out))
    return 1 if n_fail else (2 if n_to else 0)


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        sys.exit(compare_one(sys.argv[1], sys.argv[2], sys.argv[i + 1]))
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    sys.exit(main(sys.argv[1], sys.argv[2], cap))
