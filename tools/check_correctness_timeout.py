#!/usr/bin/env python3
"""check_correctness with a per-oracle wall-clock cap, for oracle
censuses at SFs where a handful of DuckDB oracles (the deliberately
quadratic similarity family) would take hours: each query's compare
runs in a subprocess; ones exceeding the cap are reported as
ORACLE_TIMEOUT — an oracle-COST statement, not an engine mismatch —
so the pass/fail signal for the rest of the census stays crisp.

Usage: python3 tools/check_correctness_timeout.py <sfDir> <verifyOutDir> [capSec]
"""
import json
import subprocess
import sys


def main(sf_dir, out_dir, cap):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_to = 0
    failed, timed_out = [], []
    for name in sorted(oracles):
        # reuse the canonical checker one query at a time via a
        # filtered oracle file (same compare semantics, zero drift)
        one = {name: oracles[name]}
        sub = f"{out_dir}/.one_{name}"
        import os, shutil
        os.makedirs(sub, exist_ok=True)
        json.dump(one, open(f"{sub}/oracle_sql.json", "w"))
        dst = f"{sub}/{name}"
        if not os.path.islink(dst) and not os.path.exists(dst):
            os.symlink(f"{out_dir}/{name}", dst)
        try:
            r = subprocess.run(
                [sys.executable, "tools/check_correctness.py", sf_dir, sub],
                capture_output=True, text=True, timeout=cap)
            line = [l for l in r.stdout.splitlines() if l.startswith(("PASS", "FAIL"))]
            if line and line[0].startswith("PASS"):
                n_pass += 1
                print(line[0])
            else:
                n_fail += 1
                failed.append(name)
                print(line[0] if line else f"FAIL {name}: <no output>\n{r.stdout[-500:]}")
        except subprocess.TimeoutExpired:
            n_to += 1
            timed_out.append(name)
            print(f"ORACLE_TIMEOUT {name} (> {cap} s of DuckDB)")
        sys.stdout.flush()
    print(f"\n{n_pass} pass / {n_fail} fail / {n_to} oracle-timeout "
          f"/ {len(oracles)} oracled (cap {cap} s)")
    if failed:
        print("failed:", ", ".join(failed))
    if timed_out:
        print("timed out:", ", ".join(timed_out))
    return 1 if n_fail else 0


if __name__ == "__main__":
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    sys.exit(main(sys.argv[1], sys.argv[2], cap))
