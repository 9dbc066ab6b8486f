#!/usr/bin/env python3
"""Merge two bench_detail.json files into a best-of-windows baseline.

The committed bench_detail.json is the noise defense's threshold source
(Bench.committedMins / committedShuffleMb / ...): per-query `min` must be
the best timing any window has ever produced on the CURRENT code, while
the byte-shape fields (stages/tasks/sh_*_mb/input_mb/spill_mb) must
describe the CURRENT code's plan. A driver window that ran on a noisy
host must therefore never replace a better committed min (the r14
post-commit run did exactly that — VERDICT r14 "What's wrong #1").

Merge rule, per query key:
  - timing (`min`, `med`): taken as a PAIR from whichever input window
    has the lower `min` (keeping min/med from the same window preserves
    their internal consistency);
  - shape (everything else): taken from --new (the latest run of the
    current code — bytes are deterministic, timings are not).
Top-level fields (`index_build_s`, `index_trace`, `runs`, `sf`) come
from --new; `index_build_s` also takes the elementwise best-of min.
Queries present in only one input are passed through unchanged. NOTE
this is broader than the in-engine merge: Bench.scala carries an
old-only entry through only when the gate is still in
SparkEntry.queries (it errored that window), and drops retired gates;
this offline tool cannot consult the census, so after repairing a file
across a census change, hand-delete any retired gates' rows.

Usage:
  python3 tools/merge_bench_detail.py --old <committed> --new <latest> \
      [--out bench_detail.json]

Refuses to merge across scale factors.
"""
import argparse
import json
import sys

TIMING = ("min", "med")


def merge_query(name, old, new):
    """Best-of-windows for one query entry: timing pair from the faster
    window, shape from the new run. Tie-break matches Bench.scala's
    in-engine merge exactly (old kept only when STRICTLY better, so an
    exact tie takes the fresh pair). A side missing EITHER timing key
    (a hand-edited or partially-written file — the situation this
    repair tool exists for) can't compete on timing: take the other
    side's entry unchanged rather than raising KeyError mid-merge or
    stitching a mixed-window (old-min, new-med) pair, which would
    break the pair-consistency rule above (and the in-engine merge
    likewise drops a query from priorTiming when 'med' is absent)."""
    if not all(k in old for k in TIMING):
        print(f"warning: {name}: old entry lacks min/med, keeping new",
              file=sys.stderr)
        return dict(new)
    if not all(k in new for k in TIMING):
        print(f"warning: {name}: new entry lacks min/med, keeping old",
              file=sys.stderr)
        return dict(old)
    best_t = old if old["min"] < new["min"] else new
    out = dict(new)
    for k in TIMING:
        if k in best_t:
            out[k] = best_t[k]
    return out


def merge(old, new):
    if old.get("sf") != new.get("sf"):
        raise SystemExit(
            f"refusing cross-SF merge: old sf={old.get('sf')!r} new sf={new.get('sf')!r}")
    out = dict(new)
    qs = {}
    for name in sorted(set(old["queries"]) | set(new["queries"])):
        o, n = old["queries"].get(name), new["queries"].get(name)
        qs[name] = merge_query(name, o, n) if o and n else (o or n)
    out["queries"] = qs
    ob, nb = old.get("index_build_s"), new.get("index_build_s")
    if isinstance(ob, dict) and isinstance(nb, dict):
        out["index_build_s"] = {
            k: min(v for v in (ob.get(k), nb.get(k)) if v is not None)
            for k in set(ob) | set(nb)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="committed baseline detail file")
    ap.add_argument("--new", required=True, help="latest-run detail file")
    ap.add_argument("--out", default="bench_detail.json")
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    merged = merge(old, new)
    def competes(e):
        return all(k in e for k in TIMING)
    better_old = sum(
        1 for q in merged["queries"]
        if q in old["queries"] and q in new["queries"]
        and competes(old["queries"][q]) and competes(new["queries"][q])
        and old["queries"][q]["min"] < new["queries"][q]["min"])
    with open(args.out, "w") as f:
        json.dump(merged, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(merged['queries'])} queries -> {args.out} "
          f"(old window kept the better min on {better_old})", file=sys.stderr)


if __name__ == "__main__":
    main()
