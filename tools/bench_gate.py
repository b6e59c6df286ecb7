#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a bench run's per-query times (each already a median of the run's
in-process reps) against a baseline archive and fails loudly on genuine
regressions. The archives under bench/ make deltas readable; this makes
them enforceable at round close.

A query REGRESSES when BOTH hold (the two-sided rule keeps the gate quiet
on noise):
  * it is more than RATIO x slower than baseline, and
  * the absolute slowdown exceeds ABS_FLOOR seconds
Sub-0.1 s queries jitter by whole multiples on a shared box, so a pure
ratio rule would cry wolf; a pure absolute rule would let a 0.2 s -> 3 s
query through. New/removed queries are reported informationally only.

Usage:
  python3 tools/bench_gate.py                 # newest archive vs previous
  python3 tools/bench_gate.py CUR.json        # explicit current vs newest other
  python3 tools/bench_gate.py CUR.json BASE.json
Exit 0 = no regressions, 1 = regressions listed, 2 = usage/data problem.
"""
import glob
import json
import os
import sys

RATIO = 2.0
ABS_FLOOR = 0.3  # seconds


def usage_error(msg):
    print(f"bench_gate: {msg}", file=sys.stderr)
    sys.exit(2)


def load(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        usage_error(f"cannot read {path}: {e}")
    if "queries" not in d:
        usage_error(f"{path} has no per-query map")
    return d


def main(argv):
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench")
    archives = sorted(glob.glob(os.path.join(bench_dir, "BENCH_2*.json")))

    def same_sf_baseline(cur_path):
        # comparing across scale factors produced false alarms (an sf0.1 run
        # gated against an sf0.01 archive flags every data-heavy query); the
        # default baseline is the newest OTHER archive at the SAME sf
        cur_sf = load(cur_path).get("sf")
        others = [a for a in archives
                  if os.path.abspath(a) != os.path.abspath(cur_path)
                  and load(a).get("sf") == cur_sf]
        if not others:
            usage_error(f"no baseline archive with sf={cur_sf} under bench/")
        return others[-1]

    if len(argv) >= 3:
        cur_path, base_path = argv[1], argv[2]
    elif len(argv) == 2:
        cur_path = argv[1]
        base_path = same_sf_baseline(argv[1])
    else:
        if len(archives) < 2:
            usage_error("need two archives under bench/ to compare")
        cur_path = archives[-1]
        base_path = same_sf_baseline(cur_path)

    cur, base = load(cur_path), load(base_path)
    cq, bq = cur["queries"], base["queries"]
    shared = sorted(set(cq) & set(bq))
    added = sorted(set(cq) - set(bq))
    removed = sorted(set(bq) - set(cq))

    regressions = []
    for q in shared:
        c, b = float(cq[q]), float(bq[q])
        # b == 0 would pass the ratio test vacuously; treat any recorded 0 as
        # the floor so the ratio in the report stays finite
        b = max(b, 1e-9)
        if c > b * RATIO and c - b > ABS_FLOOR:
            regressions.append((q, b, c))

    print(f"bench_gate: {os.path.basename(cur_path)} "
          f"vs {os.path.basename(base_path)} "
          f"({len(shared)} shared, {len(added)} new, {len(removed)} removed)")
    print(f"  totals: {base.get('value', '?')} -> {cur.get('value', '?')} s")
    if added:
        print(f"  new queries (not gated): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if regressions:
        print(f"  REGRESSIONS (> {RATIO}x and > {ABS_FLOOR}s):")
        for q, b, c in sorted(regressions, key=lambda r: r[1] - r[2]):
            print(f"    {q}: {b:.3f} -> {c:.3f} s ({c / b:.1f}x)")
        return 1
    print("  no per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
