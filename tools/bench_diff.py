#!/usr/bin/env python3
"""Diff two graft.Bench per-query maps (the regression detector).

Usage: bench_diff.py OLD.json NEW.json [threshold] [min_sec]

Reads the full JSON line each bench run writes (BENCH.json /
BENCH_ISOLATED.json, or a BENCH_HISTORY.jsonl line), compares the
per-query `queries` maps, and prints every common query whose NEW/OLD
ratio exceeds `threshold` (default 1.4) with NEW time above `min_sec`
(default 1.0) — plus the common-set totals and the added/removed query
names. Compare runs of the SAME mode only (isolated vs isolated);
in-sequence totals are host-noise-bound (BASELINE round-15 A/B:
per-query median ratio 1.03 between runs of identical code).
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "queries" in d:
                    return d
    raise SystemExit(f"no bench JSON with a 'queries' map in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    min_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    om, nm = old["queries"], new["queries"]
    if old.get("mode") != new.get("mode"):
        print(f"WARNING: mode mismatch ({old.get('mode')} vs "
              f"{new.get('mode')}) — totals not comparable")
    common = sorted(set(om) & set(nm))
    added = sorted(set(nm) - set(om))
    removed = sorted(set(om) - set(nm))
    o_tot = sum(om[q] for q in common)
    n_tot = sum(nm[q] for q in common)
    print(f"common {len(common)} queries: {o_tot:.1f} s -> {n_tot:.1f} s "
          f"({n_tot / o_tot:.2f}x)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)} = "
              f"{sum(nm[q] for q in added):.1f} s")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    movers = [(nm[q] / om[q], q) for q in common
              if nm[q] > min_sec and nm[q] / om[q] > threshold]
    if not movers:
        print(f"no mover above {threshold}x (new > {min_sec}s)")
    for r, q in sorted(movers, reverse=True):
        print(f"  {r:5.2f}x  {q}: {om[q]:.2f} -> {nm[q]:.2f} s")
    faster = sum(1 for q in common if nm[q] < om[q])
    print(f"{faster}/{len(common)} common queries faster")


if __name__ == "__main__":
    main()
