#!/usr/bin/env python3
"""Mechanical bench-regression check between two graft.Bench JSON lines.

Usage: python3 scripts/bench_regress.py <baseline.json> <current.json>
       python3 scripts/bench_regress.py <baseline.json> <current.json> --ratio 1.5 --slack 0.5

Each file holds (at least) one graft.Bench output line
(`{"metric":"total", ..., "queries": {name: seconds, ...}}`); the last
such line is used. A query REGRESSES when current > baseline * ratio +
slack — the same rule BASELINE.md's per-query table prescribes for
judging rounds (absorbs ambient drift and fixed startup cost; flags
real plan regressions). New queries (absent from baseline) and removed
ones are listed informationally, never as failures. Exit 1 iff any
query regresses.
"""
import json
import statistics
import sys


def load(path):
    line = None
    with open(path) as f:
        for l in f:
            if '"metric"' in l and '"queries"' in l:
                line = l
    if line is None:
        sys.exit(f"no bench JSON line found in {path}")
    return json.loads(line)["queries"]


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    ratio = 1.5
    slack = 0.5
    for i, a in enumerate(argv):
        if a == "--ratio":
            ratio = float(argv[i + 1])
        if a == "--slack":
            slack = float(argv[i + 1])
    base, cur = load(args[0]), load(args[1])
    regressions = []
    for q, t in sorted(cur.items()):
        if q in base and t > base[q] * ratio + slack:
            regressions.append((q, base[q], t))
    shared = [q for q in base if q in cur and base[q] > 0.2]
    drift = statistics.median(cur[q] / base[q] for q in shared) if shared else 1.0
    print(f"queries: baseline {len(base)}, current {len(cur)}, "
          f"shared {len(shared)}; median drift {drift:.3f}x")
    new = sorted(set(cur) - set(base))
    gone = sorted(set(base) - set(cur))
    if new:
        print(f"new (not judged): {', '.join(new)}")
    if gone:
        print(f"removed from surface: {', '.join(gone)}")
    if regressions:
        print(f"\nREGRESSIONS (current > {ratio}x baseline + {slack}s):")
        for q, b, t in sorted(regressions, key=lambda r: -(r[2] - r[1])):
            print(f"  {q}: {b:.2f}s -> {t:.2f}s")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
