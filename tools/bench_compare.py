#!/usr/bin/env python3
"""Compare two BENCH_QUERIES.json files: per-query min_ms ratios.

Usage: bench_compare.py OLD NEW [topN]
Prints summary stats (sum, median ratio) over common queries and the
largest drifts both ways — the round-history adjudication view.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v["min_ms"] for k, v in d["queries"].items()
            if v["min_ms"] >= 0}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    common = sorted(set(old) & set(new))
    ratios = {k: (new[k] / old[k] if old[k] > 0 else float("inf"))
              for k in common}
    print(f"common queries: {len(common)}")
    print(f"old sum {sum(old[k] for k in common)/1000:.1f}s  "
          f"new sum {sum(new[k] for k in common)/1000:.1f}s")
    print(f"median ratio {statistics.median(ratios.values()):.3f}")
    print("\nbiggest slowdowns:")
    for k in sorted(common, key=lambda k: -ratios[k])[:top]:
        print(f"  {k:32s} {old[k]:>7d} -> {new[k]:>7d} ms  x{ratios[k]:.2f}")
    print("\nbiggest speedups:")
    for k in sorted(common, key=lambda k: ratios[k])[:top]:
        print(f"  {k:32s} {old[k]:>7d} -> {new[k]:>7d} ms  x{ratios[k]:.2f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew-only: {[(k, new[k]) for k in only_new]}")


if __name__ == "__main__":
    main()
