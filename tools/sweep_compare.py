#!/usr/bin/env python3
"""Compare two Bench per-query JSON dumps (sf0.1 vs the 10x corpus) and
print the multiplier table for SURVEY §8 sweeps.

Usage: python3 tools/sweep_compare.py /tmp/bench_sf01.json /tmp/bench_10x.json
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items()}


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(base) & set(big))
    missing = sorted(set(base) ^ set(big))
    if missing:
        print(f"WARN: {len(missing)} queries not in both runs: {missing[:8]}")
    rows = [(k, base[k], big[k], big[k] / base[k] if base[k] > 0 else float("inf"))
            for k in common]
    tb, tg = sum(base[k] for k in common), sum(big[k] for k in common)
    print(f"n={len(common)}  total {tb:.1f}s -> {tg:.1f}s  aggregate x{tg/tb:.2f}")
    rows.sort(key=lambda r: -r[3])
    print("\nworst multipliers (10x corpus time / sf0.1 time):")
    for k, b, g, m in rows[:25]:
        print(f"  {m:6.2f}x  {b:7.2f}s -> {g:7.2f}s  {k}")
    over3 = [r for r in rows if r[3] > 3.0]
    print(f"\n>3x members: {len(over3)}")
    print("\nslowest absolute at 10x:")
    for k, b, g, m in sorted(rows, key=lambda r: -r[2])[:15]:
        print(f"  {g:7.2f}s ({m:5.2f}x) {k}")


if __name__ == "__main__":
    main()
