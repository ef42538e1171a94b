#!/usr/bin/env python3
"""Scale-ratio table: per-key sf1/sf0.1 bench ratios (10x data).

Usage: python3 tools/sf_ratio.py [BENCH_FULL.json] [BENCH_sf1.json]
Prints a markdown table of the N heaviest sf1 keys plus summary
percentiles, for the PLANS.md scale-evidence section.
"""
import json
import statistics
import sys


def main() -> None:
    full = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"))
    sf1 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1.json"))
    q01, q1 = full["queries"], sf1["queries"]
    shared = sorted(set(q01) & set(q1), key=lambda k: -q1[k])
    ratios = {k: (q1[k] / q01[k] if q01[k] > 0 else float("nan")) for k in shared}
    rs = sorted(r for r in ratios.values() if r == r)
    print(f"keys={len(shared)} sf1_total={sf1['total_sec']:.1f}s "
          f"sf0.1_total={full['total_sec']:.1f}s "
          f"median_ratio={statistics.median(rs):.2f} "
          f"p90_ratio={rs[int(0.9 * len(rs))]:.2f}")
    print()
    print("| key | sf0.1 s | sf1 s | ratio (10x data) |")
    print("| --- | --- | --- | --- |")
    for k in shared[:20]:
        print(f"| {k} | {q01[k]:.2f} | {q1[k]:.2f} | {ratios[k]:.1f}x |")
    worst = sorted(shared, key=lambda k: -ratios[k])[:8]
    print()
    print("worst ratios:",
          ", ".join(f"{k}={ratios[k]:.1f}x" for k in worst))


if __name__ == "__main__":
    main()
