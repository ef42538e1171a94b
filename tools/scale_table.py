#!/usr/bin/env python3
"""Print the PLANS.md scale-ratio table from BENCH_FULL.json (sf0.1)
and BENCH_sf1.json (sf1): totals, median per-query ratio, and the
worst offenders. Dev tool only."""
import json
import statistics
import sys

full = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"))
sf1 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1.json"))
q1, q10 = full["queries"], sf1["queries"]
shared = [k for k in q1 if k in q10 and q1[k] > 0 and q10[k] > 0]
ratios = sorted(((q10[k] / q1[k], k) for k in shared), reverse=True)
print(f"sf0.1 total {full['total_sec']:.2f}s  sf1 total {sf1['total_sec']:.2f}s  "
      f"({sf1['total_sec']/full['total_sec']:.1f}x on 10x data, n={len(shared)})")
print(f"median per-query ratio: {statistics.median(r for r, _ in ratios):.2f}x; "
      f"{sum(1 for r, _ in ratios if r <= 2.0)} of {len(shared)} at <=2.0x")
print("| query | sf0.1 s | sf1 s | ratio |")
print("| --- | --- | --- | --- |")
for r, k in ratios[:8]:
    print(f"| {k} | {q1[k]:.2f} | {q10[k]:.2f} | {r:.1f}x |")
