#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. sf0.1 vs sf1) and print per-query
scaling ratios, worst offenders first. Usage:

    python3 scripts/scalecmp.py <bench_small.json> <bench_big.json> [factor]

`factor` (default 10) is the data-size ratio between the runs; queries whose
time ratio exceeds it are super-linear and get flagged.
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs, qb = small["queries"], big["queries"]
rows = []
for k in sorted(qs):
    if k not in qb:
        continue
    a, b = qs[k], qb[k]
    rows.append((b / max(a, 1e-9), a, b, k))

rows.sort(reverse=True)
flagged = 0
print(f"{'ratio':>7} {'small':>8} {'big':>8}  query")
for r, a, b, k in rows:
    mark = " <-- SUPER-LINEAR" if r > factor and b > 2.0 else ""
    if mark:
        flagged += 1
    print(f"{r:7.2f} {a:8.2f} {b:8.2f}  {k}{mark}")
# totals over the INTERSECTION of query keys on both sides — summing all
# small-run queries against a subset big run would bias the ratio low
ts = sum(qs[k] for k in qs if k in qb)
tb = sum(qb[k] for k in qs if k in qb)
print(f"\ntotals: small={ts:.1f}s big={tb:.1f}s ratio={tb/ts:.2f} "
      f"(data factor {factor:g}); {flagged} flagged")
