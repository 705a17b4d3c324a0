#!/usr/bin/env python3
"""Markdown slope table from two graft.Bench JSON lines (1x vs Nx).

Usage: slope_table.py bench_1x.json bench_Nx.json factor

Per query: t_1x, t_Nx, slope = t_Nx / t_1x. Sorted by slope descending.
Slopes >= factor are flagged '<< LINEAR+' — cost growing as fast as the
data means scan-bound at best, a quadratic candidate at worst (compare
with the canary spread before reading too much into any single row).
"""
import json
import sys


def main() -> int:
    a, b, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    j1 = json.load(open(a))
    jn = json.load(open(b))
    q1, qn = j1["queries"], jn["queries"]
    rows = []
    for k in sorted(q1):
        if k not in qn or q1[k] <= 0 or qn[k] <= 0:
            continue
        rows.append((qn[k] / q1[k], k, q1[k], qn[k]))
    rows.sort(reverse=True)
    print(f"| query | 1x (s) | {int(factor)}x (s) | slope |")
    print("|---|---|---|---|")
    for slope, k, t1, tn in rows:
        flag = " << LINEAR+" if slope >= factor else ""
        print(f"| {k} | {t1:.3f} | {tn:.3f} | {slope:.2f}x{flag} |")
    tot1 = sum(t for _, _, t, _ in rows)
    totn = sum(t for _, _, _, t in rows)
    print(f"| **total** | {tot1:.1f} | {totn:.1f} | {totn / tot1:.2f}x |")
    for name, j in (("1x", j1), (f"{int(factor)}x", jn)):
        c = j.get("canary")
        if c:
            # r15 compacted the canary to a positional [min, max, scale]
            lo, hi = (c[0], c[1]) if isinstance(c, list) else (c["min"], c["max"])
            print(f"\ncanary {name}: {lo:.3f}-{hi:.3f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
