#!/usr/bin/env python3
"""Scale-ratio audit: compare two bench artifacts (e.g. sf1 vs sf10 —
10x the data) and flag queries whose runtime grew superlinearly.
Usage: python3 scripts/ratio_audit.py BENCH_sf1.json BENCH_sf10.json [flag_ratio]
A ratio <= the data growth factor is at-worst-linear; the default flag
threshold (8.0 for a 10x step) leaves headroom for constant factors
while catching quadratic terms (which would show ~100x)."""
import json, statistics, sys

lo = json.load(open(sys.argv[1]))["queries"]
hi = json.load(open(sys.argv[2]))["queries"]
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0

common = sorted(set(lo) & set(hi))
rows = []
for q in common:
    a, b = lo[q], hi[q]
    ratio = b / a if a > 0.05 else float("nan")  # sub-50ms lo rows are noise
    rows.append((ratio, q, a, b))

rows.sort(key=lambda r: -(r[0] if r[0] == r[0] else 0))
print(f"{len(common)} common queries; top ratios (hi_s/lo_s):")
for ratio, q, a, b in rows[:25]:
    mark = " <-- FLAG" if ratio == ratio and ratio > flag and b > 2.0 else ""
    print(f"{q:32s} {a:8.2f} -> {b:8.2f}  x{ratio:6.2f}{mark}")
vals = sorted(r[0] for r in rows if r[0] == r[0])
if vals:
    # true median (mean of the middle two for even n), and say how many
    # rows were excluded as sub-50ms noise so the summary denominator
    # is explicit (r10 ADVICE: upper-middle element + implicit skips)
    med = statistics.median(vals)
    skipped = len(rows) - len(vals)
    print(f"\nmedian ratio {med:.2f} over {len(vals)} rated rows "
          f"({skipped} skipped as sub-50ms noise), max {vals[-1]:.2f}, "
          f"flagged {sum(1 for r in rows if r[0] == r[0] and r[0] > flag and r[3] > 2.0)}")
print("only_lo:", sorted(set(lo) - set(hi))[:10])
print("only_hi:", sorted(set(hi) - set(lo))[:10])
