#!/usr/bin/env python3
"""Three-point scale exponents (VERDICT r10 #5): sf0.1 -> sf1 -> sf3,
min-of-two passes per leg (the BENCH_SCALE protocol). A 2-point fit can
hide curvature; the sf1->sf3 exponent exposes it — any query whose
sf1->sf3 exponent exceeds its sf0.1->sf1 exponent by >0.15 needs a named
cause in SCALING.md.

Usage:
  exponents3.py <sf01_p1> <sf01_p2> <sf1_p1> <sf1_p2> <sf3_p1> <sf3_p2>
(each a bench full-map JSON with a "queries" object)
Prints a markdown table sorted by sf0.1->sf1 exponent desc.
"""
import sys, json, math

def qmap(path):
    with open(path) as f:
        return json.load(f)["queries"]

a1, a2, b1, b2, c1, c2 = (qmap(p) for p in sys.argv[1:7])

rows = []
for q in sorted(a1):
    if q not in b1 or q not in c1:
        continue
    t0 = min(a1[q], a2.get(q, a1[q]))
    t1 = min(b1[q], b2.get(q, b1[q]))
    t3 = min(c1[q], c2.get(q, c1[q]))
    e01 = math.log10(t1 / t0)              # 10x step
    e13 = math.log(t3 / t1) / math.log(3)  # 3x step
    rows.append((q, t0, t1, t3, e01, e13, e13 - e01))

rows.sort(key=lambda r: -r[4])
print("| query | sf0.1 s | sf1 s | sf3 s | exp 0.1->1 | exp 1->3 | delta |")
print("|---|---|---|---|---|---|---|")
tot = [0.0, 0.0, 0.0]
for q, t0, t1, t3, e01, e13, d in rows:
    flag = " **(curved)**" if d > 0.15 else ""
    print(f"| {q} | {t0:.2f} | {t1:.2f} | {t3:.2f} | {e01:.2f} | {e13:.2f} | "
          f"{d:+.2f}{flag} |")
    tot[0] += t0; tot[1] += t1; tot[2] += t3
e01 = math.log10(tot[1] / tot[0]); e13 = math.log(tot[2] / tot[1]) / math.log(3)
print(f"| TOTAL | {tot[0]:.2f} | {tot[1]:.2f} | {tot[2]:.2f} | {e01:.2f} | "
      f"{e13:.2f} | {e13 - e01:+.2f} |")
