#!/usr/bin/env python3
"""Compute sf0.1->sf1 scale exponents from two bench passes per leg
(min-of-two, the BENCH_SCALE protocol) and compare against a reference
exponent map. Usage:
  exponents.py <sf01_p1.json> <sf01_p2.json> <sf1_p1.json> <sf1_p2.json> [ref.json]
ref.json: {"query": exponent} map (e.g. the r9 saturated-box numbers).
Prints a markdown table sorted by exponent desc.
"""
import sys, json, math

def qmap(path):
    with open(path) as f:
        return json.load(f)["queries"]

a1, a2, b1, b2 = (qmap(p) for p in sys.argv[1:5])
ref = {}
if len(sys.argv) > 5:
    with open(sys.argv[5]) as f:
        ref = json.load(f)

rows = []
for q in a1:
    t0 = min(a1[q], a2.get(q, a1[q]))
    t1 = min(b1.get(q, 1e9), b2.get(q, 1e9))
    if t1 >= 1e9:
        continue
    ratio = t1 / t0
    exp = math.log10(ratio)
    rows.append((q, t0, t1, ratio, exp, ref.get(q)))

rows.sort(key=lambda r: -r[4])
print("| query | sf0.1 s | sf1 s | ratio | exponent | r9 local[16] exp | delta |")
print("|---|---|---|---|---|---|---|")
tot0 = tot1 = 0.0
for q, t0, t1, ratio, exp, r in rows:
    tot0 += t0; tot1 += t1
    rs = f"{r:.2f}" if r is not None else "-"
    ds = f"{exp - r:+.2f}" if r is not None else "-"
    print(f"| {q} | {t0:.2f} | {t1:.2f} | {ratio:.2f} | {exp:.2f} | {rs} | {ds} |")
tr = tot1 / tot0
print(f"| TOTAL | {tot0:.2f} | {tot1:.2f} | {tr:.2f} | {math.log10(tr):.2f} | 0.60 | {math.log10(tr)-0.60:+.2f} |")
