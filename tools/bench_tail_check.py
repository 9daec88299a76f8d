#!/usr/bin/env python3
"""Round-trip check for the driver's bench-tail parse (VERDICT r10 #3).

Simulates the harness: keep the LAST 2000 chars of a `sbt "runMain
graft.Bench ..."` stdout capture, then find the one JSON object there
(line-wise json.loads, last line first). Exits 1 if no line parses —
i.e. if BENCH_r{N}.json would ship "parsed": null again.

Usage: bench_tail_check.py <stdout-capture-file>
"""
import sys, json

tail = open(sys.argv[1]).read()[-2000:]
for line in reversed([l for l in tail.splitlines() if l.strip()]):
    try:
        d = json.loads(line)
        print(f"PARSE OK: metric={d['metric']} value={d['value']} "
              f"n_queries={d.get('n_queries')} n_failed={d.get('n_failed')}")
        sys.exit(0)
    except (json.JSONDecodeError, KeyError):
        continue
print("PARSE FAIL: no JSON line in the last 2000 chars")
sys.exit(1)
