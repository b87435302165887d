#!/usr/bin/env python3
"""Cross-record bench comparison: per-query ratios between two bench
JSONs (e.g. sf2/sf1 scaling, or round-over-round at one SF), with the
calibration kernel printed alongside so box drift is visible next to
any ratio it contaminates.

Usage: python3 tools/bench_compare.py <a.json> <b.json> [topN]
Prints: calibration a/b, aggregate ratio, median per-query ratio, and
the topN worst ratios (b/a) over shared queries.
"""
import json, sys, statistics

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
only_a, only_b = set(qa) - set(qb), set(qb) - set(qa)
ratios = {q: (qb[q] / qa[q] if qa[q] > 0 else float("inf")) for q in shared}

print(f"a: {sys.argv[1]} sf={a.get('sf')} total={a.get('value')} "
      f"calib={a.get('calibration_sec')} n={len(qa)}")
print(f"b: {sys.argv[2]} sf={b.get('sf')} total={b.get('value')} "
      f"calib={b.get('calibration_sec')} n={len(qb)}")
if only_a: print(f"only in a: {sorted(only_a)}")
if only_b: print(f"only in b: {sorted(only_b)}")
ta = sum(qa[q] for q in shared); tb = sum(qb[q] for q in shared)
print(f"shared {len(shared)}: aggregate b/a = {tb/ta:.2f}x "
      f"(sum {ta:.1f} -> {tb:.1f}s), median per-query "
      f"{statistics.median(ratios.values()):.2f}x")
if a.get("calibration_sec") and b.get("calibration_sec"):
    print(f"calibration b/a = {b['calibration_sec']/a['calibration_sec']:.2f}x")
print(f"suspect a={a.get('suspect')} b={b.get('suspect')}")
print(f"\nworst {top_n} ratios (b/a), with absolute times:")
for q in sorted(ratios, key=ratios.get, reverse=True)[:top_n]:
    print(f"  {q:32s} {qa[q]:7.2f}s -> {qb[q]:7.2f}s  {ratios[q]:5.2f}x")
