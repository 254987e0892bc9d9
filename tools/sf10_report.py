#!/usr/bin/env python3
"""Summarize the full-suite sf10 endurance run (round-12 verdict #1).

Joins scaling_sf10_full.jsonl (one reading per declared query at sf10)
against the sf0.1 close-bench ledger to compute per-query decade ratios,
and flags: errors (sec < 0), absolute heavyweights, and ratio outliers.
A ratio of ~100x over the decade with overhead-dominated sf0.1 readings
is NOT linearity evidence by itself — the flags are triage pointers into
SCALING.md's per-query adjudication, not verdicts.

Usage: python3 tools/sf10_report.py [sweep.jsonl [overlay.jsonl ...]]

With no args, reads the raw sweep (scaling_sf10_full.jsonl) and then
overlays the post-fix re-runs (scaling_sf10_fixes.jsonl) — later files
win per query, so the default report shows the adjudicated state while
both artifacts stay untouched on disk.
"""
import json
import os
import sys

paths = sys.argv[1:] or [
    "scaling_sf10_full.jsonl", "scaling_sf10_fixes.jsonl"]
rows = {}
for path in paths:
    if not os.path.exists(path):
        continue
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "query" in r and "sec" in r:
            rows[r["query"]] = r["sec"]

close = json.load(open("bench_close_r11.json"))
base = close.get("queries", close)

errs = sorted(q for q, s in rows.items() if s < 0)
print(f"queries measured: {len(rows)}   errors: {len(errs)}")
for q in errs:
    print(f"  ERR {q}")

print("\ntop 20 by absolute sf10 wall:")
for q, s in sorted(rows.items(), key=lambda kv: -kv[1])[:20]:
    b = base.get(q)
    ratio = f"{s / b:7.1f}x" if b and b > 0 else "      ?"
    print(f"  {s:8.1f}s {ratio}  {q}")

print("\ntop 20 by sf0.1->sf10 ratio (sf0.1 >= 0.3s only, to dodge "
      "overhead-dominated denominators):")
flag = [(q, s, base[q]) for q, s in rows.items()
        if q in base and base[q] >= 0.3 and s > 0]
for q, s, b in sorted(flag, key=lambda t: -(t[1] / t[2]))[:20]:
    print(f"  {s / b:7.1f}x  {s:8.1f}s (sf0.1 {b:.2f}s)  {q}")

tot = sum(s for s in rows.values() if s > 0)
print(f"\ntotal sf10 wall (single pass): {tot:.0f}s = {tot / 60:.1f}min")
