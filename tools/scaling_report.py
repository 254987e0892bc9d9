#!/usr/bin/env python3
"""Render the SCALING.md exponent table from graft.Scaling's jsonl output.

Usage: python3 tools/scaling_report.py scaling_full.jsonl

Method notes (mirrors Scaling.scala's scaladoc): per query, fixed
overhead is estimated as min(t) across SFs (Spark session/planning/JIT
dominates the small-SF readings); the growth exponent over the 10×
sf0.01 → sf0.1 span is fit on overhead-corrected times. When the sf0.01
data cost sits below the noise floor, the exponent is unresolvable from
wall time alone and the row is marked `≤floor` — for those queries
linearity is argued (and where possible measured) at the candidate-volume
level in SCALING.md instead.
"""
import json
import math
import sys

FLOOR = 0.15  # sec: below this, data cost is indistinguishable from noise


def main():
    rows = [json.loads(l) for l in open(sys.argv[1])]
    out = []
    for r in rows:
        t = r["t"]
        ovh = min(t)
        d1, d2 = t[1] - ovh, t[2] - ovh
        if d2 < FLOOR:
            verdict, exp = "flat (overhead-dominated)", None
        elif d1 < FLOOR:
            # sf0.01 data cost unresolvable: only an upper bound exists
            bound = math.log10(d2 / FLOOR)
            verdict, exp = f"unresolved (exp ≤ {bound:.1f} by floor)", None
        else:
            e = math.log10(d2 / d1)
            verdict, exp = ("SUPER-LINEAR" if e > 1.3 else
                            "~linear" if e > 0.5 else "sub-linear"), e
        out.append((r["query"], t, exp, verdict))
    out.sort(key=lambda x: -(x[2] if x[2] is not None else -1))
    print(f"| query | t(sf0.001) | t(sf0.01) | t(sf0.1) | exp | verdict |")
    print("|---|---|---|---|---|---|")
    for q, t, e, v in out:
        es = f"{e:.2f}" if e is not None else "—"
        print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | {es} | {v} |")


if __name__ == "__main__":
    main()
