#!/usr/bin/env python3
"""Generate the machine-readable per-query baseline ledger.

Source of truth: the round-10 judge's full declared-query table in
VERDICT.md, whose `sec` and `vs baseline` columns pin every one of the
492 keys to its BASELINE.md entry (entry = sec / ratio). New queries
landed after round 10 get their entries appended directly to
baseline_queries.json at landing time (the round-9 lesson: baseline
rows ship WITH the queries); re-running this script preserves any key
already present in the output that the VERDICT table doesn't know.

Usage: python3 tools/extract_baseline.py   (from the repo root)
"""
import json
import os
import re

OUT = "baseline_queries.json"


def main():
    entries = {}
    if os.path.exists(OUT):
        entries = json.load(open(OUT))
    pat = re.compile(
        r"\| (q\w+) \| yes \| \w+ \| [^|]+ \| ([0-9.]+) \| ([0-9.]+)x")
    n = 0
    for line in open("VERDICT.md"):
        m = pat.match(line)
        if m:
            name, sec, ratio = m.group(1), float(m.group(2)), float(m.group(3))
            if ratio > 0:
                entries[name] = round(sec / ratio, 3)
                n += 1
    with open(OUT, "w") as f:
        json.dump(dict(sorted(entries.items())), f, indent=1)
        f.write("\n")
    print(f"{len(entries)} entries ({n} from VERDICT.md) -> {OUT}")


if __name__ == "__main__":
    main()
