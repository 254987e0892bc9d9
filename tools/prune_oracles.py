#!/usr/bin/env python3
"""Prune <verifyOutDir>/oracle_sql.json to the result dirs actually
present, so tools/check.py on a SUBSET Verify run (local iteration)
doesn't execute all ~500 DuckDB oracles.

Usage: python3 tools/prune_oracles.py <verifyOutDir>
"""
import json
import os
import sys

out_dir = sys.argv[1]
path = f"{out_dir}/oracle_sql.json"
oracle = json.load(open(path))
dirs = {d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")}
pruned = {k: v for k, v in oracle.items() if k in dirs}
json.dump(pruned, open(path, "w"))
print(f"kept {len(pruned)}/{len(oracle)} oracles")
