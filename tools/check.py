#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name and rows by all columns, and compares values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(("f", repr(v)))
            else:
                canon_row.append(("o", str(v)))
        out.append(tuple(canon_row))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # coverage guard: every dumped result dir should have an oracle
    # (rows-only queries like the HLL sketch are the known exceptions);
    # an oracle without a result dir means the Spark side crashed.
    import os
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(f"{out_dir}/{d}")}
    for d in sorted(dirs - set(oracle)):
        print(f"NOTE {d}: result present but no oracle (rows-only query)")
    for d in sorted(set(oracle) - dirs):
        print(f"WARN {d}: oracle present but no Spark result dir")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = canon(got.select(
                ", ".join(f'"{c}"' for c in got_cols)).fetchall())
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = canon(exp.select(
                ", ".join(f'"{c}"' for c in exp_cols)).fetchall())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} duck={exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [
                (a, b) for a, b in zip(got_rows, exp_rows) if a != b]
            print(f"FAIL {name}: rows spark={len(got_rows)} "
                  f"duck={len(exp_rows)} first_diffs={diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
