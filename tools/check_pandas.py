#!/usr/bin/env python3
"""Driver-faithful differential compare (pandas path).

tools/check.py reads the Spark result back THROUGH DuckDB, which hides
representation differences the real driver sees: the driver loads the
Spark parquet via pandas/pyarrow (DECIMAL -> object of decimal.Decimal,
arrays -> ndarray cells) and the DuckDB oracle via .df() (DECIMAL ->
float64). Round 1 lost 5 queries to exactly that gap and one to ndarray
cells being unsortable. This checker mimics the driver: pandas on both
sides, sort columns by name, sort rows by stringified values, compare
cell reprs.

Usage: python3 tools/check_pandas.py <sfDir> <verifyOutDir>
"""
import datetime
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]


def canon(df):
    """Sort columns by name, stringify cells, sort rows."""
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        out = []
        for v in row:
            if v is None or v is pd.NaT:
                out.append(("n", "null"))
            elif isinstance(v, float):
                out.append(
                    ("n", "null") if v != v else ("f", repr(v)))
            elif isinstance(v, (datetime.date, datetime.datetime,
                                pd.Timestamp)):
                # Spark DATE -> datetime.date via pyarrow; DuckDB DATE ->
                # pandas Timestamp via .df(). The driver treats these as
                # equal (q53's four date cols passed r01) — normalize.
                out.append(("t", pd.Timestamp(v).isoformat()))
            else:
                out.append((type(v).__name__, str(v)))
        rows.append(tuple(out))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.sql(oracle[name]).df()
            got_cols, got_rows = canon(spark_df)
            exp_cols, exp_rows = canon(duck_df)
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} duck={exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b]
            print(f"FAIL {name}: rows spark={len(got_rows)} "
                  f"duck={len(exp_rows)} first_diffs={diff[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
