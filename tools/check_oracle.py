#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sf parquet tables,
loads the corresponding Spark result parquet, and compares schema + values
(columns sorted by name, rows sorted by all columns). Not part of the
library — builder-side validation only.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_spark(result_dir):
    files = glob.glob(os.path.join(result_dir, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (directory of part files), e.g. the
            # DeriveSf-derived sf1 — the driver's own SFs are single files
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        rd = os.path.join(out_dir, name)
        try:
            got = load_spark(rd)
            if got is None:
                print(f"FAIL {name}: no spark result at {rd}")
                n_fail += 1
                continue
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            mismatch = None
            for c in g.columns:
                gv, wv = g[c], w[c]
                if str(gv.dtype) != str(wv.dtype):
                    mismatch = f"dtype[{c}]: {gv.dtype} vs {wv.dtype}"
                    break
                if not gv.equals(wv):
                    bad = (gv != wv) & ~(gv.isna() & wv.isna())
                    i = bad.idxmax()
                    mismatch = f"value[{c}] row {i}: {gv[i]!r} vs {wv[i]!r}"
                    break
            if mismatch:
                print(f"FAIL {name}: {mismatch}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
