#!/usr/bin/env python3
"""Local oracle-parity check, mimicking the driver's t2 compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
<verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s parquet tables
(registered as bare views), sorts columns by name and rows by value, and
compares cell-by-cell. Dev tool only — not part of the library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def fix(v):
        if isinstance(v, (bytearray, memoryview)):
            return bytes(v)
        return v

    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(fix)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = df.apply(lambda r: tuple(repr(x) for x in r), axis=1)
    df = df.assign(__k=key).sort_values("__k").drop(columns="__k").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_path = Path(out_dir, name)
        if not res_path.exists():
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        got = norm(pd.read_parquet(res_path))
        try:
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        diff = None
        for c in got.columns:
            a, b = got[c], exp[c]
            neq = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if repr(x) != repr(y)]
            if neq:
                diff = (c, neq[:3])
                break
        if diff:
            print(f"FAIL {name}: col {diff[0]} first diffs {diff[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
