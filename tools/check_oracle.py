#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Reads <outDir>/<query>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name and rows by value, and compares
cell-by-cell (exact, including floats — same as a hash compare).
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a hash-like exact compare (dates/timestamps normalize)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            col = col.astype("datetime64[us]")
        out[c] = col.map(lambda v: repr(v))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    import time
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            ref = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
        elif len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
        elif not mine.equals(ref):
            diff = (mine != ref)
            cells = int(diff.values.sum())
            print(f"FAIL {name}: {cells} differing cells of {diff.size}")
            idx = diff.any(axis=1)
            print("  mine:", mine[idx].head(3).to_dict("records"))
            print("  ref :", ref[idx].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows, "
                  f"{time.time() - t0:.1f}s)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
