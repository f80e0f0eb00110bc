#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables and hash-compare.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_bad += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" and b.dtype.kind == "f":
                # bit-level compare, like the driver's value hash: -0.0
                # vs 0.0 and sub-4dp ulp drift must FAIL here, not pass
                # a value-equality check and then flip the driver's
                # hash_match (the r9 t15/t28 incident)
                import numpy as np
                av, bv = a.to_numpy(np.float64), b.to_numpy(np.float64)
                neq = (av.view(np.int64) != bv.view(np.int64)) & ~(
                    np.isnan(av) & np.isnan(bv))
                import pandas as pd
                neq = pd.Series(neq)
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                bad_cols.append(
                    f"col={c} ({a.dtype} vs {b.dtype}) row={i} "
                    f"got={a[i]!r} want={b[i]!r}")
        if bad_cols:
            print(f"FAIL {name}: values differ ({'; '.join(bad_cols[:3])})")
            n_bad += 1
        else:
            dt = [f"{c}:{got[c].dtype}/{want[c].dtype}" for c in got.columns
                  if got[c].dtype != want[c].dtype]
            note = f" [dtype diff: {dt}]" if dt else ""
            print(f"ok   {name} ({len(got)} rows){note}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
