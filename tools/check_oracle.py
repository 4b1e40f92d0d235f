#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sf tables, sorts columns by name and rows by value, and compares
exactly (the driver hashes, so any bit difference is a fail).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  fails += 1;  continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            if len(got) == 0: fails += 1
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}");  fails += 1;  continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}");  fails += 1;  continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                # The driver hashes VALUE STRINGS: an int column on one
                # side and a float on the other ("31" vs "31.0") hash-
                # mismatches even when numerically equal (bit r7 on
                # q194/q196/q197 — DuckDB window SUM over ints returns
                # HUGEINT -> pandas float64). Mirror that strictness.
                if a.dtype.kind != b.dtype.kind:
                    print(f"FAIL {name}: col {c} dtype kind skew "
                          f"{a.dtype} (spark) vs {b.dtype} (oracle) — "
                          f"driver hash would mismatch; CAST the oracle")
                    ok = False
                    continue
                same = ((a.isna() & b.isna()) |
                        (a.to_numpy() == b.to_numpy())).all()
                if not same:
                    d = np.nanmax(np.abs(a.to_numpy(float) - b.to_numpy(float)))
                    print(f"FAIL {name}: col {c} float mismatch, max abs diff {d}")
                    ok = False
            else:
                aa, bb = a.astype(str), b.astype(str)
                if not (aa == bb).all():
                    i = (aa != bb).idxmax()
                    print(f"FAIL {name}: col {c} row {i}: {a[i]!r} != {b[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            fails += 1
    print(f"\n{len(names) - fails}/{len(names)} pass")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
