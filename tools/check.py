#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result and
run the oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet
registered as views by name). Compare: columns sorted by name, rows sorted by
all columns, values hashed. Prints per-query PASS/FAIL with diagnostics.

This file is a dev tool only — the shipped Scala library has no Python
dependency.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to python objects via strings for floats
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = canon(con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").df())
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).split("\n")[:12]
        # Driver parity: its value hash is representation-sensitive — an
        # int64 581 vs a float64 581.0 (e.g. DuckDB HUGEINT→pandas float)
        # hash-differ even though assert_frame_equal(check_dtype=False)
        # accepts them. Enforce dtype-KIND agreement per column (i/u fold
        # together; width differences print identically).
        if ok_schema and ok_rows and ok_vals:
            kind = lambda d: 'i' if d.kind in 'iu' else d.kind
            bad_kinds = [(c, got[c].dtype, want[c].dtype)
                         for c in got.columns
                         if kind(got[c].dtype) != kind(want[c].dtype)]
            if bad_kinds:
                ok_vals = False
                err = [f"dtype-kind drift (driver hash would differ): "
                       f"{c}: spark={g} oracle={w}"
                       for c, g, w in bad_kinds]
        if ok_schema and ok_rows and ok_vals:
            print(f"{name}: PASS rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: FAIL schema_ok={ok_schema} rows={len(got)}/{len(want)}")
            if not ok_schema:
                print(f"  got : {list(got.columns)}")
                print(f"  want: {list(want.columns)}")
            elif ok_rows and not ok_vals:
                for line in err:
                    print("  " + line)
                # show first differing row
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    print("  first diff row:")
                    print("   got :", got.loc[i].to_dict())
                    print("   want:", want.loc[i].to_dict())
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
