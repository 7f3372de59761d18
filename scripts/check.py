#!/usr/bin/env python3
"""Local dev oracle harness (NOT shipped; mirrors the driver's t2 gate).

Usage:
  python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Expects `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` to have run:
<verifyOutDir>/<name>/ parquet dirs + <verifyOutDir>/oracle_sql.json.
Registers every testdata table as a DuckDB view, runs each oracle SQL,
and compares against the Spark result: row count, column names/types,
and exact values after sorting rows by all columns.

It ALSO emulates the driver's hash canonicalization: the driver reads
the Spark parquet via pyarrow (DECIMAL -> Python Decimal, str "-42")
but materializes the oracle via duckdb's .df() (duckdb 1.0 downcasts
every DECIMAL to float64, str "-42.0", lossy past 2^53), then hashes
sorted stringified cells — so a value-exact DECIMAL output column can
still hash-mismatch (this is exactly how q_moments went red in r11
while the exact-value compare above stayed green). The RENDERCHECK
pass below replays both read paths and str()-compares every cell, so
representation divergences are caught locally before a round ends.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(con, sfdir):
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. ScaleUp's sf1 corpus)
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

def cell_str(v):
    """Stringify one cell the way a sorted-cell hasher would, with
    nulls and containers normalized so only REAL render divergences
    (Decimal vs float64, scientific notation, lossy doubles) surface."""
    import numpy as np
    if v is None:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass  # arrays/lists: not a scalar
    if isinstance(v, np.ndarray):
        return "[" + ",".join(cell_str(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell_str(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    con = duckdb.connect()
    load(con, sfdir)
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df())
        if list(got.columns) != list(exp.columns):
            print(f"{name}: COLUMN MISMATCH spark={list(got.columns)} oracle={list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                print(f"{name}: dtype differs on {c}: spark={a.dtype} oracle={b.dtype} (continuing)")
            try:
                eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"{name}: VALUE MISMATCH col={c} row={i} spark={av!r} oracle={bv!r}")
            failures += 1
            continue
        # RENDERCHECK: replay the driver's two read paths and compare
        # the stringified cells (see module docstring).
        rbad = None
        try:
            got_pa = canon(pd.read_parquet(spark_dir))  # pyarrow path
            for c in got_pa.columns:
                a = got_pa[c].map(cell_str).values
                b = exp[c].map(cell_str).values
                ne = a != b
                if ne.any():
                    i = int(ne.argmax())
                    rbad = (c, i, a[i], b[i])
                    break
        except Exception as e:
            rbad = ("<read>", -1, repr(e), "")
        if rbad:
            c, i, av, bv = rbad
            print(f"{name}: RENDER MISMATCH (driver-hash path) col={c} row={i} "
                  f"spark_pyarrow={av!r} oracle_duckdb_df={bv!r}")
            failures += 1
        else:
            print(f"{name}: OK ({len(got)} rows)")
    print(f"\n{'FAIL' if failures else 'PASS'}: {failures} failures / {len(only) if only else len(oracle)} checked")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
