#!/usr/bin/env python
"""Local dev harness mirroring the driver's t2 correctness gate:
runs DuckDB oracle SQL against the testdata tables and compares with
the parquet outputs Verify.scala wrote. Dev-only (driver-side python).
"""
import json, sys, glob, os
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fail += 1; continue
    # driver-style compare: sort columns by name, compare values
    exp = exp[sorted(exp.columns)]
    got_cols = sorted(got.columns)
    if sorted(exp.columns) != got_cols:
        print(f"FAIL {name}: columns {got_cols} vs oracle {sorted(exp.columns)}"); fail += 1; continue
    got = got[sorted(got.columns)]
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fail += 1; continue
    # row-order-insensitive compare: sort by all columns
    import pandas as pd
    def norm(df):
        d = df.copy()
        for c in d.columns:
            if d[c].dtype == object:
                d[c] = d[c].astype(str)
        return d.sort_values(by=list(d.columns)).reset_index(drop=True)
    e, g = norm(exp), norm(got)
    try:
        pd.testing.assert_frame_equal(e, g, check_dtype=False, check_exact=True)
        print(f"ok   {name} ({len(exp)} rows)"); ok += 1
    except AssertionError as ex:
        print(f"FAIL {name}: value mismatch")
        diff = (e != g)
        bad_cols = [c for c in e.columns if diff[c].any()]
        for c in bad_cols[:3]:
            idx = diff[c][diff[c]].index[:3]
            for i in idx:
                print(f"   col={c} row={i}: got={g[c][i]!r} exp={e[c][i]!r}")
        fail += 1

# rows-only checks for queries without oracle
for pdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(pdir)
    if name in oracle or not os.path.isdir(pdir):
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    n = con.sql(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] if files else 0
    print(f"rows-only {name}: {n} rows")

print(f"\n{ok} ok, {fail} FAIL")
sys.exit(1 if fail else 0)
