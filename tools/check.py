#!/usr/bin/env python3
"""Dev-only oracle self-check (mirrors the driver's DuckDB compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Not part of the shipped library — tooling for the build loop only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if sorted(g.columns) != sorted(e.columns):
        print(f"FAIL {name}: cols {sorted(g.columns)} vs {sorted(e.columns)}"); fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    ok = True
    for c in g.columns:
        a, b = gs[c], es[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                # EXACT compare — the driver hashes values bit-for-bit, so a
                # 1-ulp libm difference is a real failure, not noise.
                aa = pd.to_numeric(a, errors="coerce"); bb = pd.to_numeric(b, errors="coerce")
                if not ((aa.isna() == bb.isna()).all() and
                        (aa.fillna(0) == bb.fillna(0)).all()):
                    near = ((aa.isna() == bb.isna()).all() and
                            (abs(aa.fillna(0) - bb.fillna(0)) <= 1e-9 + 1e-9 * abs(bb.fillna(0))).all())
                    tag = " (within 1e-9 — ulp-level; reduce round digits)" if near else ""
                    ok = False; print(f"FAIL {name}: col {c} numeric mismatch{tag}"); break
            else:
                if not a.astype(str).equals(b.astype(str)):
                    ok = False; print(f"FAIL {name}: col {c} mismatch\n{a.head()}\nvs\n{b.head()}"); break
        except Exception as ex:
            ok = False; print(f"FAIL {name}: col {c} compare error {ex}"); break
    if ok:
        print(f"OK   {name} ({len(g)} rows)")
    else:
        fail += 1

# rows-only queries (no oracle): check >0 rows
for spark_dir in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(spark_dir.rstrip("/"))
    if name in oracle: continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{spark_dir}/*.parquet')").fetchone()[0]
    print(f"{'OK  ' if n > 0 else 'FAIL'} {name} rows-only ({n} rows)")
    if n == 0: fail += 1

sys.exit(1 if fail else 0)
