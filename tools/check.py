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
npass = 0

for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got_sql = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
    got = con.execute(got_sql).df()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
    # DTYPE-STRICT at the pandas-kind grain — the level the driver's
    # bit-hash is actually sensitive to (calibrated against driver
    # artifacts): DuckDB HUGEINT lands as float64, so an uncast
    # sum-of-sum oracle vs a Spark BIGINT output is kind f-vs-i and
    # hash-RED even when every value agrees (the r15 x_fleiss bug);
    # int32-vs-int64 and DECIMAL-vs-DOUBLE normalize in the driver's
    # hash and stay green, so only the KIND must match.
    kmis = [c for c in got.columns if c in exp.columns
            and got[c].dtype.kind != exp[c].dtype.kind
            and {got[c].dtype.kind, exp[c].dtype.kind} != {"i", "u"}]
    if kmis:
        print(f"FAIL {name}: dtype-kind mismatch " + ", ".join(
            f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}" for c in kmis))
        fail += 1; continue
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
        npass += 1
        print(f"OK   {name} ({len(g)} rows)")
    else:
        fail += 1

# rows-only queries (no oracle): check >0 rows
nrows_only = 0
for spark_dir in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(spark_dir.rstrip("/"))
    if name in oracle: continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{spark_dir}/*.parquet')").fetchone()[0]
    print(f"{'OK  ' if n > 0 else 'FAIL'} {name} rows-only ({n} rows)")
    if n == 0: fail += 1
    else: nrows_only += 1

# Canonical summary — seal-commit messages must quote THIS line verbatim
# (generated from the comparison results, never hand-tallied).
print(f"SUMMARY: {npass} of {len(oracle)} oracle queries dtype+hash-green, "
      f"{nrows_only} rows-only green, {fail} failed")
sys.exit(1 if fail else 0)
