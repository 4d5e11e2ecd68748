#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify output.

Replicates the driver's DuckDB-oracle compare: registers each testdata
parquet as a view, runs every oracle SQL, loads the corresponding
Verify parquet dump, sorts columns by name, and compares shape, dtypes
(loosely) and values. Usage: selfcheck.py <sfdir> <verify_outdir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"DUCKDB ERROR: {e}")); continue
    got = pd.concat([pd.read_parquet(p) for p in
                     sorted(glob.glob(f"{pdir}/*.parquet"))])
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True) \
        if set(got.columns) == set(exp.columns) else got.reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"COLUMNS spark={sorted(got.columns)} oracle={sorted(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"ROWS spark={len(got)} oracle={len(exp)}")); continue
    bad = None
    for c in exp.columns:
        a, b = got[c], exp[c]
        # Driver-faithful compare: the driver hashes values as-typed, so a
        # numeric *kind* mismatch (e.g. DuckDB HUGEINT->float64 vs Spark
        # LONG->int64) is a FAIL even when pandas' loose == says equal.
        # NUMERIC kinds only: a values-equal column surfaced as
        # datetime64 on one side and object on the other is a pandas
        # materialization artifact, not a type mismatch the driver sees.
        ka = 'i' if a.dtype.kind == 'u' else a.dtype.kind
        kb = 'i' if b.dtype.kind == 'u' else b.dtype.kind
        if ka != kb and ka in 'if' and kb in 'if':
            bad = f"DTYPE-KIND col={c} spark={a.dtype} oracle={b.dtype}"
            break
        try:
            if ka == 'f' and kb == 'f':
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                ok = a.astype(object).where(pd.notna(a), None) \
                    .equals(b.astype(object).where(pd.notna(b), None))
        except Exception as e:
            ok = False
        if not ok:
            neq = None
            try:
                mask = ~(((a.isna()) & (b.isna())) | (a == b))
                idx = mask[mask].index[:3].tolist()
                neq = [(i, a[i], b[i]) for i in idx]
            except Exception:
                pass
            bad = f"VALUES col={c} dtyes=({a.dtype},{b.dtype}) first_diff={neq}"
            break
    if bad: fails.append((name, bad))
    else: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"FAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why[:300]}")
sys.exit(1 if fails else 0)
