#!/usr/bin/env python3
"""Local stand-in for the driver's correctness compare: run each
oracle_sql.json query in DuckDB over the testdata parquet and diff against
the Spark parquet dumped by graft.Verify (columns sorted by name).

Gate-fidelity rules (a broken round must not print "0 failures"):
  - EVERY query listed in _queries.json must have produced a dump dir —
    a query that crashed inside Verify (its per-query catch logs and
    moves on) is a FAILURE here, not a silent omission;
  - rows-only queries (no oracle SQL) still get a rows>0 check (the
    driver's weaker gate for non-SQL-expressible ops);
  - column DTYPES must match, not just names — the driver's compare is
    type-strict (CLAUDE.md: CAST counts AS BIGINT etc.).
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json", encoding="utf-8"))
qlist_path = f"{outdir}/_queries.json"
all_queries = (json.load(open(qlist_path, encoding="utf-8"))
               if os.path.exists(qlist_path) else sorted(oracle))
fails = []

# 1. completeness: every declared query produced output
for name in sorted(all_queries):
    if not glob.glob(f"{outdir}/{name}/*.parquet"):
        print(f"FAIL {name}: no spark output (query crashed or was skipped)")
        fails.append(name)

for name, sql in sorted(oracle.items()):
    if name in fails:
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails.append(name); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails.append(name); continue
    # dtype strictness mirrors the driver (int32 vs int64 is a FAIL there)
    dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
          if str(exp[c].dtype) != str(got[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtypes differ (oracle vs spark): {dt}")
        fails.append(name); continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails.append(name); continue
    # row-order-insensitive value compare (sort by all columns)
    cols = list(exp.columns)
    exp2 = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
    got2 = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
    same = True
    for c in cols:
        a, b = exp2[c], got2[c]
        mask = None
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af, bf = a.astype(float), b.astype(float)
                mask = ~(np.isclose(af, bf, rtol=0, atol=0) |
                         (af.isna() & bf.isna()))
                if mask.any():
                    same = False
            else:
                mask = a.astype(str) != b.astype(str)
                if mask.any():
                    same = False
        except Exception as e:
            print(f"  compare error col {c}: {e}"); same = False
        if not same:
            print(f"FAIL {name}: col {c} differs")
            if mask is not None and mask.any():
                print("  exp:", exp2[mask].head(3).to_dict('records'))
                print("  got:", got2[mask].head(3).to_dict('records'))
            break
    if same:
        print(f"OK   {name} ({len(exp)} rows)")
    else:
        fails.append(name)

# 2. rows-only queries: the driver's weaker gate is rows > 0 — enforce it
norac = sorted(n for n in all_queries if n not in oracle)
for name in norac:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if files:
        n = sum(len(pd.read_parquet(f)) for f in files)
        if n == 0:
            print(f"FAIL {name}: rows-only query produced 0 rows")
            fails.append(name)
        else:
            print(f"OK   {name} (rows-only, {n} rows)")
print("rows-only (no oracle):", norac)
print(f"\n{len(fails)} failures: {sorted(set(fails))}")
sys.exit(1 if fails else 0)
