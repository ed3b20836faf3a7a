#!/usr/bin/env python3
"""Local stand-in for the driver's correctness compare: run each
oracle_sql.json query in DuckDB over the testdata parquet and diff against
the Spark parquet dumped by graft.Verify (columns sorted by name)."""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails.append(name); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
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
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                    same = False
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    same = False
        except Exception as e:
            print(f"  compare error col {c}: {e}"); same = False
        if not same:
            print(f"FAIL {name}: col {c} differs")
            mism = (exp2[c].astype(str) != got2[c].astype(str))
            print("  exp:", exp2[mism].head(3).to_dict('records'))
            print("  got:", got2[mism].head(3).to_dict('records'))
            break
    if same:
        print(f"OK   {name} ({len(exp)} rows)")
    else:
        fails.append(name)

norac = [d.split('/')[-1] for d in glob.glob(f"{outdir}/q*") if d.split('/')[-1] not in oracle]
print("rows-only (no oracle):", sorted(norac))
print(f"\n{len(fails)} failures: {fails}")
sys.exit(1 if fails else 0)
