#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify output against the DuckDB oracle and compare.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
(outDir = the directory graft.Verify wrote: <name>/ parquet dirs +
oracle_sql.json). NOT part of the shipped library — dev tooling only.
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pq.ParquetDataset(f"{outdir}/{name}").read().to_pandas()

def norm(df):
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            v = pd.to_datetime(df[c])
            if getattr(v.dt, "tz", None) is not None:
                v = v.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = v.astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            failures += 1; continue
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                continue
            if a.dtype == "float64":
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    d = (a - b).abs().max()
                    bad.append(f"{c}: float maxdiff={d}")
            else:
                eq = (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = eq[~eq].index[0]
                    bad.append(f"{c}: row {i}: {a[i]!r} vs {b[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # queries without oracle → rows-only
    declared = set(json.load(open(f"{outdir}/oracle_sql.json")))
    print(f"\n{failures} failures")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
