#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each query parquet in outDir with an entry in oracle_sql.json:
sort columns by name, sort rows, compare row count, schema-ish, and values
(exact for non-floats; tight tolerance report for floats so we can see how
close a "hash" comparison would be).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM read_parquet({files!r})").df()

def canon(df):
    df = df[sorted(df.columns)]
    # normalize for sorting: convert to string repr per row
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def compare(name, res, exp):
    if sorted(res.columns) != sorted(exp.columns):
        return f"SCHEMA mismatch: got {sorted(res.columns)} want {sorted(exp.columns)}"
    if len(res) != len(exp):
        return f"ROWS mismatch: got {len(res)} want {len(exp)}"
    r, e = canon(res), canon(exp)
    for c in r.columns:
        rv, ev = r[c].values, e[c].values
        # The driver hashes raw values, so int64 42 vs float64 42.0 FAILS
        # there even when every value is numerically equal (the r15
        # pp_pack_sft escape: DuckDB HUGEINT -> pandas float64 vs Spark
        # int64). Red-flag the dtype mix locally instead of tolerating it.
        r_float = np.issubdtype(r[c].dtype, np.floating)
        e_float = np.issubdtype(e[c].dtype, np.floating)
        r_int = np.issubdtype(r[c].dtype, np.integer)
        e_int = np.issubdtype(e[c].dtype, np.integer)
        if (r_float and e_int) or (r_int and e_float):
            return (f"DTYPE mismatch col {c}: spark={r[c].dtype} oracle={e[c].dtype}"
                    f" (driver hash would fail — cast the oracle output)")
        if np.issubdtype(r[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
            rv2 = pd.to_numeric(r[c], errors="coerce").values.astype(float)
            ev2 = pd.to_numeric(e[c], errors="coerce").values.astype(float)
            both_nan = np.isnan(rv2) & np.isnan(ev2)
            eq = np.isclose(rv2, ev2, rtol=0, atol=0) | both_nan
            close = np.isclose(rv2, ev2, rtol=1e-9, atol=1e-9) | both_nan
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                detail = [(i, rv2[i], ev2[i]) for i in idx]
                kind = "FLOAT-CLOSE (hash would fail)" if close.all() else "VALUES"
                return f"{kind} mismatch col {c}: {detail}"
        else:
            rv2, ev2 = r[c].astype(str).values, e[c].astype(str).values
            if not (rv2 == ev2).all():
                idx = np.where(rv2 != ev2)[0][:3]
                detail = [(int(i), rv2[i], ev2[i]) for i in idx]
                return f"VALUES mismatch col {c}: {detail}"
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    passed = failed = noracle = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if declared and name not in declared:
            continue
        res = load_result(outdir, name)
        if res is None:
            print(f"MISSING  {name} (no parquet output)"); failed += 1; continue
        if name not in oracle:
            status = "rows-only OK" if len(res) > 0 else "rows-only EMPTY!"
            print(f"NOORACLE {name}: {len(res)} rows ({status})"); noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"ORACLE-ERR {name}: {ex}"); failed += 1; continue
        err = compare(name, res, exp)
        if err:
            print(f"FAIL     {name}: {err}"); failed += 1
        else:
            print(f"PASS     {name} ({len(res)} rows)"); passed += 1
    print(f"\n== {passed} pass, {failed} fail, {noracle} rows-only ==")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
