#!/usr/bin/env python3
"""Layout-invariance audit: diff two graft.Verify output dirs produced
under DIFFERENT session layouts (e.g. SPARK_GRAFT_CPUS=32 vs 7 — changes
parallelism, shuffle partition count, file split assignment, and AQE
decisions). Every query's output must be identical as a SORTED ROW SET —
the same property the round driver's hash compare assumes. A query that
differs here will eventually hash-flip at the driver even if today's runs
happen to agree (this is exactly how the round-3 pp_pack failure escaped:
its nondeterminism needed a layout change, not a rerun, to surface).

Usage: python3 tools/check_determinism.py <outDirA> <outDirB> [allow,list]

Allowlist entries are for outputs that DESCRIBE the layout itself or are
approximate with order-dependent merges — they must be rows-only entries
at the driver, never hash-compared. Since r11 there are NONE: x8_describe
now emits the stable (dag, shape-boolean) fingerprint instead of raw plan
text, so it is layout-invariant and the allowlist may be empty. Everything —
including the GK quantile sketches and all LSH outputs — measured
byte-identical across layouts at sf0.001 (103/104, 2026-08-12).
"""
import sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return duckdb.connect().execute(f"SELECT * FROM read_parquet({files!r})").df()

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    a, b = sys.argv[1], sys.argv[2]
    allow = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    names = sorted(os.path.basename(d.rstrip("/")) for d in glob.glob(f"{a}/*/"))
    same = diff = skipped = 0
    for name in names:
        ra, rb = load(a, name), load(b, name)
        if ra is None or rb is None:
            print(f"MISSING  {name}"); diff += 1; continue
        if name in allow:
            print(f"ALLOWED  {name} (approximate-by-construction)"); skipped += 1; continue
        if sorted(ra.columns) != sorted(rb.columns) or len(ra) != len(rb):
            print(f"DIFF     {name}: shape {len(ra)}x{len(ra.columns)} vs {len(rb)}x{len(rb.columns)}")
            diff += 1; continue
        ca, cb = canon(ra), canon(rb)
        bad = None
        for c in ca.columns:
            va, vb = ca[c].values, cb[c].values
            if np.issubdtype(ca[c].dtype, np.floating):
                eq = (va == vb) | (pd.isna(va) & pd.isna(vb))
            else:
                eq = ca[c].astype(str).values == cb[c].astype(str).values
            if not eq.all():
                i = int(np.where(~eq)[0][0])
                bad = f"col {c} row {i}: {va[i]!r} vs {vb[i]!r}"
                break
        if bad:
            print(f"DIFF     {name}: {bad}"); diff += 1
        else:
            same += 1
    print(f"\n== {same} identical, {diff} DIFFER, {skipped} allowed ==")
    sys.exit(1 if diff else 0)

if __name__ == "__main__":
    main()
